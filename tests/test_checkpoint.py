"""Training checkpoint/resume: restored trainer continues bit-identically."""

import numpy as np

from zybo_rt_sampler_image_detection_tpu.models import train, yolo


def test_checkpoint_resume(tmp_path):
    cfg = yolo.YoloConfig(input_size=64, width_mult=0.25)
    tr = train.Trainer(cfg)
    rng = np.random.default_rng(0)
    imgs = rng.random((2, 64, 64, 3)).astype(np.float32)
    boxes = [np.array([[8.0, 8.0, 40.0, 40.0, 0.0]])] * 2
    tr.train_step(imgs, boxes)

    p = str(tmp_path / "ckpt")
    train.save_checkpoint(p, tr)
    tr2 = train.Trainer(cfg)
    train.restore_checkpoint(p, tr2)
    assert tr2.state.step == 1
    la = tr.train_step(imgs, boxes)
    lb = tr2.train_step(imgs, boxes)
    assert abs(la - lb) < 1e-5
