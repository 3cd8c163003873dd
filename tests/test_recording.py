"""Recording (.npy capture) through the live replay loop, and metrics."""

import numpy as np

import zybo_rt_sampler_image_detection_tpu as zrt
from zybo_rt_sampler_image_detection_tpu.ingest import receiver, streamer
from zybo_rt_sampler_image_detection_tpu.utils import metrics, recording


def test_npy_recording(tmp_path):
    cfg = zrt.Config.tiny().replace(udp_port=21906)
    rng = np.random.default_rng(7)
    frames = [(rng.standard_normal((cfg.n_microphones, cfg.n_samples)) * 0.1
               ).astype(np.float32) for _ in range(12)]
    r = receiver.Receiver(cfg, replay_mode=True, backend="python",
                          exact_reference=False)
    streamer.stream_in_background(cfg, frames, n_arrays=1, delay=0.3,
                                  exact_reference=False,
                                  rate=4 * cfg.sample_rate)
    r.connect(timeout=5.0)
    seconds = 3 * cfg.n_samples / cfg.sample_rate
    path = recording.record_npy(r, seconds, str(tmp_path / "cap.npy"))
    r.disconnect()
    rec = np.load(path)
    assert rec.shape[0] == cfg.n_microphones
    assert rec.shape[1] >= 3 * cfg.n_samples
    assert rec.dtype == np.float32
    # every recorded frame equals one of the streamed frames
    for i in range(rec.shape[1] // cfg.n_samples):
        chunk = rec[:, i * cfg.n_samples:(i + 1) * cfg.n_samples]
        errs = [np.abs(chunk - f).max() for f in frames]
        assert min(errs) < 2.0 / cfg.norm_factor


def test_metrics_report():
    m = metrics.PipelineMetrics()
    st = m.stage("heatmap")
    for _ in range(10):
        with metrics.timed(st):
            pass
    rep = m.report()
    assert rep["heatmap"]["count"] == 10
    assert rep["heatmap"]["rate_hz"] > 0
