"""OO runner + UDP echo pair + offline video tracking parity."""

import queue

import numpy as np

from zybo_rt_sampler_image_detection_tpu.ingest import udptools
from zybo_rt_sampler_image_detection_tpu.models import runner, tracking


def test_udp_echo_pair():
    t, addr, stop = udptools.echo_server()
    try:
        assert udptools.echo_client(b"hello zybo", addr) == b"hello zybo"
        assert udptools.echo_client(b"\x00" * 1032, addr) == b"\x00" * 1032
    finally:
        stop()


class StubDetector:
    cfg = None
    variables = {}

    def get_detections(self, frame, conf_threshold=0.0):
        return [[5.0, 5.0, 20.0, 20.0, 0.8]]


def test_runner_queue_loop():
    r = runner.ObjectDetection.__new__(runner.ObjectDetection)
    r.detector = StubDetector()
    q_in, q_out = queue.Queue(), queue.Queue()
    for i in range(3):
        q_in.put((i, np.zeros((32, 32, 3), np.uint8)))
    q_in.put((3, None))
    n = r.run_conf_n_inference(q_in, q_out)
    assert n == 3
    assert q_out.qsize() == 3
    _, dets = q_out.get()
    assert dets[0][4] == 0.8


def test_process_video_track_offline(tmp_path):
    """Offline tracked-video processing over a tiny synthetic mp4."""
    import cv2

    src = str(tmp_path / "in.mp4")
    vw = cv2.VideoWriter(src, cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 64))
    rng = np.random.default_rng(0)
    for i in range(6):
        f = (rng.random((64, 64, 3)) * 40).astype(np.uint8)
        x = 5 + i * 3
        f[20:40, x:x + 20] = (0, 0, 255)
        vw.write(f)
    vw.release()

    class MovingStub:
        def get_detections(self, frame, conf_threshold=0.0):
            mask = frame[:, :, 2] > 200
            ys, xs = np.where(mask)
            if len(xs) == 0:
                return []
            return [[float(xs.min()), float(ys.min()),
                     float(xs.max()), float(ys.max()), 0.9]]

    out = str(tmp_path / "out.mp4")
    n = tracking.process_video_track(src, detector=MovingStub(),
                                     out_path=out, rec=True)
    assert n == 6
    cap = cv2.VideoCapture(out)
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 6
    cap.release()
