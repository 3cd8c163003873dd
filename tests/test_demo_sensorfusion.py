"""Hermetic end-to-end fused demo: emulator -> ingest -> batched heatmaps,
synthetic camera -> batched YOLO tracker (emit_boxes), composited by the
ON-DEVICE display chain (``--composite device``) — and the round-4
default single-program mode (``--composite fused``: steered power + YOLO
+ composite in ONE device program, one packed upload and one packed
download per batch).  The full wiring of
``/root/reference/PC/main.pyx:669-736`` + ``record_sensorfusion``.
"""

import threading
import time

import numpy as np

import zybo_rt_sampler_image_detection_tpu as zrt
from zybo_rt_sampler_image_detection_tpu.apps import demo
from zybo_rt_sampler_image_detection_tpu.ingest import streamer


def _frame_gen(cfg, stop, n_max=5000):
    rng = np.random.default_rng(5)
    base = (rng.standard_normal(
        (cfg.n_microphones, cfg.n_samples)) * 0.05).astype(np.float32)
    i = 0
    while not stop.is_set() and i < n_max:
        yield (base * (1.0 + 0.01 * (i % 50))).astype(np.float32)
        i += 1


def test_fused_demo_device_composite(capsys):
    port = 21951
    cfg = zrt.Config.tiny().replace(udp_port=port)
    stop = threading.Event()
    # pace at ~48 fps so frames keep arriving for the whole drive
    streamer.stream_in_background(cfg, _frame_gen(cfg, stop),
                                  n_arrays=1, delay=0.5,
                                  rate=cfg.sample_rate / 16)
    t0 = time.time()
    try:
        demo.main(["sensorfusion", "--replay", "--preset", "tiny",
                   "--port", str(port), "--headless",
                   "--frames", "6", "--composite", "device",
                   "--composite-batch", "3", "--heatmap-batch", "4",
                   "--heatmap-rate", "0", "--tracker-batch", "2",
                   "--detector-size", "96", "--detector-width", "0.25",
                   "--camera", "-1", "--width", "160", "--height", "96",
                   "--out", ""])
    finally:
        stop.set()
    out = capsys.readouterr().out
    assert "fused rate:" in out
    assert "'frames': 6" in out, out       # DeviceViewer.report()
    assert "latency_p50_ms" in out
    assert time.time() - t0 < 120.0


def test_fused_demo_single_program(capsys):
    """--composite fused: the whole cycle in one device program, with
    the detectable scene so REAL detections flow through the in-program
    detector -> host SORT -> next batch's composite boxes."""
    port = 21952
    cfg = zrt.Config.tiny().replace(udp_port=port)
    stop = threading.Event()
    streamer.stream_in_background(cfg, _frame_gen(cfg, stop),
                                  n_arrays=1, delay=0.5,
                                  rate=cfg.sample_rate / 16)
    t0 = time.time()
    try:
        demo.main(["sensorfusion", "--replay", "--preset", "tiny",
                   "--port", str(port), "--headless",
                   "--frames", "6", "--composite", "fused",
                   "--composite-batch", "3",
                   "--camera", "-2", "--pretrain", "40",
                   "--width", "160", "--height", "96", "--out", ""])
    finally:
        stop.set()
    out = capsys.readouterr().out
    assert "fused rate:" in out
    assert "'frames':" in out              # FusedSensorStage.report()
    assert "latency_p50_ms" in out
    assert "'fused'" in out                # stage metrics present
    assert time.time() - t0 < 180.0
