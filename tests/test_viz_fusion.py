"""Visualization + fusion tests: colorizer vs the reference's per-pixel
loop, power-center detector, decider gating, audio sinks."""

import numpy as np
import pytest

from zybo_rt_sampler_image_detection_tpu.fusion.decider import (
    SensorFusionDecider,
)
from zybo_rt_sampler_image_detection_tpu.utils import audio, imaging, viz


def reference_paint_loop(img01, amount=0.5, exponent=5):
    """Literal visual.py:170-184 transcription."""
    X, Y = img01.shape
    small = np.zeros((Y, X, 3), np.uint8)
    for x in range(X):
        for y in range(Y):
            p = img01[x, y]
            if p >= amount:
                p = (p - amount) / amount
                val = int(255 * p ** exponent)
                small[Y - 1 - y, X - 1 - x] = viz.COLORS[val]
    return small


def test_colorizer_matches_reference_loop():
    rng = np.random.default_rng(0)
    img = rng.random((9, 7))
    got = viz.colorize_power(img)
    ref = reference_paint_loop(img)
    np.testing.assert_array_equal(got, ref)


def test_calculate_heatmap_threshold_gate():
    img = np.full((9, 7), 1e-9)
    heat, should = viz.calculate_heatmap(img, threshold=1e-7,
                                         window=(64, 32))
    assert not should
    assert heat.shape == (32, 64, 3)
    assert heat.sum() == 0

    img[4, 3] = 1e-5
    heat, should = viz.calculate_heatmap(img, threshold=1e-7,
                                         window=(64, 32))
    assert should
    assert heat.sum() > 0


def test_find_power_center():
    img = np.zeros((20, 30))
    img[12, 18] = 1.0
    cx, cy = viz.find_power_center(img)
    assert abs(cx - 18) < 1.5 and abs(cy - 12) < 1.5


def test_heatmap_with_detection_box():
    img = np.zeros((9, 7))
    img[6, 2] = 1e-4
    box, heat, should = viz.calculate_heatmap_with_detection(
        img, window=(128, 64))
    assert should
    assert box.shape == (64, 128, 3)
    assert box.sum() > 0          # a box was drawn


def test_heatmap2_kf_circle():
    from zybo_rt_sampler_image_detection_tpu.ops.kalman import KalmanFilter3D
    kf = KalmanFilter3D()
    img = np.zeros((9, 7))
    img[4, 3] = 1.0
    heat, should = viz.calculate_heatmap2(img, kf=kf, window=(64, 48))
    assert should and heat.sum() > 0


def test_decider_light_gating():
    d = SensorFusionDecider((64, 32))
    dark = np.zeros((32, 64, 3), np.uint8)
    bright = np.full((32, 64, 3), 200, np.uint8)
    yolo = np.full((32, 64, 3), 255, np.uint8)
    power = np.zeros((32, 64, 3), np.uint8)
    heat = np.zeros((32, 64, 3), np.uint8)

    out_dark = d.create_image(dark, yolo, power, heat)
    assert d.last_light_level < 0.2
    out_bright = d.create_image(bright, yolo, power, heat)
    assert d.last_light_level > 0.2
    # in the dark the yolo overlay is dropped -> combined darker
    assert out_dark.mean() < out_bright.mean()


def test_decider_entropy_confidence():
    d = SensorFusionDecider()
    peaked = np.zeros((9, 7))
    peaked[4, 3] = 1.0
    flat = np.ones((9, 7))
    assert d.get_entropy(peaked) > d.get_entropy(flat)


def test_decider_focus_beam():
    d = SensorFusionDecider((640, 360))
    calls = []
    r = d.focus_beam(lambda h, v: calls.append((h, v)),
                     [300, 160, 340, 200, 0.9])
    assert r == 0 and len(calls) == 1
    h, v = calls[0]
    assert abs(h) < 2.0 and abs(v) < 2.0   # centered box -> near broadside
    r = d.focus_beam(lambda h, v: calls.append((h, v)),
                     [0, 0, 10, 10, 0.2])
    assert r == (-1, -1) and len(calls) == 1   # low conf ignored


def test_wav_sink(tmp_path):
    import wave
    p = str(tmp_path / "x.wav")
    sink = audio.WavFileSink(p, 48828.0)
    sink.write(np.sin(np.linspace(0, 20, 4883)).astype(np.float32))
    sink.close()
    with wave.open(p) as w:
        assert w.getframerate() == 48828
        assert w.getnframes() == 4883


def test_wav_sink_streams_to_disk(tmp_path):
    """The writer thread streams samples mid-run (an unclean exit keeps
    everything already drained — round-3 review: the buffer-at-close
    design lost the whole capture); writes after close are dropped and
    counted, never raised into the (possibly still-running) stage
    thread."""
    import os
    import time

    p = str(tmp_path / "s.wav")
    sink = audio.WavFileSink(p, 48828.0)
    for _ in range(20):
        sink.write(np.zeros(4883, np.float32))
    deadline = time.time() + 5.0
    while time.time() < deadline and os.path.getsize(p) < 20 * 4883 * 2:
        time.sleep(0.05)
    assert os.path.getsize(p) >= 20 * 4883 * 2   # data bytes on disk
    sink.close()
    sink.write(np.zeros(8, np.float32))          # late write: dropped
    assert sink._dropped == 1
    import wave
    with wave.open(p) as w:
        assert w.getnframes() == 20 * 4883


def test_miso_gain():
    beam = np.ones(8, np.float32) * 64.0
    out = audio.miso_gain(beam, n_mics=64, mic_gain=128.0)
    np.testing.assert_allclose(out, 128.0)


def test_plot_harness(tmp_path, tiny_cfg, frame):
    """Offline golden-harness module (plot.py parity) renders a panel."""
    from zybo_rt_sampler_image_detection_tpu.apps import plot

    maps = plot.compute_heatmaps(tiny_cfg, frame, ["pad", "fft"])
    assert set(maps) == {"pad", "fft"}
    assert maps["pad"].shape == (tiny_cfg.max_res_x, tiny_cfg.max_res_y)
