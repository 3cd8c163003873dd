"""Parity gates for the on-device display compositor
(``fusion/composite.py``).

The device program must reproduce the HOST chain — the real
``Viewer.loop`` + ``SensorFusionDecider.create_image`` cv2 arithmetic
(``/root/reference/PC/src/visual.py:405-484``,
``PC/sensorfusion/decider.py:26-68``) — within uint8 rounding, so the
fused demo can switch to device compositing without changing what the
user sees.  The host frames come from the actual ``Viewer`` object fed
through real queues, not a transcription.
"""

import queue

import numpy as np
import pytest

from zybo_rt_sampler_image_detection_tpu.fusion.composite import (
    DeviceCompositor,
)
from zybo_rt_sampler_image_detection_tpu.fusion.decider import (
    SensorFusionDecider,
)
from zybo_rt_sampler_image_detection_tpu.utils import imaging, viz

WINDOW = (160, 96)      # (W, H) — small so the hermetic run stays fast
GRID = (9, 7)           # (Xg, Yg) power-map grid
CAM = (48, 64)          # (Hc, Wc) camera frames
YOLO = (48, 64)         # (Hy, Wy) tracker overlay frames

# cv2's fixed-point resize/addWeighted differ from the float chain by
# <=1 per op; three blended layers accumulate a few counts.  The
# NumPy fallback path truncates where cv2 rounds, same order.
MAX_ABS = 5
MEAN_ABS = 0.6
# fraction of pixels allowed beyond +/-2 (isolated rounding cascades)
FRAC_GT2 = 0.02
BOX_RATIO = 0.1                  # visual.py:227 box_size_ratio default


def _box_raster_mask(sx, sy, window):
    """Pixels the power box + center circle could touch at (sx, sy),
    dilated by 1.  The host ``find_power_center`` sums ``tw`` in f32 but
    the moments in f64 (``viz.py:147-150``), so when the true center
    ratio lands exactly on a pixel boundary the host and the all-f32
    device program legitimately floor to ADJACENT pixels; a one-pixel box
    shift is visually identical but flips raster pixels 0<->255, so the
    comparison masks the raster region out whenever the centers differ."""
    Ww, Hw = window
    bw, bh = int(Ww * BOX_RATIO), int(Hw * BOX_RATIO)
    x1, y1 = max(0, sx - bw // 2), max(0, sy - bh // 2)
    x2, y2 = min(Ww, sx + bw // 2), min(Hw, sy + bh // 2)
    m = np.zeros((Hw, Ww), bool)
    pad = 4                                  # thickness 3 + 1 dilation
    for (ax1, ay1, ax2, ay2) in [(x1, y1, x2, y1), (x1, y2, x2, y2),
                                 (x1, y1, x1, y2), (x2, y1, x2, y2)]:
        m[max(0, ay1 - pad):ay2 + pad + 1,
          max(0, ax1 - pad):ax2 + pad + 1] = True
    m[max(0, sy - 7):sy + 8, max(0, sx - 7):sx + 8] = True
    # the final decider flip mirrors the raster into display coords
    return m[:, ::-1]


def _powers(rng, k, scale=1e-4):
    """Smooth Gaussian-bump maps with unambiguous peaks: the power-center
    math floors to pixels, so a flat map would make sx/sy knife-edge."""
    Xg, Yg = GRID
    xs = np.arange(Xg)[:, None]
    ys = np.arange(Yg)[None, :]
    out = []
    for _ in range(k):
        cx, cy = rng.uniform(1, Xg - 2), rng.uniform(1, Yg - 2)
        amp = rng.uniform(0.5, 2.0)
        bump = amp * np.exp(-((xs - cx) ** 2 + (ys - cy) ** 2)
                            / rng.uniform(1.5, 4.0))
        out.append(bump * scale + rng.uniform(0, 1e-2, (Xg, Yg)) * scale)
    return np.asarray(out, np.float32)


def _host_frames(powers, cams, yolos, heatmap_color):
    """Run the REAL host viewer chain and capture every displayed frame."""
    q_power, q_viewer, q_inference = (queue.Queue() for _ in range(3))
    for i, (p, c, y) in enumerate(zip(powers, cams, yolos)):
        q_power.put((p, i))
        q_viewer.put((i, c))
        q_inference.put((i, y, 0.0))
    disp = viz.ArrayDisplay(keep=len(powers))
    v = viz.Viewer(window=WINDOW, display=disp,
                   heatmap_color=heatmap_color)
    dec = SensorFusionDecider(WINDOW)
    v.loop(q_power, True, q_viewer=q_viewer, q_inference=q_inference,
           decider=dec, max_frames=len(powers))
    return disp.frames, dec


def _device_frames(powers, cams, yolos, heatmap_color, **kw):
    comp = DeviceCompositor(GRID, CAM, window=WINDOW, yolo_shape=YOLO,
                            heatmap_color=heatmap_color, **kw)
    comps, prev2, meta = comp(powers, cams, yolos, comp.init_prev())
    return np.asarray(comps), np.asarray(prev2), \
        DeviceCompositor.meta_dict(meta)


def _assert_close(host, dev, tag, exclude=None):
    diff = np.abs(host.astype(np.int32) - dev.astype(np.int32))
    if exclude is not None:
        diff = diff[~exclude]
    assert diff.max() <= MAX_ABS, \
        f"{tag}: max abs diff {diff.max()} (bound {MAX_ABS})"
    assert diff.mean() <= MEAN_ABS, \
        f"{tag}: mean abs diff {diff.mean():.3f} (bound {MEAN_ABS})"
    frac = (diff > 2).mean()
    assert frac <= FRAC_GT2, \
        f"{tag}: {frac:.4f} of pixels differ by >2 (bound {FRAC_GT2})"


def _host_center(power):
    """The Viewer's sx/sy (visual.py:283-285 int truncation included)."""
    Ww, Hw = WINDOW
    Xg, Yg = GRID
    px, py = viz.find_power_center(np.clip(power, 1e-12, None))
    return (Ww - 1 - int(py / max(Xg - 1, 1) * Ww),
            Hw - 1 - int(px / max(Yg - 1, 1) * Hw))


def _compare_batch(host, dev, meta, powers, tag=""):
    for i in range(len(host)):
        hx, hy = _host_center(powers[i])
        dx, dy = int(meta["sx"][i]), int(meta["sy"][i])
        assert abs(hx - dx) <= 1 and abs(hy - dy) <= 1, \
            f"{tag}frame {i}: center ({dx},{dy}) vs host ({hx},{hy})"
        excl = None
        if (hx, hy) != (dx, dy) and meta["should"][i]:
            excl = _box_raster_mask(hx, hy, WINDOW) \
                | _box_raster_mask(dx, dy, WINDOW)
        _assert_close(host[i], dev[i], f"{tag}frame {i}",
                      None if excl is None else excl[..., None]
                      .repeat(3, -1))


@pytest.mark.parametrize("heatmap_color", [False, True])
def test_device_composite_matches_host_chain(rng, heatmap_color):
    k = 4
    powers = _powers(rng, k)
    cams = rng.integers(40, 220, (k,) + CAM + (3,)).astype(np.uint8)
    yolos = np.zeros((k,) + YOLO + (3,), np.uint8)
    # tracker-overlay-like content: a green box on a black canvas
    for i in range(k):
        yolos[i, 10 + i:30 + i, 8:40, 1] = 255

    host, dec = _host_frames(powers, cams, yolos, heatmap_color)
    dev, prev2, meta = _device_frames(powers, cams, yolos, heatmap_color)

    assert len(host) == k and dev.shape[0] == k
    _compare_batch(host, dev, meta, powers)

    # gating scalars match the decider's own measurements (final frame)
    assert abs(meta["light"][-1] - dec.last_light_level) < 0.01
    assert abs(meta["conf"][-1] - dec.last_entropy_confidence) < 1e-3
    assert meta["should"].all()          # bumps clear the 1e-7 threshold


def test_power_center_and_gates_match_host(rng):
    powers = _powers(rng, 3)
    cams = rng.integers(90, 200, (3,) + CAM + (3,)).astype(np.uint8)
    yolos = rng.integers(0, 60, (3,) + YOLO + (3,)).astype(np.uint8)
    _, _, meta = _device_frames(powers, cams, yolos, False)
    for i, p in enumerate(powers):
        sx, sy = _host_center(p)
        # +/-1: the host's mixed f32/f64 moments (see _box_raster_mask)
        assert abs(int(meta["sx"][i]) - sx) <= 1, f"frame {i} sx"
        assert abs(int(meta["sy"][i]) - sy) <= 1, f"frame {i} sy"


def test_below_threshold_draws_no_overlay(rng):
    """should_overlay=False: no heatmap paint, no power box — frames are
    the (flipped) camera alone through the decider blend chain."""
    k = 2
    powers = _powers(rng, k, scale=1e-9)        # below the 1e-7 threshold
    cams = rng.integers(90, 200, (k,) + CAM + (3,)).astype(np.uint8)
    yolos = np.zeros((k,) + YOLO + (3,), np.uint8)
    host, _ = _host_frames(powers, cams, yolos, False)
    dev, _, meta = _device_frames(powers, cams, yolos, False)
    assert not meta["should"].any()
    _compare_batch(host, dev, meta, powers)


def test_dark_camera_gates_yolo_modality(rng):
    """Light level below 0.2 drops the YOLO overlay (decider.py:53-60)
    on device exactly as on host."""
    k = 2
    powers = _powers(rng, k)
    dark = np.full((k,) + CAM + (3,), 8, np.uint8)
    yolos = np.zeros((k,) + YOLO + (3,), np.uint8)
    yolos[:, 12:30, 8:40, 1] = 255
    host, dec = _host_frames(powers, dark, yolos, False)
    dev, _, meta = _device_frames(powers, dark, yolos, False)
    assert meta["light"][-1] < 0.2 and dec.last_light_level < 0.2
    _compare_batch(host, dev, meta, powers)


def test_ema_state_carries_across_calls(rng):
    """prev' returned by call N feeds call N+1 — split batches must equal
    one batch (the scan carry is the EMA state)."""
    powers = _powers(rng, 4)
    cams = rng.integers(60, 200, (4,) + CAM + (3,)).astype(np.uint8)
    yolos = np.zeros((4,) + YOLO + (3,), np.uint8)
    comp = DeviceCompositor(GRID, CAM, window=WINDOW, yolo_shape=YOLO)
    full, _, _ = comp(powers, cams, yolos, comp.init_prev())
    a, prev, _ = comp(powers[:2], cams[:2], yolos[:2], comp.init_prev())
    b, _, _ = comp(powers[2:], cams[2:], yolos[2:], prev)
    np.testing.assert_array_equal(np.asarray(full),
                                  np.concatenate([np.asarray(a),
                                                  np.asarray(b)]))


def test_padded_batch_count_discards_repeats(rng):
    """count=n with a repeat-padded batch: same leading outputs and the
    SAME EMA carry as the unpadded call (padding must not advance the
    display state)."""
    powers = _powers(rng, 5)
    cams = rng.integers(60, 200, (5,) + CAM + (3,)).astype(np.uint8)
    yolos = np.zeros((5,) + YOLO + (3,), np.uint8)
    comp = DeviceCompositor(GRID, CAM, window=WINDOW, yolo_shape=YOLO)

    def pad(x, k):
        return np.concatenate([x, np.repeat(x[-1:], k - len(x), 0)])

    ref, prev_ref, _ = comp(powers[:3], cams[:3], yolos[:3],
                            comp.init_prev())
    got, prev_got, _ = comp(pad(powers[:3], 5), pad(cams[:3], 5),
                            pad(yolos[:3], 5), comp.init_prev(), count=3)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got)[:3])
    np.testing.assert_array_equal(np.asarray(prev_ref),
                                  np.asarray(prev_got))


def test_device_viewer_loop_matches_host_viewer(rng):
    """DeviceViewer.loop (queues -> batched device composite -> display)
    displays the same frames, in order, as the host Viewer.loop."""
    import queue as _q

    from zybo_rt_sampler_image_detection_tpu.fusion.composite import (
        DeviceViewer,
    )
    k = 7                                    # forces a partial last batch
    powers = _powers(rng, k)
    cams = rng.integers(40, 220, (k,) + CAM + (3,)).astype(np.uint8)
    yolos = np.zeros((k,) + YOLO + (3,), np.uint8)
    yolos[:, 12:30, 8:40, 1] = 255

    host, _ = _host_frames(powers, cams, yolos, False)

    comp = DeviceCompositor(GRID, CAM, window=WINDOW, yolo_shape=YOLO)
    disp = viz.ArrayDisplay(keep=k)
    dv = DeviceViewer(comp, disp, batch=4)
    q_power, q_viewer, q_inference = (_q.Queue() for _ in range(3))
    for i in range(k):
        q_power.put((powers[i], i))
        q_viewer.put((i, cams[i]))
        q_inference.put((i, yolos[i], 0.0))
    dv.loop(q_power, True, q_viewer=q_viewer, q_inference=q_inference,
            max_frames=k)
    assert dv.frames == k and len(disp.frames) == k
    _, _, meta = _device_frames(powers, cams, yolos, False)
    _compare_batch(host, np.asarray(disp.frames), meta, powers)
    rep = dv.report()
    assert rep["latency_p50_ms"] is not None and rep["frames"] == k
    assert 0.0 <= rep["light"] <= 1.0 and 0.0 < rep["conf"] <= 1.0


def test_box_raster_matches_host_drawn_overlay(rng):
    """max_tracks mode: track boxes rasterized on device == the host
    tracker's drawn canvas (pipeline._draw_tracks -> cv2 thickness-2
    rectangles), through the full composite chain.  This path drops the
    per-frame canvas upload to 20 floats."""
    from zybo_rt_sampler_image_detection_tpu.apps.pipeline import (
        _draw_tracks,
    )
    k = 3
    powers = _powers(rng, k)
    cams = rng.integers(60, 200, (k,) + CAM + (3,)).astype(np.uint8)
    yolos = np.zeros((k,) + YOLO + (3,), np.uint8)
    per_frame = [
        np.array([[5, 8, 30, 30, 1], [20, 15, 55, 40, 2]], float),
        np.array([[10, 12, 40, 35, 1]], float),
        np.array([[50, 30, 62, 45, 3], [2, 2, 20, 20, 4]], float),
    ]
    for i, t in enumerate(per_frame):
        _draw_tracks(imaging, yolos[i], t, [], [[0, 0], [0, 0], 0])
    host, _ = _host_frames(powers, cams, yolos, False)

    comp = DeviceCompositor(GRID, CAM, window=WINDOW, yolo_shape=YOLO,
                            max_tracks=4)
    boxes = np.full((k, 4, 5), -100.0, np.float32)
    for i, t in enumerate(per_frame):
        boxes[i, :len(t)] = t
    comps, _, meta = comp(powers, cams, boxes, comp.init_prev())
    _compare_batch(host, np.asarray(comps),
                   DeviceCompositor.meta_dict(meta), powers)


def test_gauss5_matches_imaging_blur(rng):
    """The in-program 5x5 reflect-101 Gaussian == imaging.gaussian_blur
    (cv2 or fallback)."""
    import jax.numpy as jnp

    from zybo_rt_sampler_image_detection_tpu.fusion import composite
    x = rng.standard_normal(GRID).astype(np.float32) ** 2
    got = np.asarray(DeviceCompositor._gauss5(
        jnp.asarray(x), jnp.asarray(composite._gauss_kernel5())))
    want = imaging.gaussian_blur(x, 5, 1.0)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)
