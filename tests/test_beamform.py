"""Kernel-vs-oracle gates: the jit'd delay-line matmul beamformers must
reproduce the C loop semantics (NumPy oracle) to float32 tolerance.

Mirrors the reference's only validation mechanism — the synthetic-signal
golden harness of ``PC/plot.py`` / ``PC/src/benchmark.pyx`` — upgraded to
automated allclose gates plus DOA property tests.
"""

import numpy as np
import pytest

import zybo_rt_sampler_image_detection_tpu as zrt
from zybo_rt_sampler_image_detection_tpu.ops import beamform, geometry, oracle

from conftest import synth_frame


def oracle_heatmap(cfg, frame, algorithm):
    active, n = geometry.active_microphones(cfg)
    if algorithm in ("pad", "truncated"):
        if algorithm == "pad":
            whole, _ = geometry.calculate_coefficients(cfg)
        else:
            delays = geometry.calculate_delays_angles(cfg)
            whole = delays[:, :, active].astype(int)
        return oracle.mimo_pad(frame, whole, active)
    if algorithm == "lerp":
        whole, frac = geometry.lerp_coefficients(cfg)
        return oracle.mimo_lerp(frame, whole, frac, active)
    if algorithm == "convolve":
        taps = geometry.convolve_coefficients(cfg)
        return oracle.mimo_convolve(frame, taps, active)
    if algorithm == "hybrid":
        whole, taps = geometry.hybrid_coefficients(cfg)
        return oracle.mimo_hybrid(frame, whole, taps, active)
    raise ValueError(algorithm)


ALGOS = ["pad", "lerp", "convolve", "hybrid", "truncated"]


@pytest.mark.parametrize("algorithm", ALGOS)
def test_mimo_exact_semantics(tiny_cfg, frame, algorithm):
    """float64 end-to-end: the delay-line matmul + boundary corrections must
    reproduce the C loop semantics exactly (no accumulation-order slack)."""
    cfg = tiny_cfg.replace(matmul_dtype="float64")
    ref = oracle_heatmap(cfg, frame.astype(np.float64), algorithm)
    tables = beamform.make_tables(cfg, algorithm)
    got = np.asarray(beamform.steered_power(frame.astype(np.float64), tables))
    assert got.shape == ref.shape == (cfg.max_res_x, cfg.max_res_y)
    np.testing.assert_allclose(got, ref, rtol=1e-12, atol=1e-15)


@pytest.mark.parametrize("algorithm", ALGOS)
def test_mimo_fp32_tolerance(tiny_cfg, frame, algorithm):
    """float32 device path vs float64 oracle: within fp32 accumulation
    tolerance (the BASELINE 'bit-comparable at fp32 tolerance' gate)."""
    ref = oracle_heatmap(tiny_cfg, frame.astype(np.float64), algorithm)
    tables = beamform.make_tables(tiny_cfg, algorithm)
    got = np.asarray(beamform.steered_power(frame, tables))
    # convolve realizes large delays with an 8-tap sinc => huge cancellation,
    # so fp32 accumulation noise is amplified (same in the reference AVX2).
    rtol = 2e-2 if algorithm == "convolve" else 5e-3
    np.testing.assert_allclose(got, ref, rtol=rtol, atol=1e-8)


@pytest.mark.parametrize("algorithm", ["pad", "lerp", "hybrid"])
def test_miso_matches_oracle(tiny_cfg, frame, algorithm):
    cfg = tiny_cfg
    active, n = geometry.active_microphones(cfg)
    tables = beamform.make_tables(cfg, algorithm)
    d = beamform.steer_index(cfg, 10.0, -5.0)
    x, y = d // cfg.max_res_y, d % cfg.max_res_y

    if algorithm == "pad":
        whole, _ = geometry.calculate_coefficients(cfg)
        ref = oracle.miso_pad(frame, active, whole.reshape(-1),
                              n, (x * cfg.max_res_y + y) * n)
    elif algorithm == "lerp":
        whole, frac = geometry.lerp_coefficients(cfg)
        ref = oracle.miso_lerp(frame, active, whole.reshape(-1),
                               frac.reshape(-1), n, (x * cfg.max_res_y + y) * n)
    else:
        whole, taps = geometry.hybrid_coefficients(cfg)
        ref = oracle.miso_hybrid(frame, active, whole.reshape(-1),
                                 taps.reshape(-1), n,
                                 (x * cfg.max_res_y + y) * n, cfg.n_taps)
    got = np.asarray(beamform.miso_beam(frame, tables, d))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=1e-6)


def test_batched_consistency(tiny_cfg, rng):
    """Batched invocation == per-frame invocation."""
    frames = np.stack([synth_frame(tiny_cfg, rng) for _ in range(3)])
    tables = beamform.make_lerp_tables(tiny_cfg)
    batched = np.asarray(beamform.steered_power(frames, tables))
    singles = np.stack(
        [np.asarray(beamform.steered_power(f, tables)) for f in frames]
    )
    np.testing.assert_allclose(batched, singles, rtol=1e-6, atol=1e-9)


def test_broadside_peak(tiny_cfg):
    """Reference golden property (PC/plot.py): identical signal on every mic
    => zero-delay sum is coherent and the heatmap peaks at the grid centre
    region (broadside)."""
    rng = np.random.default_rng(7)
    frame = synth_frame(tiny_cfg, rng, kind="replicated")
    tables = beamform.make_lerp_tables(tiny_cfg)
    img = np.asarray(beamform.steered_power(frame, tables))
    x, y = np.unravel_index(img.argmax(), img.shape)
    cx, cy = (tiny_cfg.max_res_x - 1) / 2, (tiny_cfg.max_res_y - 1) / 2
    assert abs(x - cx) <= 1 and abs(y - cy) <= 1


def test_point_source_doa():
    """A synthetically delayed point source is localized at the right cell."""
    cfg = zrt.Config.tiny()
    delays = geometry.calculate_delays(cfg)      # (X, Y, M)
    tx, ty = 2, 5                                 # target cell
    rng = np.random.default_rng(3)
    base = rng.standard_normal(cfg.n_samples * 2).astype(np.float32)
    active, n = geometry.active_microphones(cfg)
    frame = np.zeros((cfg.n_microphones, cfg.n_samples), np.float32)
    # Mic m hears the source delayed by (maxdelay - delay[tx,ty,m]): mics the
    # steering model delays the most hear the wavefront first.
    d = delays[tx, ty]
    lag = (d.max() - d).round().astype(int)
    for i, m in enumerate(active):
        frame[m] = base[cfg.n_samples - lag[i] : 2 * cfg.n_samples - lag[i]]
    tables = beamform.make_pad_tables(cfg)
    img = np.asarray(beamform.steered_power(frame, tables))
    x, y = np.unravel_index(img.argmax(), img.shape)
    assert abs(x - tx) <= 1 and abs(y - ty) <= 1


def test_delay_table_symmetry(tiny_cfg):
    """Property: mirroring the scan window around broadside negates the
    per-mic relative delays (planar wavefront antisymmetry,
    directions.pyx:120)."""
    d = geometry.calculate_delays(tiny_cfg)
    rel = d - d.mean(axis=2, keepdims=True)
    np.testing.assert_allclose(rel[::-1, ::-1, :], -rel, atol=1e-9)


def test_miso_convolve_matches_oracle(tiny_cfg, frame):
    """miso through convolve tables (negative delay-line shifts)."""
    cfg = tiny_cfg
    active, n = geometry.active_microphones(cfg)
    tables = beamform.make_tables(cfg, "convolve", cache=False)
    d = 3 * cfg.max_res_y + 2
    taps = geometry.convolve_coefficients(cfg)
    ref = oracle.miso_convolve(frame, active, taps.reshape(-1), n,
                               d * n * cfg.n_taps, cfg.n_taps)
    got = np.asarray(beamform.miso_beam(frame, tables, d))
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=1e-5)


def test_miso_beams_multi(tiny_cfg, frame):
    """Batched multi-direction MISO equals per-direction calls."""
    tables = beamform.make_lerp_tables(tiny_cfg)
    dirs = np.array([0, 5, 17])
    multi = np.asarray(beamform.miso_beams_multi(frame, tables, dirs))
    singles = np.stack([np.asarray(beamform.miso_beam(frame, tables, d))
                        for d in dirs])
    np.testing.assert_allclose(multi, singles, rtol=1e-6, atol=1e-8)


def test_miso_beams_multi_batched(tiny_cfg):
    """Batched signals must come back (B, K, N) as documented — the old
    moveaxis destination (-3) was a no-op on 3-D output, silently
    returning direction-major (K, B, N) data (review finding, round 3)."""
    from conftest import synth_frame

    tables = beamform.make_lerp_tables(tiny_cfg)
    dirs = np.array([0, 5, 17])
    # local generator: the session-scoped rng fixture's draw order is
    # load-bearing for downstream tolerance gates
    local = np.random.default_rng(23)
    frames = np.stack([synth_frame(tiny_cfg, local, kind="mixed")
                       for _ in range(4)])
    multi = np.asarray(beamform.miso_beams_multi(frames, tables, dirs))
    assert multi.shape == (4, len(dirs), tiny_cfg.n_samples)
    for b in range(4):
        for k, d in enumerate(dirs):
            ref = np.asarray(beamform.miso_beam(frames[b], tables, d))
            np.testing.assert_allclose(multi[b, k], ref,
                                       rtol=1e-6, atol=1e-8)
