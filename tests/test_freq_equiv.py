"""The exact frequency-domain reformulation (ops/freq_equiv) must equal
the time-domain family bit-comparably for EVERY algorithm — it is a
reformulation, not an approximation: same output, no T axis in the
per-frame contraction (~15x fewer MACs at the reference shape)."""

import numpy as np
import pytest

from zybo_rt_sampler_image_detection_tpu.ops import beamform, freq_equiv

from conftest import synth_frame


ALGORITHMS = ("pad", "lerp", "convolve", "hybrid", "truncated")


@pytest.mark.parametrize("algorithm", ALGORITHMS)
def test_equiv_power_matches_time_domain(tiny_cfg, rng, algorithm):
    frames = np.stack([synth_frame(tiny_cfg, rng) for _ in range(3)])
    t = beamform.make_tables(tiny_cfg, algorithm, cache=False)
    ref = np.asarray(beamform.steered_power(frames, t), np.float64)
    et = freq_equiv.make_equiv_tables(t)
    got = np.asarray(freq_equiv.equiv_steered_power(frames, et), np.float64)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=1e-14)


def test_equiv_power_single_frame_squeeze(tiny_cfg, rng):
    frame = synth_frame(tiny_cfg, rng)
    t = beamform.make_tables(tiny_cfg, "lerp", cache=False)
    et = freq_equiv.make_equiv_tables(t)
    got = np.asarray(freq_equiv.equiv_steered_power(frame, et))
    assert got.shape == (tiny_cfg.max_res_x, tiny_cfg.max_res_y)
    ref = np.asarray(beamform.steered_power(frame, t))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=1e-14)


def test_equiv_pipeline_backend(tiny_cfg):
    """Pipeline(power_backend='freq_equiv') builds the equivalent path."""
    from zybo_rt_sampler_image_detection_tpu.apps.pipeline import Pipeline

    p = Pipeline(tiny_cfg, algorithm="lerp", replay_mode=True,
                 power_backend="freq_equiv")
    frame = np.zeros((tiny_cfg.n_microphones, tiny_cfg.n_samples),
                     np.float32)
    out = np.asarray(p._power_fn(frame[None]))
    assert out.shape == (1, tiny_cfg.max_res_x, tiny_cfg.max_res_y)
    # explicit fused equiv kernel backend (interpret mode on CPU)
    pk = Pipeline(tiny_cfg, algorithm="lerp", replay_mode=True,
                  power_backend="equiv_kernel")
    outk = np.asarray(pk._power_fn(frame[None]))
    assert outk.shape == (1, tiny_cfg.max_res_x, tiny_cfg.max_res_y)
    with pytest.raises(ValueError):
        Pipeline(tiny_cfg, power_backend="nope")


def test_equiv_auto_select_decision(tiny_cfg, monkeypatch):
    """The pipeline auto-selects freq_equiv for ``high`` tables whenever
    the MAC ratio clears the (low) bar and the stacked response planes
    fit the HBM cap; bf16 ('default') and 'highest' rungs never select
    it (fused kernel / bit-level XLA path respectively)."""
    from zybo_rt_sampler_image_detection_tpu.apps import pipeline

    sentinel = object()
    monkeypatch.setattr(
        "zybo_rt_sampler_image_detection_tpu.ops.freq_equiv"
        ".make_equiv_tables", lambda t: sentinel)

    class FakeTables:
        def __init__(self, D, T, M, N, tau_min=0, precision="high"):
            import numpy as _np

            self.W = _np.zeros((D, T, M), _np.float32)
            self.n_samples = N
            self.tau_min = tau_min
            self.precision = precision

    # reference-like: T=49, N=256 -> ratio ~20x, 862 MB planes -> selected
    assert pipeline._equiv_tables_if_favored(
        FakeTables(1824, 49, 256, 256)) is sentinel
    # northstar-like short spread: ratio ~3.9x still clears the bar
    assert pipeline._equiv_tables_if_favored(
        FakeTables(4225, 8, 64, 256)) is sentinel
    # bf16 rung (precision 'default') -> fused kernel wins -> None
    assert pipeline._equiv_tables_if_favored(
        FakeTables(4225, 8, 64, 256, precision="default")) is None
    # bit-level exactness mode -> None
    assert pipeline._equiv_tables_if_favored(
        FakeTables(1824, 49, 256, 256, precision="highest")) is None
    # degenerate single-tap spread: ratio below the bar -> None
    assert pipeline._equiv_tables_if_favored(
        FakeTables(4225, 1, 64, 256)) is None
    # decisive ratio but stacked planes exceed the HBM cap -> None
    assert pipeline._equiv_tables_if_favored(
        FakeTables(40000, 49, 512, 256)) is None


def test_equiv_kernel_auto_select_decision(tiny_cfg, monkeypatch):
    """The fused equiv KERNEL serves ``high`` and ``bf16`` at any
    shape passing the MAC bar (since the HIGH-precision DFT it wins the
    ``high`` rung at the reference shape too — BENCHMARKS.md round 3);
    degenerate spreads and HBM-cap violations fall through."""
    from zybo_rt_sampler_image_detection_tpu.apps import pipeline
    from zybo_rt_sampler_image_detection_tpu.ops import equiv_kernel

    built = []

    class FakeFused:
        def __init__(self, t, *a, **kw):
            built.append(t)
            self._call = lambda f: f

    monkeypatch.setattr(equiv_kernel, "FusedEquivBeamformer", FakeFused)

    class FakeTables:
        def __init__(self, D, T, M, N, tau_min=0, precision="high"):
            import numpy as _np

            self.W = _np.zeros((D, T, M), _np.float32)
            self.n_samples = N
            self.tau_min = tau_min
            self.precision = precision

    # northstar-like high (2M=128) -> kernel
    assert pipeline._equiv_kernel_if_favored(
        FakeTables(4225, 8, 64, 256)) is not None
    # reference-like high (2M=512) -> kernel (23.5k vs XLA-equiv 22.6k
    # since the HIGH-precision DFT)
    assert pipeline._equiv_kernel_if_favored(
        FakeTables(1824, 49, 256, 256)) is not None
    # reference-like bf16 -> kernel (wins everywhere measured)
    assert pipeline._equiv_kernel_if_favored(
        FakeTables(1824, 49, 256, 256, precision="default")) is not None
    # degenerate single-tap spread -> None
    assert pipeline._equiv_kernel_if_favored(
        FakeTables(4225, 1, 64, 256, precision="default")) is None
    # HBM cap -> None
    assert pipeline._equiv_kernel_if_favored(
        FakeTables(40000, 49, 512, 256, precision="default")) is None


@pytest.mark.slow
def test_equiv_power_reference_shape():
    """Exactness holds at the true reference shape (57x32, 256 mics,
    T=49, 154 padded bins — measured 8.6e-7 max cellwise rel err)."""
    import zybo_rt_sampler_image_detection_tpu as zrt

    cfg = zrt.Config()
    t = beamform.make_tables(cfg, "lerp", cache=True)
    et = freq_equiv.make_equiv_tables(t)
    rng = np.random.default_rng(5)
    frames = (rng.standard_normal(
        (2, cfg.n_microphones, cfg.n_samples)) * 0.05).astype(np.float32)
    ref = np.asarray(beamform.steered_power(frames, t), np.float64)
    got = np.asarray(freq_equiv.equiv_steered_power(frames, et), np.float64)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=1e-16)
