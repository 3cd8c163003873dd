"""The fused Pallas equiv kernel (ops/equiv_kernel) must reproduce the
XLA exact frequency-domain path — and therefore the time-domain family —
at its accuracy rung, for every algorithm.  CPU runs use interpret mode
(same numerics, no Mosaic)."""

import numpy as np
import pytest

from zybo_rt_sampler_image_detection_tpu.ops import (
    beamform, equiv_kernel, freq_equiv)

from conftest import synth_frame


ALGORITHMS = ("pad", "lerp", "convolve", "hybrid", "truncated")


@pytest.mark.parametrize("algorithm", ALGORITHMS)
def test_kernel_matches_time_domain_high(tiny_cfg, rng, algorithm):
    """3-pass 'high' mode: ~1e-5 class vs the bit-comparable f32 paths."""
    frames = np.stack([synth_frame(tiny_cfg, rng) for _ in range(3)])
    t = beamform.make_tables(tiny_cfg, algorithm, cache=False)
    ref = np.asarray(beamform.steered_power(frames, t), np.float64)
    fused = equiv_kernel.FusedEquivBeamformer(t, mode="high")
    got = np.asarray(fused(frames), np.float64)
    np.testing.assert_allclose(got, ref, rtol=5e-5, atol=1e-12)


@pytest.mark.parametrize("algorithm", ("lerp", "hybrid"))
def test_kernel_chunked_frequency_accumulation(tiny_cfg, rng, algorithm):
    """Frequency chunking (n_fc > 1) folds the Parseval AND the tail/head
    inverse-DFT contractions in per chunk — the reference-shape plans run
    chunked, but the tiny shape auto-plans to n_fc=1, so force a chunked
    plan here to gate the accumulation path's parity."""
    frames = np.stack([synth_frame(tiny_cfg, rng) for _ in range(3)])
    t = beamform.make_tables(tiny_cfg, algorithm, cache=False)
    ref = np.asarray(beamform.steered_power(frames, t), np.float64)
    fused = equiv_kernel.FusedEquivBeamformer(t, mode="high",
                                              plan_override=(8, 3))
    assert fused.n_fc == 3
    got = np.asarray(fused(frames), np.float64)
    np.testing.assert_allclose(got, ref, rtol=5e-5, atol=1e-12)


def test_kernel_rejects_unknown_mode(tiny_cfg):
    """'highest' belongs to the SteeringTables vocabulary, not the kernel
    (which would silently fall through to single-pass bf16)."""
    t = beamform.make_tables(tiny_cfg, "lerp", cache=False)
    with pytest.raises(ValueError, match="mode"):
        equiv_kernel.FusedEquivBeamformer(t, mode="highest")


def test_kernel_f32_mode_most_accurate(tiny_cfg, rng):
    """'f32' mode (HIGHEST planes) lands within f32-reassociation
    distance of the exact XLA equiv path."""
    frames = np.stack([synth_frame(tiny_cfg, rng) for _ in range(3)])
    t = beamform.make_tables(tiny_cfg, "lerp", cache=False)
    et = freq_equiv.make_equiv_tables(t)
    ref = np.asarray(freq_equiv.equiv_steered_power(frames, et), np.float64)
    fused = equiv_kernel.FusedEquivBeamformer(t, mode="f32")
    got = np.asarray(fused(frames), np.float64)
    np.testing.assert_allclose(got, ref, rtol=2e-6, atol=1e-14)


def test_kernel_bf16_mode_display_grade(tiny_cfg, rng):
    frames = np.stack([synth_frame(tiny_cfg, rng) for _ in range(3)])
    t = beamform.make_tables(tiny_cfg, "lerp", cache=False)
    ref = np.asarray(beamform.steered_power(frames, t), np.float64)
    fused = equiv_kernel.FusedEquivBeamformer(t, mode="bf16")
    got = np.asarray(fused(frames), np.float64)
    np.testing.assert_allclose(got, ref, rtol=3e-2, atol=1e-10)
    # and the peak pixel must agree (display contract)
    for b in range(len(frames)):
        assert np.unravel_index(got[b].argmax(), got[b].shape) \
            == np.unravel_index(ref[b].argmax(), ref[b].shape)


def test_kernel_batch_padding_and_squeeze(tiny_cfg, rng):
    """Batch sizes that don't divide the chunk pad with zero frames and
    slice back; 2-D input squeezes."""
    t = beamform.make_tables(tiny_cfg, "lerp", cache=False)
    fused = equiv_kernel.FusedEquivBeamformer(t, mode="high")
    frames = np.stack([synth_frame(tiny_cfg, rng) for _ in range(5)])
    got = np.asarray(fused(frames))
    assert got.shape == (5, tiny_cfg.max_res_x, tiny_cfg.max_res_y)
    one = np.asarray(fused(frames[0]))
    assert one.shape == (tiny_cfg.max_res_x, tiny_cfg.max_res_y)
    np.testing.assert_allclose(one, got[0], rtol=1e-6, atol=1e-12)


def test_kernel_default_mode_follows_tables(tiny_cfg):
    t_hi = beamform.make_tables(
        tiny_cfg.replace(matmul_precision="high"), "lerp", cache=False)
    assert equiv_kernel.FusedEquivBeamformer(t_hi).mode == "high"
    t_ho = beamform.make_tables(
        tiny_cfg.replace(matmul_precision="highest"), "lerp", cache=False)
    assert equiv_kernel.FusedEquivBeamformer(t_ho).mode == "f32"
    t_bf = beamform.make_tables(
        tiny_cfg.replace(matmul_precision="default",
                         matmul_dtype="bfloat16"), "lerp", cache=False)
    assert equiv_kernel.FusedEquivBeamformer(t_bf).mode == "bf16"


def test_kernel_disabled_mics_gather(tiny_cfg, rng):
    """Non-identity active-mic sets (dead-mic list) exercise the
    adaptive gather path of the kernel forward."""
    cfg = tiny_cfg.replace(matmul_precision="high", unused_mics=(1, 5))
    frames = np.stack([synth_frame(cfg, rng) for _ in range(3)])
    t = beamform.make_tables(cfg, "lerp", cache=False)
    assert not np.array_equal(np.asarray(t.adaptive),
                              np.arange(len(np.asarray(t.adaptive))))
    ref = np.asarray(beamform.steered_power(frames, t), np.float64)
    fused = equiv_kernel.FusedEquivBeamformer(t, mode="high")
    assert fused.kt.adaptive is not None
    got = np.asarray(fused(frames), np.float64)
    np.testing.assert_allclose(got, ref, rtol=5e-5, atol=1e-12)


def test_kernel_vmem_plan_chunks_frequencies():
    """The auto-planner must fall back to frequency chunking (and
    smaller frame chunks) for reference-scale shapes instead of blowing
    VMEM."""
    import zybo_rt_sampler_image_detection_tpu as zrt

    cfg = zrt.Config().replace(matmul_precision="high")
    t = beamform.make_tables(cfg, "lerp", cache=True)
    fused = equiv_kernel.FusedEquivBeamformer(t, mode="high")
    # the tuned reference-shape plan (Bc=128, n_fc=3) was measured to
    # compile; its estimate sits just above the search budget but under
    # the Mosaic ceiling
    assert fused.vmem_bytes < 120 * 1024 * 1024
    assert fused.n_fc > 1                     # F chunked at this shape
    assert fused.FP % fused.fc_len == 0
    assert fused.FP >= fused.F


@pytest.mark.parametrize("algorithm", ["lerp", "pad"])
def test_kernel_fd_sweep_matches_df(tiny_cfg, rng, algorithm):
    """The direction-innermost sweep (round 5's recorded S-prefetch
    experiment — S streams once per (frame, f)-chunk) must be
    bit-identical to the default sweep; exercises the multi-f-chunk
    aliased-accumulator path."""
    from zybo_rt_sampler_image_detection_tpu.ops.equiv_kernel import (
        FusedEquivBeamformer,
    )
    frames = np.stack([synth_frame(tiny_cfg, rng) for _ in range(3)])
    t = beamform.make_tables(tiny_cfg, algorithm, cache=False)
    df = FusedEquivBeamformer(t, plan_override=(8, 3))
    fd = FusedEquivBeamformer(t, plan_override=(8, 3), sweep="fd")
    np.testing.assert_array_equal(np.asarray(df(frames)),
                                  np.asarray(fd(frames)))
    with pytest.raises(ValueError):
        FusedEquivBeamformer(t, sweep="xy")
