"""Fused Pallas steered-power kernel vs the exact XLA path (interpret mode
on CPU; the same kernel compiles for TPU in bench.py)."""

import numpy as np
import pytest

from zybo_rt_sampler_image_detection_tpu.ops import beamform
from zybo_rt_sampler_image_detection_tpu.ops.pallas_kernels import FusedBeamformer

from conftest import synth_frame


@pytest.mark.parametrize("algorithm",
                         ["pad", "lerp", "hybrid", "convolve", "truncated"])
def test_fused_matches_xla(tiny_cfg, rng, algorithm):
    frames = np.stack([synth_frame(tiny_cfg, rng) for _ in range(2)])
    tables = beamform.make_tables(tiny_cfg, algorithm)
    ref = np.asarray(beamform.steered_power(frames, tables))
    fused = FusedBeamformer(tables, tile_d=8, chunk_b=2)
    got = np.asarray(fused(frames))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-9)


def test_fused_single_frame(tiny_cfg, rng):
    frame = synth_frame(tiny_cfg, rng)
    tables = beamform.make_lerp_tables(tiny_cfg)
    fused = FusedBeamformer(tables, tile_d=8, chunk_b=2)
    got = np.asarray(fused(frame))
    ref = np.asarray(beamform.steered_power(frame, tables))
    assert got.shape == (tiny_cfg.max_res_x, tiny_cfg.max_res_y)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-9)


def test_fused_three_pass_mode(tiny_cfg, rng):
    """precision='high' f32 tables trigger the bf16 hi/lo 3-pass emulation;
    result must be much closer to exact f32 than single-pass bf16."""
    frames = np.stack([synth_frame(tiny_cfg, rng) for _ in range(2)])
    exact = np.asarray(beamform.steered_power(
        frames, beamform.make_lerp_tables(tiny_cfg)))

    cfg_hi = tiny_cfg.replace(matmul_precision="high")
    t_hi = beamform.make_tables(cfg_hi, "lerp", cache=False)
    f_hi = FusedBeamformer(t_hi, tile_d=8, chunk_b=2)
    assert f_hi.three_pass
    got_hi = np.asarray(f_hi(frames))
    err_hi = np.abs(got_hi - exact).max() / exact.max()

    cfg_bf = tiny_cfg.replace(matmul_dtype="bfloat16",
                              matmul_precision="default")
    t_bf = beamform.make_tables(cfg_bf, "lerp", cache=False)
    f_bf = FusedBeamformer(t_bf, tile_d=8, chunk_b=2)
    got_bf = np.asarray(f_bf(frames))
    err_bf = np.abs(got_bf - exact).max() / exact.max()

    assert err_hi < 1e-4
    assert err_hi < err_bf / 5 or err_bf < 1e-6
