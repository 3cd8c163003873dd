"""Fused Pallas steered-power kernel vs the exact XLA path (interpret mode
on CPU; the same kernel compiles for TPU in bench.py)."""

import numpy as np
import pytest

from zybo_rt_sampler_image_detection_tpu.ops import beamform
from zybo_rt_sampler_image_detection_tpu.ops.pallas_kernels import FusedBeamformer

from conftest import synth_frame


@pytest.mark.parametrize("algorithm", ["pad", "lerp", "hybrid"])
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
