"""Golden regression gate: fixed-seed heatmaps must stay stable across
refactors and rounds (catches silent semantic drift the oracle tests
wouldn't, e.g. table-builder changes that shift both implementation and
oracle together is impossible — but geometry/designer drift is not)."""

import os

import numpy as np
import pytest

import zybo_rt_sampler_image_detection_tpu as zrt
from zybo_rt_sampler_image_detection_tpu.ops import beamform, freq

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "tiny_heatmaps.npz")


@pytest.fixture(scope="module")
def golden():
    return np.load(GOLDEN)


@pytest.mark.parametrize(
    "algo", ["pad", "lerp", "convolve", "hybrid", "truncated", "fft"])
def test_golden_heatmaps(golden, algo):
    cfg = zrt.Config.tiny()
    frame = golden["frame"]
    if algo == "fft":
        ft = freq.make_freq_tables(cfg, 100.0, 20000.0)
        got = np.asarray(freq.fft_steered_power(frame, ft))
    else:
        tables = beamform.make_tables(cfg, algo, cache=False)
        got = np.asarray(beamform.steered_power(frame, tables))
    ref = golden[algo]
    np.testing.assert_allclose(got, ref, rtol=5e-3,
                               atol=1e-8 * max(ref.max(), 1.0))
