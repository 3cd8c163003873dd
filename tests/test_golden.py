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


ALGOS = ["pad", "lerp", "convolve", "hybrid", "truncated", "fft"]

# Gates are dtype-aware (round-2 tightening; the old flat 5e-3 would let
# drift two orders beyond the documented "high" error pass): goldens are
# recorded on CPU at HIGHEST matmul precision, where reproduction is
# limited only by f32 reduction-order noise.
RTOL = 1e-5


@pytest.mark.parametrize("algo", ALGOS)
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
    np.testing.assert_allclose(got, ref, rtol=RTOL,
                               atol=1e-9 * max(ref.max(), 1.0))


REF_GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                          "reference_heatmaps.npz")


@pytest.fixture(scope="module")
def ref_golden():
    return np.load(REF_GOLDEN)


@pytest.fixture(scope="module")
def ref_computed(ref_golden):
    """All reference-shape heatmaps computed once (table building + jit
    per algorithm is ~5 s; paying it per parametrized test is not)."""
    frame = ref_golden["frame"]
    cfg = zrt.Config()
    out = {}
    for algo in ALGOS:
        if algo == "fft":
            ft = freq.make_freq_tables(cfg, 100.0, 20000.0)
            out[algo] = np.asarray(freq.fft_steered_power(frame, ft))
        else:
            tables = beamform.make_tables(cfg, algo, cache=False)
            out[algo] = np.asarray(beamform.steered_power(frame, tables))
    fcfg = zrt.Config.fft_reference()
    ftr = freq.make_freq_tables(fcfg)
    out["fft_reference_profile"] = np.asarray(
        freq.fft_steered_power(frame, ftr))
    return out


@pytest.mark.parametrize("algo", ALGOS + ["fft_reference_profile"])
def test_golden_reference_shape(ref_golden, ref_computed, algo):
    """Round-2 gate: the FULL reference shape (57x32 grid, 256 mics) —
    catches geometry/designer drift the tiny config can't see (e.g. the
    4-slot layout, the 3-array active set, large-T delay tables); the
    ``fft_reference_profile`` row pins the shipped web backend-3 config
    (13x13, c=343, camera offset)."""
    ref = ref_golden[algo]
    np.testing.assert_allclose(ref_computed[algo], ref, rtol=RTOL,
                               atol=1e-9 * max(ref.max(), 1.0))
