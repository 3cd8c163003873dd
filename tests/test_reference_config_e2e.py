"""E2E at the real hardware shape: 3 daisy-chained 8x8 arrays, 256-mic
packets, exact-reference serpentine — emulator through receiver through
the beamformer, plus a profiling smoke test."""

import numpy as np
import pytest

import zybo_rt_sampler_image_detection_tpu as zrt
from zybo_rt_sampler_image_detection_tpu.ingest import (
    protocol, receiver, streamer,
)
from zybo_rt_sampler_image_detection_tpu.ops import beamform
from zybo_rt_sampler_image_detection_tpu.utils import profiling


def test_three_array_ingest_exact_reference():
    cfg = zrt.Config().replace(udp_port=21940, n_samples=64)
    n_arrays = cfg.active_arrays            # 3
    rng = np.random.default_rng(8)
    frame = (rng.standard_normal((cfg.n_microphones, cfg.n_samples)) * 0.1
             ).astype(np.float32)

    r = receiver.Receiver(cfg, replay_mode=True, backend="python",
                          exact_reference=True)
    streamer.stream_in_background(cfg, [frame] * 6, n_arrays=n_arrays,
                                  delay=0.3, exact_reference=True)
    na = r.connect(timeout=5.0)
    assert na == 3
    got, _ = r.read_frame(fresh=True, last_seq=0, timeout=5.0)
    r.disconnect()

    # Under the exact-reference permutation the odd-row first column is
    # aliased (receiver.c:140 off-by-one) so the round trip is NOT exact
    # for those mics; verify via the permutation itself.
    perm = protocol.serpentine_permutation(cfg, n_arrays,
                                           exact_reference=True)
    pkts = list(protocol.frame_to_packets(cfg, frame, n_arrays,
                                          exact_reference=True))
    expect = protocol.packets_to_frame(cfg, pkts, n_arrays,
                                       exact_reference=True)
    n_ch = n_arrays * cfg.rows * cfg.columns
    np.testing.assert_allclose(got[:n_ch], expect[:n_ch],
                               atol=2.0 / cfg.norm_factor)
    # channels beyond the streamed arrays stay silent
    assert np.all(got[n_ch:] == 0.0)


def test_reference_config_heatmap_shapes():
    cfg = zrt.Config()
    tables = beamform.make_tables(cfg, "lerp")
    assert tables.n_mics == 256             # all 4 board slots in geometry
    frame = np.zeros((cfg.n_microphones, cfg.n_samples), np.float32)
    img = np.asarray(beamform.steered_power(frame, tables))
    assert img.shape == (57, 32)


def test_profiler_trace_smoke(tmp_path):
    import jax.numpy as jnp

    with profiling.trace(str(tmp_path / "trace")) as logdir:
        with profiling.annotate("beam"):
            jnp.ones((64, 64)).sum().block_until_ready()
    import os
    found = []
    for root, _dirs, files in os.walk(logdir):
        found += files
    assert found, "no trace artifacts written"


def test_stopwatch():
    sw = profiling.Stopwatch()
    with sw.section("x"):
        pass
    rep = sw.report()
    assert rep["x"]["n"] == 1
