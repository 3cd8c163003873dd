"""Audio end-to-end latency contract (VERDICT r3 #2).

The reference's MISO is a PortAudio callback at ms-scale latency
(``/root/reference/PC/src/api.c:268-282,491-543``); the gapless batched
listening stage here trades latency for batch efficiency.  These tests
gate the *measurement* of that trade: per-frame ring publish stamps
(both ingest backends) -> per-batch oldest-frame age at sink write,
reported as ``audio_e2e_p50_ms``/``p95`` — and the deadline-accounting
mock playback device.
"""

import time

import numpy as np
import pytest

import zybo_rt_sampler_image_detection_tpu as zrt
from zybo_rt_sampler_image_detection_tpu.apps.pipeline import Pipeline
from zybo_rt_sampler_image_detection_tpu.ingest import streamer
from zybo_rt_sampler_image_detection_tpu.utils.audio import MockCallbackSink


def test_mock_callback_sink_accounting():
    """Writes keeping up with the wall-clock consumer -> no underflow;
    a stalled writer -> the deficit is counted as played silence."""
    sink = MockCallbackSink(sample_rate=10000.0, prefill_ms=20.0)
    sink.write(np.zeros(4000, np.float32))       # 400 ms of audio upfront
    time.sleep(0.1)
    sink.write(np.zeros(2000, np.float32))
    assert sink.underflow_samples == 0

    stall = MockCallbackSink(sample_rate=10000.0, prefill_ms=10.0)
    stall.write(np.zeros(100, np.float32))       # 10 ms of audio
    time.sleep(0.25)                             # consumer needs ~2400
    stall.write(np.zeros(100, np.float32))
    assert stall.underflow_samples > 1000
    assert stall.underflow_ms > 100.0


def _run_miso(port, batch, backend, n_frames=3000, pace_div=8):
    cfg = zrt.Config.tiny().replace(udp_port=port)
    rng = np.random.default_rng(11)
    base = (rng.standard_normal(
        (cfg.n_microphones, cfg.n_samples)) * 0.05).astype(np.float32)
    # a LONG paced stream: the stage anchors its gapless stream at the
    # newest published frame when its loop starts (stream-start anchor),
    # so frames must keep arriving through warmup/compile for the stage
    # to have anything to measure
    frames = [(base * (1.0 + 0.01 * i)).astype(np.float32)
              for i in range(n_frames)]
    p = Pipeline(cfg, algorithm="lerp", replay_mode=True, backend=backend,
                 audio_sink="null", ring_frames=max(64, 4 * batch))
    p.receiver.exact_reference = False
    # paced stream (sample_rate/pace_div pkt/s) so ring-wait dominates
    # and the K-dependence of the latency is visible
    streamer.stream_in_background(cfg, frames, n_arrays=1, delay=0.5,
                                  exact_reference=False,
                                  rate=cfg.sample_rate / pace_div)
    p.connect(timeout=5.0)
    stage = p.start_miso_batched(batch=batch)
    deadline = time.time() + 30.0
    want = 12 * batch          # a dozen post-anchor batches is plenty
    while stage.processed < want and time.time() < deadline:
        time.sleep(0.05)
    p.stop()
    rep = p.report()
    assert stage.processed >= want, \
        f"stage starved: {stage.processed}/{want}"
    return stage, rep


@pytest.mark.parametrize("backend", ["python", "native"])
def test_audio_e2e_latency_measured(backend):
    """Both ingest backends stamp ring publishes; the stage reports a
    finite packet->sink p50/p95 and the report surfaces it."""
    port = 21961 if backend == "python" else 21962
    stage, rep = _run_miso(port, batch=4, backend=backend)
    lat = stage.audio_latency()
    assert lat, "latency must be measured"
    assert 0.0 < lat["audio_e2e_p50_ms"] < 5000.0
    assert lat["audio_e2e_p95_ms"] >= lat["audio_e2e_p50_ms"]
    # the newest frame in a batch is younger than the oldest
    assert lat["audio_e2e_newest_p50_ms"] <= lat["audio_e2e_p50_ms"]
    assert rep["miso_batched"]["audio_e2e_p50_ms"] == \
        lat["audio_e2e_p50_ms"]


def test_small_batch_cuts_latency():
    """The low-latency mode contract: at a paced ingest rate the K=16
    stream lags >= the K=4 stream (frame accumulation dominates).  The
    frame period here is ~10.5 ms, so the expected gap is ~126 ms —
    far above scheduler noise."""
    s4, _ = _run_miso(21963, batch=4, backend="python")
    s16, _ = _run_miso(21964, batch=16, backend="python")
    l4 = s4.audio_latency()["audio_e2e_p50_ms"]
    l16 = s16.audio_latency()["audio_e2e_p50_ms"]
    assert l16 > l4, (l4, l16)
