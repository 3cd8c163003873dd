"""Ingest tests: protocol round trips, serpentine parity with the C loops,
live loopback receive (Python + native C++ backends), gap detection,
pcap round trip."""

import threading
import time

import numpy as np
import pytest

import zybo_rt_sampler_image_detection_tpu as zrt
from zybo_rt_sampler_image_detection_tpu.ingest import (
    protocol, receiver, streamer,
)


def c_reference_reorder(cfg, stream, n_arrays):
    """Literal transcription of receiver.c:122-145 for one packet."""
    out = np.zeros(n_arrays * cfg.rows * cfg.columns, dtype=np.float64)
    s = 0
    for n in range(n_arrays):
        for y in range(cfg.rows):
            row = n * cfg.rows * cfg.columns + y * cfg.columns
            for x in range(cfg.columns):
                if y % 2 == 0:
                    idx = row + x
                else:
                    idx = row + cfg.columns - x
                idx = min(idx, cfg.n_microphones - 1)
                out[s] = stream[idx] / cfg.norm_factor
                s += 1
    return out.astype(np.float32)


def test_serpentine_matches_c_loops():
    cfg = zrt.Config()
    rng = np.random.default_rng(0)
    stream = rng.integers(-2**30, 2**30, cfg.n_microphones).astype(np.int64)
    for n_arrays in (1, 2, 3):
        perm = protocol.serpentine_permutation(cfg, n_arrays,
                                               exact_reference=True)
        got = (stream[perm] / cfg.norm_factor).astype(np.float32)
        ref = c_reference_reorder(cfg, stream, n_arrays)
        np.testing.assert_array_equal(got, ref)


def test_packet_frame_roundtrip():
    cfg = zrt.Config.tiny()
    rng = np.random.default_rng(1)
    frame = (rng.standard_normal((cfg.n_microphones, cfg.n_samples)) * 0.1
             ).astype(np.float32)
    pkts = list(protocol.frame_to_packets(cfg, frame, n_arrays=1,
                                          exact_reference=False))
    assert len(pkts) == cfg.n_samples
    back = protocol.packets_to_frame(cfg, pkts, n_arrays=1,
                                     exact_reference=False)
    # int32 quantization at 2^-24 resolution
    np.testing.assert_allclose(back, frame, atol=2.0 / cfg.norm_factor)


def test_header_fields():
    cfg = zrt.Config.tiny()
    pkt = protocol.pack_packet(cfg, np.zeros(4, "<i4"), counter=77,
                               n_arrays=2, frequency=48828 % 65536)
    freq, n_arrays, ver, counter = protocol.unpack_header(pkt)
    assert (n_arrays, ver, counter) == (2, cfg.fpga_protocol_version, 77)
    assert len(pkt) == protocol.packet_size(cfg)


def _loopback_cfg(port):
    return zrt.Config.tiny().replace(udp_port=port)


@pytest.mark.parametrize("backend", ["python", "native"])
def test_live_loopback_receive(backend):
    cfg = _loopback_cfg(21900 if backend == "python" else 21901)
    rng = np.random.default_rng(2)
    frames = [(rng.standard_normal((cfg.n_microphones, cfg.n_samples)) * 0.1
               ).astype(np.float32) for _ in range(4)]

    r = receiver.Receiver(cfg, replay_mode=True, backend=backend,
                          exact_reference=False)
    streamer.stream_in_background(cfg, frames, n_arrays=1, delay=0.2,
                                  exact_reference=False)
    n_arrays = r.connect(timeout=5.0)
    assert n_arrays == 1
    got, seq = r.read_frame(fresh=True, last_seq=0, timeout=5.0)
    r.disconnect()
    # the received frame must be one of the streamed ones (bit-close)
    errs = [np.abs(got - f).max() for f in frames]
    assert min(errs) < 2.0 / cfg.norm_factor


@pytest.mark.parametrize("backend", ["python", "native"])
def test_garbage_datagram_fuzz(backend):
    """Malformed datagrams (random bytes, random lengths, wrong protocol
    version) interleaved with a valid stream must not crash either ingest
    engine or corrupt subsequent frame assembly."""
    import socket

    cfg = _loopback_cfg(21935 if backend == "python" else 21936)
    rng = np.random.default_rng(5)
    frames = [(rng.standard_normal((cfg.n_microphones, cfg.n_samples)) * 0.1
               ).astype(np.float32) for _ in range(4)]
    psize = protocol.packet_size(cfg)

    r = receiver.Receiver(cfg, replay_mode=True, backend=backend,
                          exact_reference=False)

    def fuzz():
        s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        deadline = time.time() + 3.0
        while time.time() < deadline:
            size = int(rng.integers(1, psize * 2))
            pkt = bytearray(rng.integers(0, 256, size, dtype=np.uint8)
                            .tobytes())
            if size > 3:
                # force a version mismatch so the engine must DROP it (a
                # random ver byte could legitimately alias a real packet)
                pkt[3] = (cfg.fpga_protocol_version + 1) & 0xFF
            s.sendto(bytes(pkt), ("127.0.0.1", cfg.udp_port))
            time.sleep(0.002)
        s.close()

    # valid header must arrive first so connect() handshakes cleanly;
    # cycle the 4 patterns for long enough that the latest-frame reader
    # can observe >=3 of them while the fuzz runs
    streamer.stream_in_background(cfg, frames * 20, n_arrays=1, delay=0.2,
                                  exact_reference=False,
                                  rate=2 * cfg.sample_rate)
    n_arrays = r.connect(timeout=5.0)
    assert n_arrays == 1
    t = threading.Thread(target=fuzz, daemon=True)
    t.start()
    seq, ok = 0, 0
    deadline = time.time() + 5.0
    while time.time() < deadline and ok < 3:
        try:
            got, seq = r.read_frame(fresh=True, last_seq=seq, timeout=2.0)
        except TimeoutError:
            continue
        errs = [np.abs(got - f).max() for f in frames]
        if min(errs) < 2.0 / cfg.norm_factor:
            ok += 1
    # the valid stream can outrun the fuzz thread; stay connected until
    # at least one malformed packet has been observed and rejected
    deadline = time.time() + 6.0
    while time.time() < deadline and r.native_stats.bad_protocol == 0:
        time.sleep(0.05)
    stats = r.native_stats
    r.disconnect()
    t.join(timeout=5.0)
    assert ok >= 3, f"valid frames stopped arriving under fuzz ({ok})"
    assert stats.bad_protocol > 0, "fuzz packets were not rejected"


def test_protocol_mismatch_rejected():
    cfg = _loopback_cfg(21902)
    bad = cfg.replace(fpga_protocol_version=1)

    def send_bad():
        time.sleep(0.2)
        s = streamer.Streamer(bad)
        s.send_frame(np.zeros((cfg.n_microphones, cfg.n_samples), np.float32))
        s.close()

    threading.Thread(target=send_bad, daemon=True).start()
    r = receiver.Receiver(cfg, replay_mode=True, backend="python")
    with pytest.raises(ConnectionError):
        r.connect(timeout=5.0)


def test_reordered_packets_assemble_correctly():
    """UDP reordering within a frame window must not corrupt assembly:
    the counter-driven slot write (receiver.h:56 counter, unused by the
    reference) places each packet by ``counter % n_samples`` regardless of
    arrival order."""
    cfg = _loopback_cfg(21938)
    rng = np.random.default_rng(9)
    frame = (rng.standard_normal((cfg.n_microphones, cfg.n_samples)) * 0.1
             ).astype(np.float32)
    pkts = list(protocol.frame_to_packets(cfg, frame, n_arrays=1,
                                          exact_reference=False))
    # shuffle within the frame, then send a second, in-order copy of the
    # frame (counters continue) so the ring publishes both
    order = rng.permutation(len(pkts))
    seq = [pkts[i] for i in order]
    seq += [protocol.pack_packet(
        cfg, protocol.unpack_stream(cfg, p), c + cfg.n_samples, 1)
        for c, p in enumerate(pkts)]

    r = receiver.Receiver(cfg, replay_mode=True, backend="python",
                          exact_reference=False)

    def send():
        time.sleep(0.2)
        s = streamer.Streamer(cfg, n_arrays=1)
        s.send_header()
        for p in seq:
            s._sock.sendto(p, (s.ip, s.port))
            time.sleep(0.0005)
        s.close()

    threading.Thread(target=send, daemon=True).start()
    r.connect(timeout=5.0)
    deadline = time.time() + 5.0
    while r.stats.frames < 2 and time.time() < deadline:
        time.sleep(0.05)
    got, _ = r.read_frame(fresh=False, timeout=2.0)
    r.disconnect()
    assert r.stats.frames >= 2
    np.testing.assert_allclose(got, frame, atol=2.0 / cfg.norm_factor)


def test_gap_detection():
    cfg = _loopback_cfg(21903)
    rng = np.random.default_rng(3)
    frame = (rng.standard_normal((cfg.n_microphones, cfg.n_samples)) * 0.1
             ).astype(np.float32)
    pkts = list(protocol.frame_to_packets(cfg, frame, n_arrays=1))
    # drop 3 packets in the middle of the second frame
    seq = (pkts
           + [protocol.pack_packet(cfg, protocol.unpack_stream(cfg, p),
                                   c + cfg.n_samples, 1)
              for c, p in enumerate(pkts) if c not in (5, 6, 7)])

    r = receiver.Receiver(cfg, replay_mode=True, backend="python")

    def send():
        time.sleep(0.2)
        s = streamer.Streamer(cfg, n_arrays=1)
        s.send_header()
        for p in seq:
            s._sock.sendto(p, (s.ip, s.port))
            time.sleep(0.0005)
        s.close()

    threading.Thread(target=send, daemon=True).start()
    r.connect(timeout=5.0)
    deadline = time.time() + 5.0
    while r.stats.packets < len(seq) - 1 and time.time() < deadline:
        time.sleep(0.05)
    r.disconnect()
    assert r.stats.gaps == 3


def test_pcap_roundtrip(tmp_path):
    cfg = zrt.Config.tiny()
    rng = np.random.default_rng(4)
    frame = (rng.standard_normal((cfg.n_microphones, cfg.n_samples)) * 0.1
             ).astype(np.float32)
    pkts = list(protocol.frame_to_packets(cfg, frame, n_arrays=1,
                                          exact_reference=False))
    path = str(tmp_path / "cap.pcap")
    protocol.write_pcap(path, pkts)
    back = [p for _, p in protocol.read_pcap(path)]
    assert back == pkts


def test_pcap_replay_through_receiver(tmp_path):
    cfg = _loopback_cfg(21904)
    rng = np.random.default_rng(5)
    frame = (rng.standard_normal((cfg.n_microphones, cfg.n_samples)) * 0.1
             ).astype(np.float32)
    pkts = list(protocol.frame_to_packets(cfg, frame, n_arrays=1,
                                          exact_reference=False))
    path = str(tmp_path / "cap.pcap")
    protocol.write_pcap(path, [protocol.header_packet(cfg, 1)] + pkts * 3)

    r = receiver.Receiver(cfg, replay_mode=True, backend="python",
                          exact_reference=False)

    def replay():
        time.sleep(0.2)
        s = streamer.Streamer(cfg)
        s.send_pcap(path)
        s.close()

    threading.Thread(target=replay, daemon=True).start()
    r.connect(timeout=5.0)
    got, _ = r.read_frame(fresh=True, last_seq=0, timeout=5.0)
    r.disconnect()
    np.testing.assert_allclose(got, frame, atol=2.0 / cfg.norm_factor)


def test_dead_mic_masking():
    cfg = zrt.Config.tiny().replace(disabled_mics=(0, 3), udp_port=21905)
    rng = np.random.default_rng(6)
    frames = [np.abs(rng.standard_normal(
        (cfg.n_microphones, cfg.n_samples))).astype(np.float32) * 0.1 + 0.01
        for _ in range(3)]
    r = receiver.Receiver(cfg, replay_mode=True, backend="python",
                          exact_reference=False)
    streamer.stream_in_background(cfg, frames, n_arrays=1, delay=0.2,
                                  exact_reference=False)
    r.connect(timeout=5.0)
    got, _ = r.read_frame(fresh=True, last_seq=0, timeout=5.0)
    r.disconnect()
    assert np.all(got[0] == 0.0) and np.all(got[3] == 0.0)
    assert np.any(got[1] != 0.0)


@pytest.mark.parametrize("backend", ["python", "native"])
def test_reconnect_cycle(backend):
    """connect/disconnect/connect in one process (the native engine is a
    process singleton — reconnection must fully reset it)."""
    port = 21907 if backend == "python" else 21908
    cfg = zrt.Config.tiny().replace(udp_port=port)
    rng = np.random.default_rng(9)
    frames = [(rng.standard_normal((cfg.n_microphones, cfg.n_samples)) * 0.1
               ).astype(np.float32) for _ in range(6)]

    for cycle in range(2):
        r = receiver.Receiver(cfg, replay_mode=True, backend=backend,
                              exact_reference=False)
        th = streamer.stream_in_background(cfg, frames, n_arrays=1,
                                           delay=0.2, exact_reference=False)
        assert r.connect(timeout=5.0) == 1
        # skip the first frame: when the bind lands mid-burst the counter
        # alignment zero-fills its missed head (by design)
        got, seq = r.read_frame(fresh=True, last_seq=1, timeout=5.0)
        r.disconnect()
        th.join(timeout=5.0)   # don't let this cycle's stream bleed into
        errs = [np.abs(got - f).max() for f in frames]
        assert min(errs) < 2.0 / cfg.norm_factor, f"cycle {cycle}"


def test_packet_loss_zero_fills_aligned():
    """With counter-aligned assembly, dropped packets leave zeroed sample
    columns instead of shifting the rest of the frame."""
    cfg = zrt.Config.tiny().replace(udp_port=21909)
    rng = np.random.default_rng(11)
    frame = np.abs(rng.standard_normal(
        (cfg.n_microphones, cfg.n_samples))).astype(np.float32) * 0.1 + 0.01
    pkts = list(protocol.frame_to_packets(cfg, frame, n_arrays=1,
                                          exact_reference=False))
    drop = {10, 11}
    r = receiver.Receiver(cfg, replay_mode=True, backend="python",
                          exact_reference=False)

    def send():
        time.sleep(0.2)
        s = streamer.Streamer(cfg, n_arrays=1, exact_reference=False)
        s.send_header()
        for c, p in enumerate(pkts):
            if c in drop:
                continue
            s._sock.sendto(p, (s.ip, s.port))
            time.sleep(0.0005)
        s.close()

    threading.Thread(target=send, daemon=True).start()
    r.connect(timeout=5.0)
    got, _ = r.read_frame(fresh=True, last_seq=0, timeout=5.0)
    r.disconnect()
    n_ch = cfg.rows * cfg.columns
    keep = [i for i in range(cfg.n_samples) if i not in drop]
    np.testing.assert_allclose(got[:n_ch][:, keep], frame[:n_ch][:, keep],
                               atol=2.0 / cfg.norm_factor)
    assert np.all(got[:, sorted(drop)] == 0.0)
    assert r.stats.gaps == 2


@pytest.mark.parametrize("backend", ["python", "native"])
def test_packet_loss_in_later_frame_zero_fills(backend):
    """Drops in a frame *after* the first must also leave zeros — the
    assembly buffer is zeroed after every publish, so stale samples from
    the previous frame never leak into dropped columns (advisor finding,
    round 1)."""
    port = 21913 if backend == "python" else 21914
    cfg = zrt.Config.tiny().replace(udp_port=port)
    rng = np.random.default_rng(13)
    frames = [np.abs(rng.standard_normal(
        (cfg.n_microphones, cfg.n_samples))).astype(np.float32) * 0.1 + 0.01
        for _ in range(2)]
    pkts = []
    for i, f in enumerate(frames):
        pkts.extend(protocol.frame_to_packets(
            cfg, f, n_arrays=1, start_counter=i * cfg.n_samples,
            exact_reference=False))
    # drop only in the SECOND frame (columns 5 and 6 of frame index 1)
    drop = {cfg.n_samples + 5, cfg.n_samples + 6}
    r = receiver.Receiver(cfg, replay_mode=True, backend=backend,
                          exact_reference=False)

    def send():
        time.sleep(0.2)
        s = streamer.Streamer(cfg, n_arrays=1, exact_reference=False)
        s.send_header()
        for c, p in enumerate(pkts):
            if c in drop:
                continue
            s._sock.sendto(p, (s.ip, s.port))
            time.sleep(0.0005)
        s.close()

    threading.Thread(target=send, daemon=True).start()
    r.connect(timeout=5.0)
    got, seq = r.read_frame(fresh=True, last_seq=1, timeout=5.0)
    r.disconnect()
    assert seq == 2
    n_ch = cfg.rows * cfg.columns
    dropped_cols = sorted(c - cfg.n_samples for c in drop)
    keep = [i for i in range(cfg.n_samples) if i not in dropped_cols]
    np.testing.assert_allclose(
        got[:n_ch][:, keep], frames[1][:n_ch][:, keep],
        atol=2.0 / cfg.norm_factor)
    # the dropped columns hold zeros, NOT frame-0 samples (all > 0 here)
    assert np.all(got[:, dropped_cols] == 0.0)


@pytest.mark.parametrize("backend", ["python", "native"])
def test_lost_final_packet_does_not_leak_partial_frame(backend):
    """Losing a frame's FINAL packet means that frame never publishes —
    its partially-assembled samples must be DISCARDED, not left in the
    buffer to leak into the next frame's lost-packet columns (review
    finding, round 3: the buffer was only zeroed after a successful
    publish)."""
    port = 21916 if backend == "python" else 21917
    cfg = zrt.Config.tiny().replace(udp_port=port)
    rng = np.random.default_rng(17)
    frames = [np.abs(rng.standard_normal(
        (cfg.n_microphones, cfg.n_samples))).astype(np.float32) * 0.1 + 0.01
        for _ in range(2)]
    pkts = []
    for i, f in enumerate(frames):
        pkts.extend(protocol.frame_to_packets(
            cfg, f, n_arrays=1, start_counter=i * cfg.n_samples,
            exact_reference=False))
    # drop frame 0's FINAL packet (it never publishes) AND two mid
    # columns of frame 1
    drop = {cfg.n_samples - 1, cfg.n_samples + 5, cfg.n_samples + 6}
    r = receiver.Receiver(cfg, replay_mode=True, backend=backend,
                          exact_reference=False)

    def send():
        time.sleep(0.2)
        s = streamer.Streamer(cfg, n_arrays=1, exact_reference=False)
        s.send_header()
        for c, p in enumerate(pkts):
            if c in drop:
                continue
            s._sock.sendto(p, (s.ip, s.port))
            time.sleep(0.0005)
        s.close()

    threading.Thread(target=send, daemon=True).start()
    r.connect(timeout=5.0)
    got, seq = r.read_frame(fresh=True, last_seq=0, timeout=5.0)
    r.disconnect()
    assert seq == 1                       # only frame 1 ever published
    n_ch = cfg.rows * cfg.columns
    dropped_cols = [5, 6]
    keep = [i for i in range(cfg.n_samples) if i not in dropped_cols]
    np.testing.assert_allclose(
        got[:n_ch][:, keep], frames[1][:n_ch][:, keep],
        atol=2.0 / cfg.norm_factor)
    # the dropped columns hold zeros, NOT frame-0's samples (all > 0):
    # before the fix, frame 0's partial assembly leaked through here
    assert np.all(got[:, dropped_cols] == 0.0)


@pytest.mark.parametrize("backend", ["python", "native"])
def test_header_array_count_over_capacity_rejected(backend):
    """A header declaring more arrays than the config can hold must be
    REJECTED at connect: the receive loop writes n_arrays*rows*cols frame
    rows, and a mismatched stream wrote past the n_mics-row buffer (heap
    corruption — found via `demo fullrate --preset tiny` with the old
    3-array emulator default against the 1-array tiny config)."""
    port = 21918 if backend == "python" else 21919
    cfg = zrt.Config.tiny().replace(udp_port=port)  # capacity: 1 array
    r = receiver.Receiver(cfg, replay_mode=True, backend=backend,
                          exact_reference=False)

    def send():
        time.sleep(0.2)
        s = streamer.Streamer(cfg, n_arrays=3, exact_reference=False)
        s.send_header()                 # header says 3 arrays
        s.close()

    threading.Thread(target=send, daemon=True).start()
    with pytest.raises(ConnectionError, match="array"):
        r.connect(timeout=5.0)
