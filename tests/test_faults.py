"""Failure-path tests: malformed packets, receiver timeouts, camera death,
miso_pad2 parity."""

import threading
import time

import numpy as np
import pytest

import zybo_rt_sampler_image_detection_tpu as zrt
from zybo_rt_sampler_image_detection_tpu.ingest import (
    protocol, receiver, streamer,
)
from zybo_rt_sampler_image_detection_tpu.ops import beamform, geometry, oracle


def test_short_and_garbage_packets_ignored():
    cfg = zrt.Config.tiny().replace(udp_port=21930)
    rng = np.random.default_rng(0)
    frames = [(rng.standard_normal((cfg.n_microphones, cfg.n_samples)) * 0.1
               ).astype(np.float32) for _ in range(4)]
    r = receiver.Receiver(cfg, replay_mode=True, backend="python",
                          exact_reference=False)

    def send():
        time.sleep(0.2)
        s = streamer.Streamer(cfg, n_arrays=1, exact_reference=False)
        s.send_header()
        s._sock.sendto(b"short", (s.ip, s.port))           # runt -> dropped
        bad = protocol.pack_packet(cfg, np.zeros(4, "<i4"), 0, 1,
                                   protocol_ver=9)          # wrong version
        s._sock.sendto(bad, (s.ip, s.port))
        for f in frames:
            s.send_frame(f)
        s.close()

    threading.Thread(target=send, daemon=True).start()
    r.connect(timeout=5.0)
    got, _ = r.read_frame(fresh=True, last_seq=0, timeout=5.0)
    r.disconnect()
    errs = [np.abs(got - f).max() for f in frames]
    assert min(errs) < 2.0 / cfg.norm_factor
    assert r.stats.bad_protocol >= 1


def test_read_frame_timeout():
    cfg = zrt.Config.tiny().replace(udp_port=21931)
    r = receiver.Receiver(cfg, replay_mode=True, backend="python",
                          exact_reference=False)

    def send_header_only():
        time.sleep(0.2)
        s = streamer.Streamer(cfg, n_arrays=1)
        s.send_header()
        s.close()

    threading.Thread(target=send_header_only, daemon=True).start()
    r.connect(timeout=5.0)
    with pytest.raises(TimeoutError):
        r.read_frame(fresh=True, last_seq=0, timeout=0.3)
    r.disconnect()


def test_front_stops_on_camera_failure():
    import queue

    from zybo_rt_sampler_image_detection_tpu.utils.viz import (
        ArrayCapture, ArrayDisplay, Front,
    )

    q_rec, q_out = queue.Queue(), queue.Queue()
    q_rec.put(np.zeros((9, 7)))
    q_rec.put(np.zeros((9, 7)))

    class Running:
        value = 1

    dead_cam = ArrayCapture([])     # read() -> (False, None)
    f = Front(q_rec, q_out, Running(), capture=dead_cam,
              display=ArrayDisplay(), window=(32, 16))
    f.multi_loop(max_frames=5)      # must exit, not hang/crash
    assert f.display.frames == []


def test_miso_pad2_parity():
    """make_miso_tables == the C miso_pad2 path (dedicated single-direction
    whole-sample table from calculate_delay_miso)."""
    cfg = zrt.Config.tiny()
    rng = np.random.default_rng(3)
    frame = (rng.standard_normal((cfg.n_microphones, cfg.n_samples)) * 0.1
             ).astype(np.float32)
    az, el = 12.0, -8.0
    t = beamform.make_miso_tables(cfg, az, el)
    got = np.asarray(beamform.miso_beam(frame, t, 0))

    delays = geometry.calculate_delay_miso(cfg, az, el)
    active, n = geometry.active_microphones(cfg)
    out = np.zeros(cfg.n_samples, np.float32)
    for i, m in enumerate(active):
        oracle.pad_delay(frame[m], out, int(delays[m]))
    np.testing.assert_allclose(got, out, rtol=1e-5, atol=1e-7)


def _reference_delays_angles(cfg):
    """Literal transcription of ``directions.pyx:126-157`` — the
    multi-slot quirk included: only board 0 is written, then the global
    ``-= smallest`` puts slots 1+ at the constant ``-smallest``."""
    d = 0.02
    n_total = cfg.rows * cfg.columns * cfg.array_slots
    samp = np.zeros((cfg.max_res_x, cfg.max_res_y, n_total), np.float32)
    for xi, x in enumerate(np.linspace(-cfg.max_angle, cfg.max_angle,
                                       cfg.max_res_x)):
        xf = np.sin(x * -np.pi / 180.0)
        for yi, y in enumerate(np.linspace(-cfg.max_angle, cfg.max_angle,
                                           cfg.max_res_y)):
            yf = np.sin(y * -np.pi / 180.0)
            smallest = 0.0
            for row in range(cfg.rows):
                for col in range(cfg.columns):
                    half = d / 2.0
                    tc = col * d - cfg.columns * half + half
                    tr = row * d - cfg.rows * half + half
                    v = tc * xf + tr * yf
                    if v < smallest:
                        smallest = v
                    samp[xi, yi, row * cfg.columns + col] = v
            samp[xi, yi, :] -= smallest
    samp *= cfg.sample_rate / cfg.propagation_speed
    return samp


def test_angle_grid_delays_multi_slot_quirk():
    """calculate_delays_angles / calculate_delay_miso must reproduce the
    reference's multi-board quirk: steering delays on board 0 ONLY,
    slots 1+ at the constant -smallest (round-3 parity fix — the old
    code replicated board 0 across slots, and the shared oracle made
    every self-consistent test blind to it)."""
    cfg = zrt.Config.tiny().replace(n_microphones=32, array_slots=2,
                                    active_arrays=2)
    got = geometry.calculate_delays_angles(cfg)
    ref = _reference_delays_angles(cfg)
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)
    nb = cfg.rows * cfg.columns
    # slot 1 is a per-pixel constant, NOT the board-0 pattern
    assert np.allclose(got[..., nb:], got[..., nb:nb + 1])
    off_center = got[cfg.max_res_x - 1, 0]
    assert not np.allclose(off_center[:nb], off_center[nb:])

    # single-direction variant: same quirk, int truncation included
    dm = geometry.calculate_delay_miso(cfg, 17.0, -9.0)
    assert (dm[nb:] == dm[nb]).all()
    assert not np.array_equal(dm[:nb], dm[nb:])
