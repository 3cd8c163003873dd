"""Recording / replay artifacts.

Capability parity with the reference's capture tooling:

* raw ``.npy`` audio capture, (n_mics, T) float32 — ``PC/record.py:28-46``;
* UDP packet capture to pcap (+ optional per-packet timestamp CSV) —
  ``main.pyx:602-612,772-791`` (tshark flow, here self-contained);
* video capture to mp4 via cv2 when available — ``main.pyx:618-633``;
* replay comes from ``ingest.streamer`` (udpreplay flow).
"""

from __future__ import annotations

import csv
import socket
import time
from typing import Optional

import numpy as np

from ..config import Config
from ..ingest import protocol


def get_recording(receiver, seconds: float) -> np.ndarray:
    """Capture ``seconds`` of contiguous frames from a connected
    :class:`~..ingest.receiver.Receiver` -> (n_mics, T) float32
    (``record.py:28-46``)."""
    cfg = receiver.cfg
    n_frames = int(np.ceil(seconds * cfg.sample_rate / cfg.n_samples))
    chunks = []
    seq = 0
    for _ in range(n_frames):
        frame, seq = receiver.read_frame(fresh=True, last_seq=seq,
                                         timeout=10.0)
        chunks.append(frame)
    return np.concatenate(chunks, axis=1)


def record_npy(receiver, seconds: float, path: str) -> str:
    np.save(path, get_recording(receiver, seconds))
    return path


def record_udp_to_pcap(cfg: Config, seconds: float, path: str,
                       timestamps_csv: Optional[str] = None,
                       ip: Optional[str] = None) -> int:
    """Capture raw protocol datagrams off the wire into a pcap (+ timestamp
    CSV), like ``record_udp`` (``main.pyx:772-791``).  Binds the ingest
    port itself — use on a port no receiver currently owns."""
    sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    sock.bind((ip or cfg.udp_replay_ip, cfg.udp_port))
    sock.settimeout(0.5)
    psize = protocol.packet_size(cfg)
    payloads, stamps = [], []
    deadline = time.time() + seconds
    while time.time() < deadline:
        try:
            data = sock.recv(psize)
        except socket.timeout:
            continue
        payloads.append(data)
        stamps.append(time.time())
    sock.close()
    protocol.write_pcap(path, payloads, stamps)
    if timestamps_csv:
        with open(timestamps_csv, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["index", "timestamp", "counter"])
            for i, (ts, p) in enumerate(zip(stamps, payloads)):
                w.writerow([i, f"{ts:.6f}", protocol.unpack_header(p)[3]])
    return len(payloads)


def record_webcam(path: str, seconds: float, src=0,
                  size=(640, 480), fps: float = 30.0) -> int:
    """mp4 webcam capture (``record_webcam``, ``main.pyx:618-633``);
    requires cv2 + a camera device."""
    import cv2

    cap = cv2.VideoCapture(src)
    fourcc = cv2.VideoWriter_fourcc(*"mp4v")
    out = cv2.VideoWriter(path, fourcc, fps, size)
    n = 0
    deadline = time.time() + seconds
    while time.time() < deadline:
        ok, frame = cap.read()
        if not ok:
            break
        out.write(cv2.resize(frame, size))
        n += 1
    cap.release()
    out.release()
    return n
