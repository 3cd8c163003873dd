"""Audio output sinks for the steered MISO beam.

The reference plays the beam through PortAudio from a fork'd C child
(``api.c:268-427``) or PyAudio (``PC/play.py``).  Neither is in this image,
so the playback engine is an abstract sink with three backends:

* :class:`SoundDeviceSink` — live playback when ``sounddevice`` exists;
* :class:`WavFileSink`     — stdlib ``wave`` writer (always available);
* :class:`NullSink`        — drop samples, keep timing (benchmarks).

The MISO gain chain matches ``miso_loop`` (``api.c:491-543``): beam/n *
MIC_GAIN, then clipped to [-1, 1] for the device.
"""

from __future__ import annotations

import wave
from typing import Optional

import numpy as np


class AudioSink:
    def write(self, samples: np.ndarray) -> None:
        raise NotImplementedError

    def close(self) -> None:
        pass


class NullSink(AudioSink):
    def __init__(self):
        self.frames = 0

    def write(self, samples: np.ndarray) -> None:
        self.frames += samples.shape[0]


class WavFileSink(AudioSink):
    """Stdlib ``wave`` writer.  Chunks are buffered in memory and written
    at :meth:`close` — a synchronous disk write inside the real-time
    stage thread can stall for tens of ms on a contended host and starve
    the line-rate pipeline (30 s of 48,828 Hz int16 mono is ~2.9 MB)."""

    def __init__(self, path: str, sample_rate: float):
        self._path = path
        self._rate = int(round(sample_rate))
        self._chunks = []

    def write(self, samples: np.ndarray) -> None:
        clipped = np.clip(samples, -1.0, 1.0)
        self._chunks.append((clipped * 32767).astype("<i2").tobytes())

    def close(self) -> None:
        w = wave.open(self._path, "wb")
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(self._rate)
        w.writeframes(b"".join(self._chunks))
        w.close()
        self._chunks = []


class SoundDeviceSink(AudioSink):                     # pragma: no cover
    def __init__(self, sample_rate: float):
        import sounddevice as sd
        self._stream = sd.OutputStream(
            samplerate=int(round(sample_rate)), channels=1, dtype="float32")
        self._stream.start()

    def write(self, samples: np.ndarray) -> None:
        self._stream.write(np.clip(samples, -1, 1).astype(np.float32))

    def close(self) -> None:
        self._stream.stop()
        self._stream.close()


def make_sink(kind: str, sample_rate: float,
              path: Optional[str] = None) -> AudioSink:
    if kind == "null":
        return NullSink()
    if kind == "wav":
        return WavFileSink(path or "miso.wav", sample_rate)
    if kind == "sounddevice":
        return SoundDeviceSink(sample_rate)
    if kind == "auto":
        try:
            return SoundDeviceSink(sample_rate)
        except Exception:
            return WavFileSink(path or "miso.wav", sample_rate)
    raise ValueError(f"unknown audio sink {kind!r}")


def miso_gain(beam: np.ndarray, n_mics: int, mic_gain: float,
              norm_sound: Optional[float] = None) -> np.ndarray:
    """``api.c:517-522``: out = beam / n * MIC_GAIN."""
    out = beam / float(n_mics) * float(mic_gain)
    if norm_sound:
        out = out / norm_sound
    return out
