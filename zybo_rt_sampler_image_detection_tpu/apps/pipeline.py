"""Single-process real-time pipeline.

The reference spreads one dataflow across five+ processes (fork'd C
receiver, fork'd MISO child, multiprocessing producers, YOLO process,
viewer — ``main.pyx:669-736``, SURVEY.md §3.2).  Here each stage is a
thread around a jitted device program, sharing queues with the reference's
drop-oldest backpressure (``main.pyx:639-650``); XLA's async dispatch gives
the pipeline overlap the process pool was simulating.

Stages:
* :class:`HeatmapProducer` — fresh frame -> steered-power map -> q_power
  (the ``_loop_mimo_*`` producers, ``main.pyx:172-380``);
* :class:`MisoProducer`    — fresh frame -> steered beam -> gain -> audio
  sink, steerable live (``api.c:491-543`` miso_loop);
* :class:`CameraProducer`  — camera frames -> q_viewer + q_yolo
  (``main.pyx:614-661`` camera_reader);
* :class:`TrackerStage`    — q_yolo -> YOLO+SORT overlay -> q_inference.

Steering: :meth:`Pipeline.steer_cartesian_degree` /
:meth:`Pipeline.steer_click` mirror ``main.pyx:498-528`` without the
recompile (the direction index is a traced argument).
"""

from __future__ import annotations

import queue
import threading
import time
from functools import partial
from typing import Optional

import jax
import numpy as np

from ..config import Config
from ..ingest.receiver import Receiver
from ..ops import beamform
from ..utils import audio as audio_mod
from ..utils.metrics import PipelineMetrics


def put_drop_oldest(q: queue.Queue, item) -> bool:
    """The reference's backpressure: full queue -> drop the oldest
    (``main.pyx:639-650``).  Returns False if the item was dropped instead."""
    try:
        q.put_nowait(item)
        return True
    except queue.Full:
        try:
            q.get_nowait()
        except queue.Empty:
            pass
        try:
            q.put_nowait(item)
            return True
        except queue.Full:
            return False


def default_power_fn(tables):
    """Production policy for the heatmap stages' device program:

    * ``high`` / ``bf16`` rungs on TPU -> the fused Pallas kernel (faster
      AND more accurate than XLA's native HIGH — BENCHMARKS.md);
    * ``highest`` (the bit-level reference-exactness mode) or non-TPU
      backends (where the kernel would run in slow interpret mode) ->
      the exact XLA formulation.
    """
    if tables.precision != "highest" and jax.default_backend() == "tpu":
        from ..ops.pallas_kernels import FusedBeamformer

        fused = FusedBeamformer(tables)
        if fused.fits_vmem:
            return fused._call
    return lambda f: beamform.steered_power(f, tables)


class Stage(threading.Thread):
    def __init__(self, name: str, metrics: PipelineMetrics):
        super().__init__(name=name, daemon=True)
        self.stop_event = threading.Event()
        self.metric = metrics.stage(name)

    def stop(self):
        self.stop_event.set()


class HeatmapProducer(Stage):
    def __init__(self, receiver: Receiver, tables, q_power: queue.Queue,
                 metrics: PipelineMetrics, power_fn=None):
        super().__init__("heatmap", metrics)
        self.receiver = receiver
        self.tables = tables
        self.q_power = q_power
        self.power_fn = power_fn or default_power_fn(tables)

    def run(self):
        seq = 0
        while not self.stop_event.is_set():
            try:
                frame, seq = self.receiver.read_frame(fresh=True,
                                                      last_seq=seq,
                                                      timeout=1.0)
            except TimeoutError:
                continue
            t0 = time.perf_counter()
            power = np.asarray(self.power_fn(frame))
            self.metric.tick(time.perf_counter() - t0)
            if not put_drop_oldest(self.q_power, (power, seq)):
                self.metric.drop()


class BatchedHeatmapProducer(Stage):
    """Full-line-rate heatmap stage: EVERY frame beamformed, not
    latest-frame sampling.

    The reference's consumer snapshots whichever frame is newest
    (``get_data``, ``api.c:830-859``) and silently discards the rest even
    though the receiver writes all of them (``receiver.c:94-151``).  On TPU
    the per-frame compute is microseconds, so this stage drains the
    receiver's frame ring in counter-contiguous batches of K, runs ONE
    batched ``(K, M, N) -> (K, X, Y)`` device launch, and delivers every
    heatmap.  The device pipeline is double-buffered: batch *i+1* is
    transferred (``jax.device_put``, async) and dispatched while batch *i*'s
    result is synchronized, and the input buffer is donated
    (``donate_argnums``) so XLA reuses its HBM.

    ``sink(powers (K, X, Y) float32, first_seq)`` receives every batch in
    order; the default sink publishes the newest heatmap of each batch to
    ``q_power`` (display semantics) — pass your own to consume all of them.
    Accounting: ``processed`` counts beamformed frames, ``skipped`` counts
    frames the ring overwrote unread (the drop metric; 0 = full rate
    sustained), ``metric`` records per-batch latency.
    """

    def __init__(self, receiver: Receiver, tables, q_power: queue.Queue,
                 metrics: PipelineMetrics, batch: int = 16,
                 power_fn=None, sink=None, channels: int = 0):
        super().__init__("heatmap_batched", metrics)
        if batch > receiver.ring_frames:
            # fail fast: read_batch would raise inside the stage thread,
            # killing it silently while the pipeline runs on heatmap-less
            raise ValueError(
                f"batch ({batch}) exceeds the receiver ring capacity "
                f"({receiver.ring_frames}); raise Pipeline(ring_frames=)")
        self.receiver = receiver
        self.tables = tables
        self.q_power = q_power
        self.batch = batch
        self.channels = channels
        self.processed = 0
        self.skipped = 0
        self.sink = sink or self._default_sink
        if power_fn is None:
            # donation lets XLA reuse the input batch's HBM; CPU can't use
            # it and warns, so only donate on device backends
            donate = (0,) if jax.default_backend() != "cpu" else ()
            n_full = receiver.cfg.n_microphones
            fused = None
            if tables.precision != "highest" \
                    and jax.default_backend() == "tpu":
                from ..ops.pallas_kernels import FusedBeamformer

                f = FusedBeamformer(tables)
                if f.fits_vmem:
                    fused = f

            # tables enter as a pytree ARGUMENT (constants would bloat the
            # compile request — see pallas_kernels.FusedBeamformer)
            @partial(jax.jit, donate_argnums=donate)
            def _power(frames, t):
                # channel-sliced transfers are padded back to the full
                # mic axis on device (the tail rows are always zero)
                pad = n_full - frames.shape[1]
                if pad > 0:
                    frames = jax.numpy.pad(frames,
                                           ((0, 0), (0, pad), (0, 0)))
                if fused is not None:
                    return fused._forward(frames, t.W, t.Wc, t.adaptive)
                return beamform.steered_power(frames, t)

            power_fn = lambda frames: _power(frames, tables)  # noqa: E731
        elif channels and channels < receiver.cfg.n_microphones:
            # custom power_fn (fft/mvdr backends) with channel-sliced
            # transfers: pad the tail mic rows back before calling it —
            # without this the freq-domain channel gather would silently
            # clamp out-of-range indices to the last sliced row
            base_fn = power_fn
            n_full = receiver.cfg.n_microphones

            def power_fn(frames, _b=base_fn, _n=n_full):
                pad = _n - frames.shape[1]
                if pad > 0:
                    frames = jax.numpy.pad(frames,
                                           ((0, 0), (0, pad), (0, 0)))
                return _b(frames)
        self.power_fn = power_fn

    def _default_sink(self, powers: np.ndarray, first_seq: int):
        if not put_drop_oldest(self.q_power,
                               (powers[-1], first_seq + len(powers) - 1)):
            pass  # display drop only; processing already counted

    def warmup(self):
        n_ch = self.channels or self.receiver.cfg.n_microphones
        zeros = np.zeros((self.batch, n_ch, self.receiver.cfg.n_samples),
                         np.float32)
        np.asarray(self.power_fn(jax.device_put(zeros)))

    def _finish(self, pending):
        out, first, t0 = pending
        powers = np.asarray(out)
        self.metric.tick(time.perf_counter() - t0)
        self.processed += powers.shape[0]
        self.sink(powers, first)

    def run(self):
        next_seq = 1
        pending = None
        while not self.stop_event.is_set():
            try:
                batch, first, skipped = self.receiver.read_batch(
                    self.batch, next_seq, timeout=0.5,
                    channels=self.channels)
            except TimeoutError:
                if pending is not None:
                    self._finish(pending)
                    pending = None
                continue
            next_seq = first + self.batch
            if skipped:
                self.skipped += skipped
                self.metric.drop(skipped)
            t0 = time.perf_counter()
            dev = jax.device_put(batch)         # async H2D, double-buffered
            out = self.power_fn(dev)            # async dispatch
            if pending is not None:
                self._finish(pending)           # sync batch i-1
            pending = (out, first, t0)
        if pending is not None:
            self._finish(pending)


class MisoProducer(Stage):
    def __init__(self, receiver: Receiver, tables, cfg: Config,
                 sink: audio_mod.AudioSink, metrics: PipelineMetrics):
        super().__init__("miso", metrics)
        self.receiver = receiver
        self.tables = tables
        self.cfg = cfg
        self.sink = sink
        self._direction = 0
        self._lock = threading.Lock()

    def steer(self, direction: int):
        """``api.c:576-581``: mutate the steer offset live."""
        with self._lock:
            self._direction = int(direction)

    def run(self):
        seq = 0
        n = self.tables.n_mics
        while not self.stop_event.is_set():
            try:
                frame, seq = self.receiver.read_frame(fresh=True,
                                                      last_seq=seq,
                                                      timeout=1.0)
            except TimeoutError:
                continue
            with self._lock:
                d = self._direction
            t0 = time.perf_counter()
            beam = np.asarray(beamform.miso_beam(frame, self.tables, d))
            out = audio_mod.miso_gain(beam, n, self.cfg.mic_gain,
                                      self.cfg.norm_factor_sound)
            self.sink.write(out.astype(np.float32))
            self.metric.tick(time.perf_counter() - t0)


class BatchedMisoProducer(Stage):
    """Full-rate (gapless) steered LISTENING: every frame beamed, in
    counter-contiguous batches.

    The reference's whole point of MISO is *continuous* playback — its
    miso_loop feeds a PortAudio ring at line rate (``api.c:491-543``).
    :class:`MisoProducer` keeps the reference's get_data semantics
    (latest-frame snapshots, ``api.c:830-859``) which can skip/duplicate
    frames in the audio stream; this stage instead drains the frame ring
    in counter-contiguous K-frame batches, runs ONE batched
    ``(K, M, N) -> (K, N)`` beam launch, and writes the concatenated
    samples to the sink — a gapless 48,828 samples/s stream.  Frames the
    ring overwrote unread are zero-filled (and counted in
    ``underrun_frames``) so the output stays sample-count exact.

    ``beam_fn(frames_dev (K, M, N), direction int) -> (K, N)``: the
    delay-and-sum default comes from :meth:`Pipeline.make_miso_batched`;
    pass ``beam='mvdr'`` there for the adaptive (streaming-MVDR
    distortionless) beam, whose weights refresh from the streaming
    precision state every batch.  Steering (:meth:`steer`) is a traced
    argument — live, no recompile (``api.c:576-581``).

    Accounting: ``processed`` frames beamed, ``underrun_frames`` frames
    lost to ring overwrites (0 = gapless), ``samples`` written to the
    sink, ``metric`` per-batch latency.
    """

    def __init__(self, receiver: Receiver, sink: audio_mod.AudioSink,
                 metrics: PipelineMetrics, batch: int, beam_fn, post_fn,
                 n_samples: int, channels: int = 0):
        super().__init__("miso_batched", metrics)
        if batch > receiver.ring_frames:
            raise ValueError(
                f"batch ({batch}) exceeds the receiver ring capacity "
                f"({receiver.ring_frames}); raise Pipeline(ring_frames=)")
        self.receiver = receiver
        self.sink = sink
        self.batch = batch
        self.beam_fn = beam_fn
        self.post_fn = post_fn
        self.n_samples = n_samples
        self.channels = channels
        self.processed = 0
        self.underrun_frames = 0
        self.samples = 0
        self._direction = 0
        self._lock = threading.Lock()

    def steer(self, direction: int):
        with self._lock:
            self._direction = int(direction)

    def warmup(self):
        n_ch = self.channels or self.receiver.cfg.n_microphones
        zeros = np.zeros((self.batch, n_ch, self.n_samples), np.float32)
        np.asarray(self.beam_fn(jax.device_put(zeros), 0))

    def _finish(self, pending):
        out, skipped, t0 = pending
        beams = np.asarray(out)                        # (K, N) sync
        self.metric.tick(time.perf_counter() - t0)
        if skipped:
            # keep the stream time-aligned: silence for the lost frames
            self.underrun_frames += skipped
            self.metric.drop(skipped)
            gap = np.zeros(skipped * self.n_samples, np.float32)
            self.sink.write(gap)
            self.samples += gap.size
        audio = self.post_fn(beams).reshape(-1).astype(np.float32)
        self.sink.write(audio)
        self.samples += audio.size
        self.processed += beams.shape[0]

    def run(self):
        next_seq = 1
        pending = None
        while not self.stop_event.is_set():
            try:
                batch, first, skipped = self.receiver.read_batch(
                    self.batch, next_seq, timeout=0.5,
                    channels=self.channels)
            except TimeoutError:
                if pending is not None:
                    self._finish(pending)
                    pending = None
                continue
            next_seq = first + self.batch
            with self._lock:
                d = self._direction
            t0 = time.perf_counter()
            dev = jax.device_put(batch)        # async H2D, double-buffered
            out = self.beam_fn(dev, d)         # async dispatch
            if pending is not None:
                self._finish(pending)          # sync batch i-1, in order
            pending = (out, skipped, t0)
        if pending is not None:
            self._finish(pending)


class CameraProducer(Stage):
    def __init__(self, capture, q_viewer: queue.Queue, q_yolo: queue.Queue,
                 metrics: PipelineMetrics, fps_limit: float = 60.0):
        super().__init__("camera", metrics)
        self.capture = capture
        self.q_viewer = q_viewer
        self.q_yolo = q_yolo
        self.interval = 1.0 / fps_limit

    def run(self):
        n = 0
        while not self.stop_event.is_set():
            ok, frame = self.capture.read()
            if not ok:
                break
            n += 1
            self.metric.tick()
            put_drop_oldest(self.q_viewer, (n, frame))
            put_drop_oldest(self.q_yolo, (n, frame))
            time.sleep(self.interval)


class TrackerStage(Stage):
    def __init__(self, detector, q_yolo: queue.Queue,
                 q_inference: queue.Queue, metrics: PipelineMetrics):
        super().__init__("tracker", metrics)
        self.q_yolo = q_yolo
        self.q_inference = q_inference
        from ..models.tracking import SmoothedTracker
        from ..utils import imaging
        self._imaging = imaging
        self.tracker = SmoothedTracker(detector)

    def run(self):
        from ..models.tracking import compute_iou
        rect_conf = [[0, 0], [0, 0], 0]
        while not self.stop_event.is_set():
            try:
                frame_no, frame = self.q_yolo.get(timeout=0.5)
            except queue.Empty:
                continue
            t0 = time.perf_counter()
            if frame.ndim == 2:
                frame = np.repeat(frame[..., None], 3, -1)
            blank = np.zeros_like(frame)
            tracks, dets = self.tracker.step(frame)
            for tr in tracks:
                x1, y1, x2, y2, tid = tr.astype(int)
                self._imaging.rectangle(blank, (x1, y1), (x2, y2),
                                        (0, 255, 0), 2)
                conf = 0.0
                for det in dets:
                    if compute_iou([x1, y1, x2, y2], det[:4]) > 0.5:
                        conf = float(det[4])
                        break
                rect_conf = [[int(x1), int(y1)], [int(x2), int(y2)], conf]
            self.metric.tick(time.perf_counter() - t0)
            put_drop_oldest(self.q_inference, (frame_no, blank, rect_conf))


class Pipeline:
    """Owns the receiver + stages; the ``mimo()``/``miso()`` orchestration
    layer (``main.pyx:669-736,824-864``) as one object."""

    def __init__(self, cfg: Optional[Config] = None, algorithm: str = "lerp",
                 replay_mode: bool = False, backend: str = "auto",
                 audio_sink: str = "null", audio_path: Optional[str] = None,
                 power_fn=None, ring_frames: int = 64):
        self.cfg = cfg or Config()
        self.metrics = PipelineMetrics()
        self.tables = beamform.make_tables(self.cfg, algorithm)
        self.receiver = Receiver(self.cfg, replay_mode=replay_mode,
                                 backend=backend, ring_frames=ring_frames)
        self.q_power: queue.Queue = queue.Queue(maxsize=2)
        self.q_viewer: queue.Queue = queue.Queue(maxsize=2)
        self.q_yolo: queue.Queue = queue.Queue(maxsize=2)
        self.q_inference: queue.Queue = queue.Queue(maxsize=2)
        self.stages = []
        self._audio_sink_kind = audio_sink
        self._audio_path = audio_path
        self._miso: Optional[MisoProducer] = None
        self._power_fn = power_fn

    # -- bring-up -------------------------------------------------------------

    def connect(self, timeout: float = 30.0) -> int:
        return self.receiver.connect(timeout=timeout)

    def start_heatmap(self, warmup: bool = True):
        s = HeatmapProducer(self.receiver, self.tables, self.q_power,
                            self.metrics, power_fn=self._power_fn)
        if warmup:
            # jit-compile before the thread starts so the first live frame
            # is not delayed by the (slow, ~30 s on a tunneled TPU) compile.
            zeros = np.zeros((self.cfg.n_microphones, self.cfg.n_samples),
                             np.float32)
            np.asarray(s.power_fn(zeros))
        self.stages.append(s)
        s.start()
        return s

    def make_heatmap_batched(self, batch: int = 16, sink=None,
                             channels: int = 0):
        """Build (but don't start) the full-line-rate stage — lets callers
        :meth:`BatchedHeatmapProducer.warmup` (compile) before any packets
        flow, then :meth:`run_stage` it after :meth:`connect`."""
        return BatchedHeatmapProducer(self.receiver, self.tables,
                                      self.q_power, self.metrics,
                                      batch=batch, power_fn=self._power_fn,
                                      sink=sink, channels=channels)

    def run_stage(self, s):
        self.stages.append(s)
        s.start()
        return s

    def start_heatmap_batched(self, batch: int = 16, sink=None,
                              warmup: bool = True):
        """Full-line-rate variant of :meth:`start_heatmap` — every frame
        beamformed in K-frame device batches (SURVEY §7 hard part b)."""
        s = self.make_heatmap_batched(batch=batch, sink=sink)
        if warmup:
            s.warmup()
        return self.run_stage(s)

    def start_miso(self, warmup: bool = True):
        sink = audio_mod.make_sink(self._audio_sink_kind,
                                   self.cfg.sample_rate, self._audio_path)
        s = MisoProducer(self.receiver, self.tables, self.cfg, sink,
                         self.metrics)
        if warmup:
            zeros = np.zeros((self.cfg.n_microphones, self.cfg.n_samples),
                             np.float32)
            np.asarray(beamform.miso_beam(zeros, self.tables, 0))
        self._miso = s
        self.stages.append(s)
        s.start()
        return s

    def make_miso_batched(self, batch: int = 16, beam: str = "time",
                          channels: int = 0, alpha: float = 0.9,
                          sink: Optional[audio_mod.AudioSink] = None):
        """Build (don't start) the full-rate listening stage.

        ``beam='time'``: batched delay-and-sum (``beamform.miso_beam``)
        through this pipeline's algorithm tables, with the reference's
        gain chain (``api.c:517-522``).  ``beam='mvdr'``: the adaptive
        distortionless beam — one fused device program per batch absorbs
        the frames into the streaming inverse covariance and beams them
        with the refreshed MVDR weights (``freq.mvdr_listen_step``).
        """
        cfg = self.cfg
        n_full = cfg.n_microphones
        donate = (0,) if jax.default_backend() != "cpu" else ()
        if beam == "time":
            tables = self.tables

            @partial(jax.jit, donate_argnums=donate)
            def _beam(frames, t, d):
                pad = n_full - frames.shape[1]
                if pad > 0:
                    frames = jax.numpy.pad(frames,
                                           ((0, 0), (0, pad), (0, 0)))
                return beamform.miso_beam(frames, t, d)

            beam_fn = lambda frames, d: _beam(frames, tables, d)  # noqa: E731
            n = tables.n_mics
            post_fn = lambda b: audio_mod.miso_gain(       # noqa: E731
                b, n, cfg.mic_gain, cfg.norm_factor_sound)
        elif beam == "mvdr":
            from ..ops import freq

            ft = freq.make_freq_tables(cfg, 100.0)
            state = {"p": freq.init_precision(ft)}

            @partial(jax.jit, static_argnames=("alpha",))
            def _step(st, frames, t, d, alpha):
                pad = n_full - frames.shape[1]
                if pad > 0:
                    frames = jax.numpy.pad(frames,
                                           ((0, 0), (0, pad), (0, 0)))
                return freq.mvdr_listen_step(st, frames, t, d, alpha=alpha)

            def beam_fn(frames, d, _t=ft, _s=state):
                beams, _s["p"] = _step(_s["p"], frames, _t, d, alpha)
                return beams

            def _reset(_t=ft, _s=state):
                _s["p"] = freq.init_precision(_t)

            beam_fn.reset = _reset
            # the MVDR beam is distortionless (unit gain toward the steer
            # direction) — no 1/n·MIC_GAIN rescale
            post_fn = lambda b: b                          # noqa: E731
        else:
            raise ValueError(f"unknown beam backend {beam!r}")
        if sink is None:
            sink = audio_mod.make_sink(self._audio_sink_kind,
                                       cfg.sample_rate, self._audio_path)
        s = BatchedMisoProducer(self.receiver, sink, self.metrics,
                                batch, beam_fn, post_fn,
                                cfg.n_samples, channels=channels)
        self._miso = s
        return s

    def start_miso_batched(self, batch: int = 16, beam: str = "time",
                           warmup: bool = True, channels: int = 0,
                           sink: Optional[audio_mod.AudioSink] = None):
        """Full-rate variant of :meth:`start_miso` — gapless line-rate
        listening (VERDICT: the one reference capability the latest-frame
        sampler could not meet)."""
        s = self.make_miso_batched(batch=batch, beam=beam,
                                   channels=channels, sink=sink)
        if warmup:
            s.warmup()
            if getattr(s.beam_fn, "reset", None):
                s.beam_fn.reset()          # drop warmup pollution
        return self.run_stage(s)

    def start_camera(self, capture):
        s = CameraProducer(capture, self.q_viewer, self.q_yolo, self.metrics)
        self.stages.append(s)
        s.start()
        return s

    def start_tracker(self, detector):
        s = TrackerStage(detector, self.q_yolo, self.q_inference,
                         self.metrics)
        self.stages.append(s)
        s.start()
        return s

    # -- steering (main.pyx:498-528 semantics) ---------------------------------

    def steer_cartesian_degree(self, azimuth: float, elevation: float):
        assert -90 <= azimuth <= 90 and -90 <= elevation <= 90, \
            "Invalid range"
        d = beamform.steer_index(self.cfg, azimuth, elevation)
        if self._miso is not None:
            self._miso.steer(d)
        return d

    def steer_click(self, horizontal01: float, vertical01: float):
        """Normalized click coords -> grid cell (``stear_miso_beam``)."""
        az = int(np.clip(horizontal01 * self.cfg.max_res_x, 0,
                         self.cfg.max_res_x - 1))
        el = int(np.clip(vertical01 * self.cfg.max_res_y, 0,
                         self.cfg.max_res_y - 1))
        d = az * self.cfg.max_res_y + el
        if self._miso is not None:
            self._miso.steer(d)
        return d

    # -- teardown --------------------------------------------------------------

    def stop(self):
        for s in self.stages:
            s.stop()
        for s in self.stages:
            s.join(timeout=2.0)
        self.receiver.disconnect()
        if self._miso is not None:
            self._miso.sink.close()

    def report(self):
        rep = self.metrics.report()
        rep["ingest"] = {
            "packets": self.receiver.native_stats.packets,
            "frames": self.receiver.native_stats.frames,
            "gaps": self.receiver.native_stats.gaps,
        }
        return rep
