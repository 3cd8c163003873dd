#!/usr/bin/env python
"""Headline benchmark: steered-power heatmaps/second, 64 ch x 65x65 grid.

This is the BASELINE.json north-star metric (>= 1000 heatmaps/s on one
v5e chip).  It measures the sustained throughput of the flagship fused
steered-power path (lerp delay-and-sum — the reference's default
quality/speed point) with device-resident frame batches, i.e. the
steady-state the double-buffered ingest feeds.

Prints exactly one JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N/1000}
"""

import json
import sys
import time

import numpy as np


def main(smoke: bool = False) -> None:
    """``smoke=True`` (CLI ``--smoke``): run every rung once on tiny
    shapes on the CPU backend — validates the script end-to-end (API
    drift, name errors) without a TPU; the numbers are meaningless."""
    import jax

    if smoke:
        jax.config.update("jax_platforms", "cpu")
    else:
        # Device-claim watchdog: the axon tunnel's outages make
        # jax.devices() hang INDEFINITELY inside the plugin (observed
        # multi-hour outages).  An unattended driver run must record an
        # honest failure instead of hanging with no record at all.
        import threading

        done = threading.Event()
        claim_err = []

        def _claim():
            try:
                jax.devices()
            except BaseException as e:   # report, don't misdiagnose
                claim_err.append(f"{type(e).__name__}: {e}")
            done.set()

        threading.Thread(target=_claim, daemon=True).start()
        if not done.wait(timeout=300.0) or claim_err:
            # distinguish a hang (tunnel outage — not a regression) from
            # a fast claim FAILURE (plugin/env breakage — reproducible,
            # must be surfaced as itself, not blamed on the tunnel)
            err = (f"TPU claim failed: {claim_err[0]}" if claim_err else
                   "TPU unreachable: device claim hung >300 s "
                   "(axon tunnel outage) — not a regression; see "
                   "BENCHMARKS.md for the last recorded ladder")
            print(json.dumps({
                "metric": "steered_power_heatmaps_per_sec_64ch_65x65",
                "value": 0.0,
                "unit": "heatmaps/s",
                "vs_baseline": 0.0,
                "error": err,
            }), flush=True)
            import os
            os._exit(0)       # the claim thread may be stuck in C

    import zybo_rt_sampler_image_detection_tpu as zrt
    from zybo_rt_sampler_image_detection_tpu.ops import beamform
    from zybo_rt_sampler_image_detection_tpu.ops.pallas_kernels import (
        FusedBeamformer,
    )

    B = 8 if smoke else 512
    R = 1 if smoke else 3
    cfg0 = zrt.Config.tiny() if smoke else zrt.Config.northstar()
    rng = np.random.default_rng(0)
    frames_dev = jax.device_put(rng.standard_normal(
        (B, cfg0.n_microphones, cfg0.n_samples)).astype(np.float32))

    spreads = {}

    def _steal_ticks():
        try:
            with open("/proc/stat") as f:
                return int(f.readline().split()[8])
        except (OSError, IndexError, ValueError):
            return 0

    # a rung whose repeats spread more than this is re-measured once and
    # the better-spread set kept (VERDICT r4 #6: the r04 run published a
    # 0.213-spread headline rung from a 347-steal-tick contended window)
    SPREAD_BAR = 0.05

    def _pick_rates(measure, key):
        """``measure() -> sorted rates``; re-run once if the spread
        exceeds SPREAD_BAR (contended window), keep the tighter set."""
        rates = measure()
        med = rates[len(rates) // 2]
        spread = (rates[-1] - rates[0]) / med if med else 0.0
        if spread > SPREAD_BAR and not smoke:
            r2 = measure()
            m2 = r2[len(r2) // 2]
            s2 = (r2[-1] - r2[0]) / m2 if m2 else 0.0
            if s2 < spread:
                rates, med, spread = r2, m2, s2
        if key is not None:
            spreads[key] = round(spread, 3)
        return med

    def timed_batched(fn, frames, nb, n_iter, key=None, repeats=None):
        """Median rate over ``repeats`` runs (+ relative spread recorded in
        ``spreads`` — a wide spread flags host/tunnel contention, which a
        single-shot number cannot distinguish from a regression; rungs
        spreading > SPREAD_BAR re-run once, tighter set kept).

        Sync with a 4-byte host read: on this backend block_until_ready
        can acknowledge before execution finishes for small programs, and
        a full-output transfer would time the tunnel, not the chip."""
        repeats = R if repeats is None else repeats
        np.asarray(fn(frames)[0, 0, 0])              # compile + warm

        def measure():
            rates = []
            for _ in range(repeats):
                t0 = time.perf_counter()
                out = None
                for _ in range(n_iter):
                    out = fn(frames)
                np.asarray(out[0, 0, 0])
                rates.append((nb * n_iter) / (time.perf_counter() - t0))
            rates.sort()
            return rates

        return _pick_rates(measure, key)

    def timed(fn, n_iter=12, key=None):
        return timed_batched(fn, frames_dev, B, 1 if smoke else n_iter,
                             key=key)

    steal0 = _steal_ticks()

    class _Ladder(dict):
        """Streams each rung to stderr as it completes — a mid-run
        tunnel hang (observed: multi-hour axon outages) then still
        leaves partial evidence instead of nothing."""

        def __setitem__(self, k, v):
            super().__setitem__(k, v)
            print(f"# rung {k}: {v:.1f}", file=sys.stderr, flush=True)

    ladder = _Ladder()
    # Per-map FLOP models (2 FLOP/MAC, dominant contractions only) so the
    # stderr report can translate maps/s -> achieved TFLOPS and MFU per
    # rung (VERDICT r3 #8).  Time-domain: the (D, T*M) @ (T*M, B*N) beam
    # matmul.  Equiv: DFT-by-matmul (4*M*N*F) + the stacked K=2M plane
    # contraction (8*D*M*F); head/tail corrections are <1% and omitted.
    flops_per_map = {}

    def _td_flops(tables, n_samples):
        D, T, M = tables.W.shape
        return 2.0 * D * T * M * n_samples

    def _equiv_flops(et, n_samples):
        D, M2, F = et.Hs1.shape
        return 2.0 * M2 * n_samples * F + 4.0 * D * M2 * F
    # "highest": bit-level f32 (the exactness-gate mode); "high": 3-pass
    # bf16 hi/lo emulation (abs err bound gated by
    # test_fused_three_pass_mode; measured ~5e-6 rel on the power map vs
    # XLA native HIGH's ~2.4e-5 — BENCHMARKS.md); "bf16": single-pass
    # bf16 (~2e-3).
    rungs = (
        ("highest", dict(matmul_precision="highest")),
        ("high", dict(matmul_precision="high")),
        ("bf16", dict(matmul_precision="default", matmul_dtype="bfloat16")),
    )
    for name, kw in rungs:
        cfg = cfg0.replace(**kw)
        tables = beamform.make_tables(cfg, "lerp", cache=False)
        # NO jit(lambda ... t=tables) wrapper: a default argument lowers
        # as a baked constant (the CLAUDE.md minutes-long-compile / HTTP
        # 413 failure mode); steered_power is already jitted with the
        # tables as pytree ARGUMENTS.
        xla_rate = timed(lambda f: beamform.steered_power(f, tables),
                         key=f"{name}_xla")
        flops_per_map[f"{name}_xla"] = flops_per_map[name] = \
            _td_flops(tables, cfg.n_samples)
        ladder[f"{name}_xla"] = xla_rate
        best = xla_rate
        fused = FusedBeamformer(tables)
        if fused.fits_vmem:
            best = max(best, timed(fused._call, key=name))
        ladder[name] = best

    # EXACT frequency-domain reformulation (opt-in
    # power_backend="freq_equiv"): stacked-plane (K=2M) contraction with
    # exact-f32-class output (~2e-6) — the fastest exact-tier path
    # (BENCHMARKS.md round 3).
    from zybo_rt_sampler_image_detection_tpu.ops import freq_equiv
    et_ns = freq_equiv.make_equiv_tables(beamform.make_tables(
        cfg0.replace(matmul_precision="high"), "lerp", cache=False))
    flops_per_map["high_equiv_exact"] = _equiv_flops(et_ns, cfg0.n_samples)
    ladder["high_equiv_exact"] = timed(
        lambda f: freq_equiv.equiv_steered_power(f, et_ns),
        key="high_equiv_exact")
    ladder["high"] = max(ladder["high"], ladder["high_equiv_exact"])
    del et_ns

    # fused equiv KERNEL (ops/equiv_kernel): spectra stay in VMEM — the
    # production default at the 'high' and 'bf16' rungs for every in-bar
    # shape (pipeline._equiv_kernel_if_favored)
    from zybo_rt_sampler_image_detection_tpu.ops.equiv_kernel import (
        FusedEquivBeamformer,
    )

    def checked_kernel(tables, **kw):
        """Tuned-plan compile guard (VERDICT r3 #5): _TUNED_PLANS pins
        winners measured against an erratic Mosaic compile ceiling; a
        toolchain bump could turn one into a production compile crash.
        Compile the plan CACHE-OFF before publishing its rung; on
        failure fall back to the auto-search plan (and say so)."""
        ek0 = FusedEquivBeamformer(tables, **kw)
        if smoke:
            return ek0                     # CPU interpret path: no Mosaic
        old = jax.config.jax_enable_compilation_cache
        try:
            jax.config.update("jax_enable_compilation_cache", False)
            import jax.numpy as jnp
            zeros = jnp.zeros((8, ek0.M, ek0.N), jnp.float32)
            ek0._fwd.lower(zeros, ek0.kt).compile()
            return ek0
        except Exception as e:             # Mosaic allocator crash class
            print(f"# TUNED PLAN ({ek0.chunk_b}, {ek0.n_fc}) failed to "
                  f"compile: {type(e).__name__}; falling back to "
                  f"auto-search", file=sys.stderr)
            return FusedEquivBeamformer(tables, use_tuned=False, **kw)
        finally:
            jax.config.update("jax_enable_compilation_cache", old)
    ek = checked_kernel(beamform.make_tables(
        cfg0.replace(matmul_precision="high"), "lerp", cache=False))
    # same DFT + stacked-plane math as the XLA equiv path (2M planes)
    ek_flops = (2.0 * (2 * ek.M) * ek.N * ek.F
                + 4.0 * ek.D * (2 * ek.M) * ek.F)
    flops_per_map["high_equiv_kernel"] = ek_flops
    flops_per_map["bf16_equiv_kernel"] = ek_flops
    flops_per_map["f32_equiv_kernel"] = ek_flops
    ladder["high_equiv_kernel"] = timed(ek._call, key="high_equiv_kernel")
    ladder["high"] = max(ladder["high"], ladder["high_equiv_kernel"])
    ek = checked_kernel(beamform.make_tables(
        cfg0.replace(matmul_precision="default", matmul_dtype="bfloat16"),
        "lerp", cache=False))
    ladder["bf16_equiv_kernel"] = timed(ek._call, key="bf16_equiv_kernel")
    ladder["bf16"] = max(ladder["bf16"], ladder["bf16_equiv_kernel"])
    # f32 mode (6-pass HIGHEST planes): ~1e-6-class accuracy AND faster
    # than the XLA equiv path — recorded as its own accuracy tier (the
    # "highest" rung keeps the bit-level time-domain contract).
    ek = checked_kernel(beamform.make_tables(
        cfg0.replace(matmul_precision="high"), "lerp", cache=False),
        mode="f32")
    ladder["f32_equiv_kernel"] = timed(ek._call, key="f32_equiv_kernel")
    del ek

    # -- per-algorithm rows (round 2): every beamformer at "high", the
    # reference shape, the FFT backend, and real-time (RLS) MVDR ----------
    cfg_hi = cfg0.replace(matmul_precision="high")
    for algo in ("pad", "truncated", "convolve", "hybrid"):
        tables = beamform.make_tables(cfg_hi, algo, cache=True)
        flops_per_map[algo] = _td_flops(tables, cfg_hi.n_samples)
        rate = timed(lambda f, t=tables: beamform.steered_power(f, t))
        fused = FusedBeamformer(tables)
        if fused.fits_vmem:
            rate = max(rate, timed(fused._call))
        ladder[algo] = rate

    # the reference config shape: 57x32 grid, 256 channels, 3 arrays
    ref_cfg = (zrt.Config.tiny() if smoke else zrt.Config()).replace(
        matmul_precision="high")
    B_ref = 8 if smoke else 256
    frames_ref = jax.device_put(rng.standard_normal(
        (B_ref, ref_cfg.n_microphones, ref_cfg.n_samples)).astype(np.float32))
    t_ref = beamform.make_tables(ref_cfg, "lerp", cache=True)

    def timed_ref(fn, n_iter=8, key=None):
        return timed_batched(fn, frames_ref, B_ref, 1 if smoke else n_iter,
                             key=key)

    # NOTE: steered_power/fft_steered_power are already jitted with the
    # tables as pytree ARGUMENTS — wrapping them in another jit(lambda)
    # would bake the ~100 MB reference tables into the compile request
    # (the remote compile service rejects it with HTTP 413).
    flops_per_map["lerp_reference_shape_57x32_256ch"] = \
        flops_per_map["lerp_reference_shape_fused"] = \
        _td_flops(t_ref, ref_cfg.n_samples)
    ladder["lerp_reference_shape_57x32_256ch"] = timed_ref(
        lambda f: beamform.steered_power(f, t_ref),
        key="lerp_reference_shape_57x32_256ch")
    fused_ref = FusedBeamformer(t_ref)
    if fused_ref.fits_vmem:
        ladder["lerp_reference_shape_fused"] = timed_ref(
            fused_ref._call, key="lerp_reference_shape_fused")

    # EXACT frequency-domain reformulation (ops/freq_equiv): same output
    # as the time-domain lerp to f32 rounding, no T axis in the per-frame
    # contraction — the fastest exact path at the reference shape
    et_ref = freq_equiv.make_equiv_tables(t_ref)
    flops_per_map["lerp_reference_shape_equiv_exact"] = \
        flops_per_map["lerp_reference_shape_equiv_kernel"] = \
        _equiv_flops(et_ref, ref_cfg.n_samples)
    ladder["lerp_reference_shape_equiv_exact"] = timed_ref(
        lambda f: freq_equiv.equiv_steered_power(f, et_ref),
        key="lerp_reference_shape_equiv_exact")
    # ... and the fused equiv KERNEL — the production 'high' default at
    # this shape (tuned plan (128, 3); BENCHMARKS.md "Fused equiv kernel")
    ek_ref = checked_kernel(t_ref)
    ladder["lerp_reference_shape_equiv_kernel"] = timed_ref(
        ek_ref._call, key="lerp_reference_shape_equiv_kernel")
    del ek_ref

    from zybo_rt_sampler_image_detection_tpu.ops import freq
    ft = freq.make_freq_tables(ref_cfg, 100.0)
    ladder["fft_bartlett_reference_shape"] = timed_ref(
        lambda f: freq.fft_steered_power(f, ft))

    # real-time MVDR: per-frame Sherman-Morrison update + Capon map at the
    # reference shape (127 bins x 256 mics x 1824 directions)
    from functools import partial as _partial

    @_partial(jax.jit, static_argnames=())
    def mvdr_scan(st, frames, t):
        def step(s, fr):
            s2 = freq.update_precision(s, fr[None], t)
            return s2, freq.mvdr_power_precision(s2, t)
        return jax.lax.scan(step, st, frames)

    def timed_stateful(step_fn, st0, n_frames, iters=4, key=None,
                       repeats=None):
        repeats = R if repeats is None else repeats
        iters = 1 if smoke else iters
        st0, maps = step_fn(st0)                     # compile + warm
        np.asarray(maps.ravel()[0])

        def measure():
            st = st0
            rates = []
            for _ in range(repeats):
                t0 = time.perf_counter()
                for _ in range(iters):
                    st, maps = step_fn(st)
                np.asarray(maps.ravel()[0])
                rates.append(
                    (n_frames * iters) / (time.perf_counter() - t0))
            rates.sort()
            return rates

        return _pick_rates(measure, key)

    # device-rate proxy for the LIVE (unbatched) loops: 64 sequential
    # B=1 heatmaps inside one device program (lax.scan) — the per-frame
    # device latency with the ~40 ms tunnel dispatch removed.  This is
    # the number a local (untunneled) deployment's single-frame loop
    # would see; the observed ~24-29 Hz live rates are dispatch-bound.
    @jax.jit
    def _live_proxy(frames64, t):
        def step(c, fr):
            return c, beamform.steered_power(fr[None], t)[0]
        return jax.lax.scan(step, 0.0, frames64)[1]

    t_ns_hi = beamform.make_tables(cfg_hi, "lerp", cache=False)
    n64 = min(64, B)
    fr64 = jax.device_put(np.asarray(frames_dev[:n64]))
    ladder["live_loop_device_proxy_fps"] = timed_batched(
        lambda f: _live_proxy(f, t_ns_hi), fr64, n64, 1 if smoke else 4,
        key="live_loop_device_proxy_fps")

    K = 8
    fr_small = jax.device_put(np.asarray(frames_ref[:K]))
    ladder["mvdr_rls_per_frame_reference_shape"] = timed_stateful(
        lambda s: mvdr_scan(s, fr_small, ft), freq.init_precision(ft), K,
        key="mvdr_rls_per_frame_reference_shape")

    # subspace-recursive scan, PRODUCTION steady state: 16-frame blocks
    # with the a^H P a quadratic form carried between calls (re-measured
    # every d0_carry_interval frames) and the exact Cholesky refresh at
    # the alpha-aware cadence — one full 64-frame refresh epoch per
    # step_fn call, exactly the process_fn sequence in apps/pipeline.py
    Kb = 2 if smoke else 16
    fr_blks = [jax.device_put(np.asarray(frames_ref[i * Kb:(i + 1) * Kb]))
               for i in range(4)]
    carry_max = freq.d0_carry_interval()       # ~31 at alpha=0.9
    if not smoke:
        assert 16 <= carry_max < 4 * Kb        # d0 re-measured mid-epoch

    def mvdr_epoch(st):
        # the make_mvdr_stream production cadence (separate exact
        # refresh; round 5 replaced its factorization with the unrolled
        # complex potri — no XLA While — measured 21.9 -> 8.5 ms.  The
        # scan+refresh FUSION was implemented and measured NEGATIVE:
        # 1,770 vs 1,978 maps/s — see freq.mvdr_maps_scan_refresh)
        maps = None
        dq, dqc = None, 0
        for blk in fr_blks:
            if dq is None or dqc >= carry_max:
                dq, dqc = freq.mvdr_d0(st, ft), 0
            maps, st, dq = freq.mvdr_maps_scan(st, blk, ft, d0=dq,
                                               return_d=True)
            dqc += Kb
        return freq.refresh_precision(st, ft), maps

    ladder["mvdr_exact_per_frame_maps_reference_shape"] = timed_stateful(
        mvdr_epoch, freq.init_precision(ft), 4 * Kb,
        key="mvdr_exact_per_frame_maps_reference_shape")

    # -- fused display cycle (round 4 flagship, apps/fused.py): steered
    # power + YOLO detect + composite as ONE packed device program.
    # Device-proxy rate (packed input resident, non-donated jit twin) —
    # what the cycle sustains once the ~140 ms/fetch tunnel is out of
    # the picture; the tunnel-bound demo fps is recorded separately in
    # BENCHMARKS.md (VERDICT r4 #1/#2).
    try:
        ladder["fused_display_cycle_fps_device_proxy"] = \
            _fused_cycle_rung(ref_cfg, t_ref, smoke, timed_batched)
    except Exception as e:                  # never lose the core ladder
        print(f"# fused_display_cycle rung failed: "
              f"{type(e).__name__}: {e}", file=sys.stderr)

    # -- audio end-to-end (VERDICT r4 #1): the full in-process listening
    # path — native line-rate emulator -> ingest ring -> BatchedMiso
    # (one fused device program per K-frame batch) -> deadline-counting
    # mock playback sink.  Reports the measured packet->sink p50/p95 and
    # the sustained full-rate frames/s.
    audio_stats = {}
    if not smoke:
        try:
            audio_stats = _audio_rung(zrt)
            for k, v in audio_stats.items():
                if isinstance(v, (int, float)):
                    ladder[f"audio_{k}"] = float(v)
        except Exception as e:
            print(f"# audio rung failed: {type(e).__name__}: {e}",
                  file=sys.stderr)

    value = ladder["high"]
    steal = _steal_ticks() - steal0
    print(f"# ladder: { {k: round(v, 1) for k, v in ladder.items()} } "
          f"(headline=high precision, best of fused 3-pass ~5e-06 / "
          f"freq-equiv exact ~2e-06 / equiv kernel ~7e-06 rel err vs "
          f"exact f32) backend={jax.default_backend()}", file=sys.stderr)
    print(f"# medians of {R} repeat(s); rel spreads: {spreads}; "
          f"host steal ticks during run: {steal}", file=sys.stderr)
    # maps/s -> achieved TFLOPS per rung (model: dominant-contraction
    # MACs x2 — see flops_per_map) + MFU vs the v5e bf16 MXU peak
    # (197 TFLOPS).  'high' rungs run 3 bf16 passes per logical matmul
    # and 'highest'/f32 run 6 — the *_mxu_util entries scale the model
    # FLOPs by that pass count so utilization is comparable across tiers.
    passes = {"highest": 6, "high": 3, "bf16": 1, "f32": 6}
    tf = {}
    for k, fl in flops_per_map.items():
        if k not in ladder:
            continue
        tf[k] = round(ladder[k] * fl / 1e12, 2)
        tier = next((p for p in passes if k.startswith(p)), "high")
        tf[f"{k}_mxu_util"] = round(
            ladder[k] * fl * passes[tier] / 197e12, 3)
    print(f"# tflops (model): {tf}", file=sys.stderr)
    sys.stderr.flush()
    # The headline JSON prints LAST (VERDICT r4 #6: the r04 artifact's
    # bounded tail capture truncated a first-line headline) and carries
    # the full ladder + per-rung spreads + steal ticks machine-readably,
    # so BENCH_r05.json is self-contained even if stderr is dropped.
    print(json.dumps({
        "metric": "steered_power_heatmaps_per_sec_64ch_65x65",
        "value": round(value, 1),
        "unit": "heatmaps/s",
        "vs_baseline": round(value / 1000.0, 3),
        "ladder": {k: round(v, 1) for k, v in ladder.items()},
        "spreads": spreads,
        "steal_ticks": steal,
        "audio": audio_stats,
    }), flush=True)


def _fused_cycle_rung(ref_cfg, tables, smoke, timed_batched):
    """Device-proxy rate of the round-4 fused display cycle: the
    FusedSensorStage packed program (apps/fused.py — steered power +
    device-resize YOLO forward + DeviceCompositor) at the demo's
    operating point (240x320 camera, 640x360 window, 224 px detector,
    K=16, 3-array channel slice)."""
    from types import SimpleNamespace

    import jax
    import jax.numpy as jnp

    from zybo_rt_sampler_image_detection_tpu.apps.fused import (
        FusedSensorStage,
    )
    from zybo_rt_sampler_image_detection_tpu.fusion.composite import (
        DeviceCompositor,
    )
    from zybo_rt_sampler_image_detection_tpu.models.detect import (
        YoloDetector,
    )
    from zybo_rt_sampler_image_detection_tpu.models.yolo import YoloConfig
    from zybo_rt_sampler_image_detection_tpu.utils.metrics import (
        PipelineMetrics,
    )

    if smoke:
        K, cam_hw, window, det_size, det_width, channels = \
            2, (48, 64), (64, 48), 64, 0.25, 0
    else:
        K, cam_hw, window, det_size, det_width, channels = \
            16, (240, 320), (640, 360), 224, 0.5, 192
    grid = (ref_cfg.max_res_x, ref_cfg.max_res_y)
    det = YoloDetector(cfg=YoloConfig(input_size=det_size,
                                      width_mult=det_width))
    comp = DeviceCompositor(grid, cam_hw, window=window,
                            yolo_shape=cam_hw, max_tracks=8)
    stage = FusedSensorStage(
        SimpleNamespace(cfg=ref_cfg), tables, comp, det,
        q_cam=None, display=None, metrics=PipelineMetrics(), batch=K,
        channels=channels)
    # non-donated twin of the stage's program: the rung re-feeds the
    # same device-resident packed input every iteration
    fn = jax.jit(stage._run)
    rng = np.random.default_rng(7)
    mic = (rng.standard_normal(
        (K, stage.mc, stage.n_samples)) * 0.05).astype(np.float32)
    cams = rng.integers(0, 256, (K,) + cam_hw + (3,), dtype=np.uint8)
    packed = np.concatenate([
        mic.view(np.uint8).reshape(-1),
        cams.reshape(-1),
        stage._boxes.view(np.uint8).reshape(-1)])
    packed_dev = jax.device_put(packed)
    prev = comp.init_prev()

    def cycle(p):
        out, _ = fn(p, prev, jnp.int32(1), comp.tables,
                    stage._det_tables, det.variables,
                    *stage._power_extra)
        return out.reshape(1, 1, -1)     # timed_batched syncs [0, 0, 0]

    return timed_batched(cycle, packed_dev, K, 1 if smoke else 8,
                         key="fused_display_cycle", repeats=3)


def _audio_rung(zrt, seconds: float = 8.0, batch: int = 64,
                port: int = 21899) -> dict:
    """Measured end-to-end audio latency: native line-rate emulator ->
    ingest ring (publish stamps) -> full-rate BatchedMisoProducer (one
    fused device program per batch) -> MockCallbackSink (deadline
    accounting).  Reference contract: the PortAudio callback chain of
    ``api.c:268-282,491-543``."""
    import time as _time

    from zybo_rt_sampler_image_detection_tpu.apps.pipeline import Pipeline
    from zybo_rt_sampler_image_detection_tpu.ingest.streamer import (
        NativeStreamer,
    )
    from zybo_rt_sampler_image_detection_tpu.utils.audio import (
        MockCallbackSink,
    )

    cfg = zrt.Config().replace(udp_port=port)
    n_arrays = cfg.active_arrays
    n_ch = n_arrays * cfg.rows * cfg.columns
    p = Pipeline(cfg, algorithm="lerp", replay_mode=True, backend="auto",
                 audio_sink="null", ring_frames=max(64, 4 * batch))
    sink = MockCallbackSink(cfg.sample_rate)
    stage = p.make_miso_batched(batch=batch, beam="time", channels=n_ch,
                                sink=sink)
    stage.warmup()                       # compile before packets flow
    t = np.arange(cfg.n_samples * 64) / cfg.sample_rate
    sig = np.tile(np.sin(2 * np.pi * 800.0 * t).astype(np.float32),
                  (cfg.n_microphones, 1)) * 0.1
    emu = NativeStreamer(cfg, n_arrays=n_arrays)
    try:
        emu.start(sig, rate=cfg.sample_rate)
        p.connect(timeout=10.0)
        t0 = _time.time()
        p.run_stage(stage)
        _time.sleep(seconds)
        p.stop()
        elapsed = _time.time() - t0
    finally:
        emu.stop()
    stats = stage.audio_latency()
    stats["fullrate_frames_per_s"] = round(stage.processed / elapsed, 1)
    stats["underrun_frames"] = stage.underrun_frames
    stats["sink_underflow_ms"] = round(sink.underflow_ms, 1)
    return stats


if __name__ == "__main__":
    main(smoke="--smoke" in sys.argv[1:])
