"""Fused Pallas TPU kernel for the EXACT frequency-domain steered power.

The XLA formulation of :mod:`.freq_equiv` materializes the steered
spectra ``Br/Bi`` — two (B, D, F) float32 tensors — in HBM and streams
them three times (Parseval reduction, tail/head inverse-DFT matmul),
~7 GB of round-trips per 512-frame batch at the north-star shape; the
measured split shows the tail/head stage alone costs +8.2 ms of the
16.3 ms total.  This kernel keeps the spectra ON-CHIP:

* grid cell = (frame-chunk, direction-tile); frequency chunks sweep the
  innermost grid axis, each computing its (Fc, Bc, TILE_D) slice of the
  steered spectra via one **batched** ``dot_general`` (batch dim =
  frequency, contraction = the stacked 2M mic axis — the same
  stacked-plane trick as the XLA path) and folding BOTH reductions in
  while the dot outputs are live;
* the Parseval power ``sum_f cf |B_f|^2`` reduces in-register — the
  ``sqrt(cf)`` weights are folded into the response planes at build
  time (and ``1/sqrt(cf)`` into the inverse-DFT basis rows), so the
  reduction is a plain sum of squares;
* the tail/head beam samples accumulate per f-chunk into a tiny
  (Tt, Bc, TILE_D) VMEM scratch — K=Fc slices of the inverse-DFT
  contraction at HIGHEST (f32) precision (the tail subtraction is
  accuracy-critical).  v1 instead persisted the full (F, Bc, TILE_D)
  spectra in VMEM for one K=F contraction at the end; that scratch was
  the VMEM ceiling — dropping it lets the planner run TILE_D=256 x
  Bc=512 tiles, halving the re-fetch traffic of S (per direction tile)
  and H (per frame chunk), the pass's measured bound;
* boundary corrections ``||beam - v||^2`` finish in-register against a
  (Bc, Tc, TILE_D) block of the head-correction values ``v`` (built by
  one flat matmul outside, in its natural layout — no transposes
  anywhere in the pipeline).

Accuracy rungs mirror the time-domain fused kernel
(`pallas_kernels.FusedBeamformer`): ``high`` = 3-pass bf16 hi/lo planes
(~1e-5 class), ``bf16`` single pass (~4e-3), plus an ``f32`` mode
(6-pass HIGHEST, ~1e-6) the time-domain kernel serves as "highest".
Reference semantics are inherited from :mod:`.freq_equiv` (which cites
``pad_and_sum.c:114-142`` etc.); parity is gated against
``freq_equiv.equiv_steered_power`` for every algorithm in
``tests/test_equiv_kernel.py``.

Measured (one v5e, B=512/256, BENCHMARKS.md round 3; the incremental-TH
rewrite + tuned single-chunk plans are the late-round-3 numbers):

* northstar (64 ch): ``high`` 52.6k maps/s err ~1e-5 (v1 kernel 44-46k;
  XLA equiv path 31.1k at 2e-6; round-2 fused time-domain kernel
  19.1k); ``bf16`` 103.8k err 3.4e-3 (v1 79-90k; time-domain fused
  45-47k); ``f32`` 42.7k at ~1e-6 (v1 36.0k).
* reference shape (256 ch): ``high`` 25.5k err ~8e-6 (v1 23.5k; XLA
  equiv 22.6k at 2e-6 — the rung flipped to the kernel once the DFT
  prep dropped from HIGHEST to HIGH, which the 3-pass main dot cannot
  out-resolve); ``bf16`` 47.6k (v1 32.9k).

The kernel is the production default at both rungs for every in-bar
shape (``pipeline._equiv_kernel_if_favored``).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .freq_equiv import EquivFreqTables, make_equiv_tables
from .pallas_kernels import _round_up, _split_bf16


def _equiv_power_kernel(s_ref, h1_ref, h2_ref, ib1_ref, ib2_ref, sj_ref,
                        wc_ref, out_ref, th_ref, pow_ref, *, n_fc,
                        fc_len, n_tail, Tc, inv, th_precision,
                        main_precision, three_pass):
    """One (frame-chunk, direction-tile, frequency-chunk) grid cell.

    s_ref:   (Fc, Bc, KS)         spectra, f-major, mics stacked; in
                                  3-pass mode KS = 2*MP2 columns
                                  [s_hi | s_lo] (bf16 planes)
    h1_ref:  (Fc, KH, TILE_D)     sqrt(cf)-scaled [H_re | -H_im]; in
                                  3-pass mode KH = 2*MP2 rows [hi; lo]
    h2_ref:  (Fc, KH, TILE_D)     sqrt(cf)-scaled [H_im |  H_re]
    ib1/ib2: (FP, TtP)            1/sqrt(cf)-scaled inverse-DFT bases
                                  (re for Br, im for Bi; FP = n_fc * Fc)
    sj_ref:  (Bc, JMP)            correction-sample columns per frame
    wc_ref:  (JMP, TcP, TILE_D)   head-correction weights for this tile —
                                  v is computed ON-CHIP (the XLA-side
                                  (B, Tc*D) matmul was output-bound at
                                  K=64 and cost 3.7 ms + a 156 MB HBM
                                  round-trip at the north-star shape)
    out_ref: (Bc, TILE_D)         power tile
    th_ref:  (TtP, Bc, TILE_D)    tail/head beam-sample accumulator —
                                  each f-chunk folds its K=Fc slice of
                                  the inverse-DFT contraction in from
                                  the still-live dot outputs.  (Round-3
                                  v1 kept the full (F, Bc, TILE_D)
                                  steered spectra in VMEM and ran one
                                  K=F contraction at the end — that
                                  scratch was the VMEM ceiling capping
                                  the tile plan; accumulating TH per
                                  chunk frees it, letting the planner
                                  double TILE_D/Bc, which halves the
                                  per-batch re-fetch traffic of S (per
                                  direction tile) and H (per frame
                                  chunk).)
    pow_ref: (Bc, TILE_D)         Parseval accumulator scratch — each
                                  f-chunk folds its sum of squares in
                                  from the still-live dot outputs (an
                                  epilogue sweep over a full-F scratch
                                  spilled ~68 MB of registers).

    """
    fc_i = pl.program_id(2)

    def bdot(a, b):
        # batch dim = frequency, contract the stacked-mic axis
        return jax.lax.dot_general(
            a, b, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=main_precision)

    has_th = (n_tail + Tc) > 0
    ib_rows = pl.ds(fc_i * fc_len, fc_len)

    def thdot(ib_ref, b):
        # tail/head beam samples: the K=F inverse-DFT contraction,
        # folded in per f-chunk (K=Fc slices) while br/bi are live —
        # f32 operands at HIGHEST (the tail subtraction is
        # accuracy-critical; bf16 truncation here costs ~3e-4 rel)
        return jax.lax.dot_general(
            ib_ref[ib_rows], b, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=th_precision)

    # br and bi are computed and consumed SEQUENTIALLY so their
    # (Fc, Bc, TILE_D) values never coexist — that liveness halves the
    # peak intermediate footprint, which is what lets the (Bc=256,
    # n_fc=1) plan fit the Mosaic allocator at the north-star shape.
    if three_pass:
        # [hi | lo] stacks on BOTH operands, three sliced dots:
        # Shi@Hhi + Shi@Hlo + Slo@Hhi.  (A K-stacked [s_hi|s_hi|s_lo]
        # variant measured identical MXU throughput while costing 1.5x
        # the S bytes — and S is re-fetched per direction tile.)
        M2 = h1_ref.shape[1] // 2
        s_hi = s_ref[:, :, :M2]
        s_lo = s_ref[:, :, M2:]
        h1hi, h1lo = h1_ref[:, :M2], h1_ref[:, M2:]
        h2hi, h2lo = h2_ref[:, :M2], h2_ref[:, M2:]
        br = bdot(s_hi, h1hi) + bdot(s_hi, h1lo) + bdot(s_lo, h1hi)
    else:
        br = bdot(s_ref[:], h1_ref[:])
    # Parseval: sqrt(cf) lives in the planes, so this is a plain sum of
    # squares — folded in per chunk while the dot outputs are live
    partial = jnp.sum(br * br, axis=0)                     # (Bc, TILE_D)
    th_part = thdot(ib1_ref, br) if has_th else None
    if three_pass:
        bi = bdot(s_hi, h2hi) + bdot(s_hi, h2lo) + bdot(s_lo, h2hi)
    else:
        bi = bdot(s_ref[:], h2_ref[:])
    partial = partial + jnp.sum(bi * bi, axis=0)
    if has_th:
        th_part = th_part + thdot(ib2_ref, bi)             # (TtP, Bc, TILE_D)

    @pl.when(fc_i == 0)
    def _init():
        pow_ref[:, :] = partial
        if has_th:
            th_ref[:, :, :] = th_part

    @pl.when(fc_i > 0)
    def _accum():
        pow_ref[:, :] = pow_ref[:, :] + partial
        if has_th:
            th_ref[:, :, :] = th_ref[:, :, :] + th_part

    @pl.when(fc_i == n_fc - 1)
    def _finish():
        power = pow_ref[:, :]
        TH = th_ref[:, :, :] if has_th else None           # (TtP, Bc, TILE_D)
        for p in range(n_tail):
            t = TH[p]
            power = power - t * t
        if Tc:
            # ||beam - v||^2 over the head columns; v for this tile is
            # one small on-chip dot with 3D free dims -> (Bc, TcP,
            # TILE_D), sliced per head column — no HBM round-trip
            vt = jax.lax.dot_general(
                sj_ref[:], wc_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=th_precision)
            for c in range(Tc):
                v = vt[:, c, :]
                power = power + (v * v - 2.0 * TH[n_tail + c] * v)
        out_ref[:, :] = power * inv


def _equiv_power_kernel_fd(pow_in_ref, th_in_ref, s_ref, h1_ref, h2_ref,
                           ib1_ref, ib2_ref, sj_ref, wc_ref, out_ref,
                           th_ref, *, n_fc, fc_len, n_tail, Tc, inv,
                           th_precision, main_precision, three_pass,
                           acc_from_out=False):
    """Direction-INNERMOST variant (round 5, the recorded S-prefetch
    experiment): grid = (frame-chunk, frequency-chunk, direction-tile).

    With f innermost (`_equiv_power_kernel`), every direction tile
    re-streams the whole S slice of its frame chunk from HBM —
    n_d_tiles x S bytes per batch, the named bound since round 3.  With
    d innermost, S's block index is CONSTANT across the direction sweep
    (Pallas only re-fetches on index change), so S streams exactly
    n_fc x once per frame chunk — the minimum.  The price: the Parseval
    and tail/head accumulators can no longer live in per-cell VMEM
    scratch (the same (b, d) cell is revisited once per f-chunk with
    other d tiles in between) — they round-trip through HBM as
    input/output-ALIASED windows: Pallas does NOT reload an output
    window on a non-consecutive revisit (measured: garbage power on
    TPU, exact in interpret mode), but an aliased INPUT window
    re-fetches the previous visit's write-back, n_d steps stale —
    far beyond the pipeline depth.  Only meaningful when n_fc > 1
    (single-chunk plans already fetch S once).

    **Measured NEGATIVE** (2026-08-20, one v5e, reference shape,
    B=256, exact vs df): bf16 (128,2) 33.6k vs df 40.2k maps/s; high
    (64,3) 16.0k vs df 23.5k ((128,3) fd exceeds VMEM — the TH output
    window + spills add ~41 MB).  The accumulator HBM round-trips
    (TtP x Bc x TILE_D out+in per revisit) cost more than the saved S
    re-fetches.  Kept gated (bit-exact vs df in CI) as the recorded
    S-prefetch experiment; production stays on the default sweep.
    """
    fc_i = pl.program_id(1)

    def bdot(a, b):
        return jax.lax.dot_general(
            a, b, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=main_precision)

    has_th = (n_tail + Tc) > 0
    ib_rows = pl.ds(fc_i * fc_len, fc_len)

    def thdot(ib_ref, b):
        return jax.lax.dot_general(
            ib_ref[ib_rows], b, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=th_precision)

    if three_pass:
        M2 = h1_ref.shape[1] // 2
        s_hi = s_ref[:, :, :M2]
        s_lo = s_ref[:, :, M2:]
        h1hi, h1lo = h1_ref[:, :M2], h1_ref[:, M2:]
        h2hi, h2lo = h2_ref[:, :M2], h2_ref[:, M2:]
        br = bdot(s_hi, h1hi) + bdot(s_hi, h1lo) + bdot(s_lo, h1hi)
    else:
        br = bdot(s_ref[:], h1_ref[:])
    partial = jnp.sum(br * br, axis=0)                     # (Bc, TILE_D)
    th_part = thdot(ib1_ref, br) if has_th else None
    if three_pass:
        bi = bdot(s_hi, h2hi) + bdot(s_hi, h2lo) + bdot(s_lo, h2hi)
    else:
        bi = bdot(s_ref[:], h2_ref[:])
    partial = partial + jnp.sum(bi * bi, axis=0)
    if has_th:
        th_part = th_part + thdot(ib2_ref, bi)

    @pl.when(fc_i == 0)
    def _init():
        out_ref[:, :] = partial
        if has_th:
            th_ref[:, :, :] = th_part
        else:           # declared output: write once so it's defined
            th_ref[:, :, :] = jnp.zeros(th_ref.shape, th_ref.dtype)

    @pl.when(fc_i > 0)
    def _accum():
        # accumulate against the ALIASED INPUT windows (the previous
        # visit's write-back) — on TPU out_ref/th_ref hold garbage on a
        # non-consecutive revisit.  Interpret mode is the inverse: it
        # does not alias buffers (pow_in stays zeros) but its out_ref
        # reads are exact — acc_from_out switches the source at trace
        # time so both backends run the correct variant.
        pw = out_ref if acc_from_out else pow_in_ref
        th = th_ref if acc_from_out else th_in_ref
        out_ref[:, :] = pw[:, :] + partial
        if has_th:
            th_ref[:, :, :] = th[:, :, :] + th_part

    @pl.when(fc_i == n_fc - 1)
    def _finish():
        power = out_ref[:, :]
        TH = th_ref[:, :, :] if has_th else None
        for p in range(n_tail):
            t = TH[p]
            power = power - t * t
        if Tc:
            vt = jax.lax.dot_general(
                sj_ref[:], wc_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=th_precision)
            for c in range(Tc):
                v = vt[:, c, :]
                power = power + (v * v - 2.0 * TH[n_tail + c] * v)
        out_ref[:, :] = power * inv


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EquivKernelTables:
    """Device-resident f-major planes for the fused equiv kernel.

    All arrays enter the jitted forward as ARGUMENTS (the reference-shape
    planes are ~860 MB — closure constants are the known
    minutes-long-compile failure mode, see CLAUDE.md)."""

    H1: jax.Array               # (FP, KH, DP) sqrt(cf)*[H_re | -H_im];
                                #   KH = 2*MP2 [hi; lo] rows in 3-pass
    H2: jax.Array               # (FP, KH, DP) sqrt(cf)*[H_im |  H_re]
    ib1: jax.Array              # (FP, TtP) inverse-DFT basis / sqrt(cf)
    ib2: jax.Array              # (FP, TtP)
    dft_cat: jax.Array          # (N, 2F) [re | im] rfft basis — one
                                #   merged DFT dot (two F-row dots were
                                #   row-tile-starved: 3.6 vs 2.3 ms)
    Wc3: Optional[jax.Array]    # (JMP, TcP, DP) head-correction weights
                                #   in kernel-tile layout (v on-chip)
    adaptive: Optional[jax.Array]
    corr_js: tuple = dataclasses.field(metadata=dict(static=True))
    n_tail: int = dataclasses.field(metadata=dict(static=True))
    Tc: int = dataclasses.field(metadata=dict(static=True))
    F: int = dataclasses.field(metadata=dict(static=True))
    M: int = dataclasses.field(metadata=dict(static=True))
    D: int = dataclasses.field(metadata=dict(static=True))
    n_samples: int = dataclasses.field(metadata=dict(static=True))
    res_x: int = dataclasses.field(metadata=dict(static=True))
    res_y: int = dataclasses.field(metadata=dict(static=True))
    mode: str = dataclasses.field(metadata=dict(static=True))


# (Bc, n_fc) winners of the plan sweep, measured 2026-08-18 on one v5e
# (BENCHMARKS.md "Fused equiv kernel"), keyed by (mode, padded stacked-mic
# width MP2): north-star 64ch -> MP2=128, reference 256ch -> MP2=512.
# Fewer f-chunks beat lower traffic (each extra chunk splits the
# accuracy-critical tail/head contraction into small-K HIGHEST dots), and
# the best Bc is mode-dependent (measured, not modeled) — the auto-search
# below stays the fallback for unseen shapes.
_TUNED_PLANS = {
    ("high", 128): (64, 1),      # 52.6k maps/s (search pick: 47.2k)
    ("f32", 128): (64, 1),       # 42.7k
    ("bf16", 128): (128, 1),     # 103.8k (89.9k round-3 v1)
    ("high", 512): (128, 3),     # 25.5k (23.5k round-3 v1)
    ("bf16", 512): (128, 2),     # 47.6k (32.9k round-3 v1)
}


class FusedEquivBeamformer:
    """Fused-kernel twin of ``freq_equiv.equiv_steered_power``.

    Usage::

        fused = FusedEquivBeamformer(tables)      # SteeringTables
        power = fused(frames)                     # (B, X, Y) or (X, Y)

    ``mode`` (default from the tables' precision):
      * ``"high"``  — 3-pass bf16 hi/lo planes for the main contraction
        (~1e-5 rel err class vs the exact path), tail/head at HIGHEST;
      * ``"bf16"``  — single-pass bf16 everywhere (~4e-3);
      * ``"f32"``   — f32 planes at HIGHEST (6-pass, ~1e-6) — the most
        accurate device path of the whole framework, but ~2x the MXU
        work of ``high``.
    """

    def __init__(self, t, mode: Optional[str] = None,
                 tile_d: int = 128, interpret: Optional[bool] = None,
                 vmem_budget: int = 88 * 1024 * 1024,
                 plan_override: Optional[tuple] = None,
                 use_tuned: bool = True, sweep: str = "df"):
        # sweep="fd": direction-INNERMOST grid — S streams once per
        # (frame, f)-chunk instead of once per direction tile, with the
        # Parseval/tail-head accumulators moved to revisited HBM outputs
        # (see _equiv_power_kernel_fd).  Only differs when the plan has
        # n_fc > 1; measured win-or-negative in BENCHMARKS.md round 5.
        if sweep not in ("df", "fd"):
            raise ValueError(f"sweep must be 'df' or 'fd', got {sweep!r}")
        self.sweep = sweep
        et = t if isinstance(t, EquivFreqTables) else make_equiv_tables(t)
        if mode is None:
            mode = {"high": "high", "highest": "f32"}.get(
                et.precision, "bf16")
        if mode not in ("high", "bf16", "f32"):
            # fail loudly: an unknown string (e.g. the SteeringTables
            # vocabulary's "highest") would otherwise silently fall
            # through to the single-pass bf16 path (~4e-3) under a name
            # promising the most accurate rung
            raise ValueError(
                f"equiv kernel mode must be high/bf16/f32, got {mode!r}")
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        self.mode = mode
        self.interpret = interpret
        self.three_pass = mode == "high"
        plane_dtype = jnp.float32 if mode == "f32" else jnp.bfloat16

        D, M2, F = et.Hs1.shape
        M = M2 // 2
        N = et.n_samples
        Tt = et.ib_re.shape[1]
        Tc = 0 if et.Wc is None else et.Wc.shape[2]
        self.D, self.M, self.N, self.F = D, M, N, F

        # --- geometry: pad everything to kernel-friendly multiples -----
        self.tile_d = tile_d
        DP = _round_up(D, tile_d)
        MP2 = _round_up(M2, 8 if interpret else 128)
        TtP = _round_up(max(Tt, 1), 8)
        TcP = _round_up(max(Tc, 1), 8)
        n_tail = et.n_tail

        # frequency chunking: largest Fc whose working set fits VMEM
        # (the tail/head contraction folds in per chunk, so only a
        # (TtP, Bc, TILE_D) accumulator persists — v1 kept the full
        # (F, Bc, TILE_D) spectra here and that scratch WAS the ceiling)
        isz = np.dtype(plane_dtype).itemsize

        KH = 2 * MP2 if self.three_pass else MP2     # H rows [hi; lo]
        KS = 2 * MP2 if self.three_pass else MP2     # s cols [hi | lo]

        def vmem_est(FPp, fc, bc):
            return (TtP * bc * tile_d * 4                # TH accumulator
                    + 2 * fc * bc * KS * isz             # s chunk (dbl)
                    + 2 * 2 * fc * KH * tile_d * isz     # H1/H2 (dbl)
                    + 2 * fc * bc * tile_d * 4           # per-chunk dot
                    + TtP * bc * tile_d * 4              # th_part value
                    + bc * TcP * tile_d * 4              # vt value
                    + 2 * bc * tile_d * 4                # out
                    + 2 * FPp * TtP * 4)                 # bases

        self.chunk_b = None
        plan = None
        if plan_override is None and use_tuned:
            plan_override = _TUNED_PLANS.get((mode, MP2))
            if plan_override is not None:
                # tuned plans were measured to compile, but re-check the
                # estimate against the Mosaic ceiling for off-profile
                # (D, F) combos and fall back to the search if exceeded
                bc, n_fc = plan_override
                fc = -(-F // n_fc)
                if vmem_est(fc * n_fc, fc, bc) > 120 * 1024 * 1024:
                    plan_override = None
        if plan_override is not None:
            bc, n_fc = plan_override
            fc = -(-F // n_fc)
            plan = (bc, n_fc, fc, fc * n_fc)
        # fallback search: FEWEST f-chunks first (chunking splits the
        # tail/head contraction into small-K HIGHEST dots — measured
        # slower at every shape), then the largest frame chunk that fits
        for n_fc in (1, 2, 3, 4, 6, 8, 12, 16, 24):
            if plan:
                break
            for bc in (512, 256, 128, 64, 32, 16, 8):
                fc = -(-F // n_fc)
                fc = _round_up(fc, 1)
                FPp = fc * n_fc
                if vmem_est(FPp, fc, bc) < vmem_budget:
                    plan = (bc, n_fc, fc, FPp)
                    break
        if plan is None:
            raise ValueError(
                f"equiv kernel: no VMEM plan for D={D} M={M} F={F}")
        self.chunk_b, self.n_fc, self.fc_len, FP = plan
        self.FP, self.MP2, self.DP, self.TtP, self.TcP = \
            FP, MP2, DP, TtP, TcP
        self.KH, self.KS = KH, KS
        self.n_tail, self.Tc = n_tail, Tc
        self.vmem_bytes = vmem_est(FP, self.fc_len, self.chunk_b)

        # --- build the device tables (f-major, scaled, padded, split) --
        cf = np.asarray(et.cf, np.float64)
        scf = np.sqrt(cf).astype(np.float32)             # (F,)
        inv_scf = (1.0 / np.sqrt(cf)).astype(np.float32)

        def planes(Hs):
            # (D, 2M, F) -> sqrt(cf)-scaled (F, 2M, D), padded; in 3-pass
            # mode the hi/lo planes stack along the CONTRACTION dim
            # ([hi; lo] rows) so the kernel runs wide K=2*MP2 dots
            h = (Hs * jnp.asarray(scf)[None, None, :]).transpose(2, 1, 0)
            h = jnp.pad(h, ((0, FP - F), (0, MP2 - M2), (0, DP - D)))
            if self.three_pass:
                hi, lo = _split_bf16(h)
                return jnp.concatenate([hi, lo], axis=1)  # (FP, 2*MP2, DP)
            return h.astype(plane_dtype)

        H1 = planes(et.Hs1)
        H2 = planes(et.Hs2)

        def basis(ib):
            b = np.asarray(ib) * inv_scf[:, None]        # (F, Tt)
            return jnp.asarray(np.pad(
                b, ((0, FP - F), (0, TtP - Tt))).astype(np.float32))

        ib1 = basis(et.ib_re)
        ib2 = basis(et.ib_im)

        if et.Wc is not None:
            J = et.Wc.shape[0]
            self.JMP = _round_up(J * M, 8)
            # (J, D, Tc, M) -> (JMP, TcP, DP): the kernel computes v
            # on-chip as one (Bc, JMP) x (JMP, TcP, TILE_D) dot per tile
            w3 = jnp.asarray(et.Wc, jnp.float32).transpose(
                0, 3, 2, 1).reshape(J * M, Tc, D)
            Wc3 = jnp.pad(w3, ((0, self.JMP - J * M),
                               (0, TcP - Tc), (0, DP - D)))
        else:
            self.JMP = 8
            Wc3 = None

        adp = np.asarray(et.adaptive)
        adaptive = None if np.array_equal(adp, np.arange(M)) \
            else jnp.asarray(adp)
        self.kt = EquivKernelTables(
            H1=H1, H2=H2, ib1=ib1, ib2=ib2,
            dft_cat=jnp.concatenate([et.dft_re, et.dft_im], axis=1),
            Wc3=Wc3,
            adaptive=adaptive, corr_js=et.corr_js, n_tail=n_tail, Tc=Tc,
            F=F, M=M, D=D, n_samples=N, res_x=et.res_x, res_y=et.res_y,
            mode=mode)
        self._fwd = jax.jit(functools.partial(
            _equiv_fused_forward, meta=self))

    def _call(self, signals: jax.Array) -> jax.Array:
        return self._fwd(signals, self.kt)

    def __call__(self, signals: jax.Array) -> jax.Array:
        squeeze = signals.ndim == 2
        if squeeze:
            signals = signals[None]
        power = self._call(signals)
        return power[0] if squeeze else power


def _equiv_fused_forward(signals, kt: EquivKernelTables, *, meta):
    """Jitted forward: DFT -> plane split -> fused kernel -> (B, X, Y)."""
    power = _equiv_forward_flat(signals, kt, meta)
    return power[:signals.shape[0], :kt.D].reshape(
        signals.shape[0], kt.res_x, kt.res_y)


def _equiv_forward_flat(signals, kt: EquivKernelTables, meta):
    """Un-reshaped fused-kernel forward, (BP, DP) with padding intact —
    the shard-map path (``parallel.mesh.sharded_equiv_kernel_power``)
    runs this per shard with a local-DP meta and slices globally."""
    m = meta
    B, _, N = signals.shape
    M, F, FP, MP2 = kt.M, kt.F, m.FP, m.MP2
    Bc = min(m.chunk_b, _round_up(B, 8))
    BP = _round_up(B, Bc)
    three_pass = m.three_pass
    # DFT precision per rung: 'f32' keeps HIGHEST (the ~1e-6 exactness
    # tier); 'high' runs HIGH — its 3-pass spectra error (~1e-5 on the
    # power map) sits inside the mode's own 3-pass main-dot class, and
    # HIGHEST cost ~2x there for accuracy the rung can't surface
    dft_prec = {"bf16": jax.lax.Precision.DEFAULT,
                "high": jax.lax.Precision.HIGH}.get(
        m.mode, jax.lax.Precision.HIGHEST)

    sf = signals if kt.adaptive is None else signals[:, kt.adaptive, :]
    if kt.adaptive is None and sf.shape[1] != M:
        sf = sf[:, :M, :]
    sf = sf.astype(jnp.float32)
    s2 = sf.reshape(B * M, N)
    # f-major spectra from ONE merged transposed contraction:
    # (N, 2F)^T-contract (B*M, N) -> (2F, B*M); no (B, 2M, F) transpose
    both = jax.lax.dot_general(
        kt.dft_cat, s2, (((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=dft_prec)
    srT = both[:F].reshape(F, B, M)
    siT = both[F:].reshape(F, B, M)
    S3 = jnp.concatenate([srT, siT], axis=2)             # (F, B, 2M)
    S3 = jnp.pad(S3, ((0, FP - F), (0, BP - B), (0, MP2 - 2 * M)))
    if three_pass:
        # hi/lo planes stacked along the stacked-mic axis; the kernel
        # slices them back for the three-pass dots
        hi, lo = _split_bf16(S3)
        S = jnp.concatenate([hi, lo], axis=2)            # (FP, BP, 2*MP2)
    else:
        S = S3.astype(kt.H1.dtype)

    # head-correction inputs: the sample columns (B, J*M) plus the
    # weight tiles; v itself is computed on-chip per direction tile
    if kt.Wc3 is not None:
        sj = jnp.stack([sf[:, :, j] for j in kt.corr_js], axis=1)
        sj = sj.reshape(B, -1)
        sj = jnp.pad(sj, ((0, BP - B), (0, m.JMP - sj.shape[1])))
        wc = kt.Wc3
        sj_spec = pl.BlockSpec((Bc, m.JMP), lambda b, d, f: (b, 0),
                               memory_space=pltpu.VMEM)
        wc_spec = pl.BlockSpec((m.JMP, m.TcP, m.tile_d),
                               lambda b, d, f: (0, 0, d),
                               memory_space=pltpu.VMEM)
    else:
        # no boundary corrections: shared dummy blocks (the kernel's
        # Tc==0 branch never reads them)
        sj = jnp.zeros((Bc, m.JMP), jnp.float32)
        wc = jnp.zeros((m.JMP, m.TcP, m.tile_d), jnp.float32)
        sj_spec = pl.BlockSpec((Bc, m.JMP), lambda b, d, f: (0, 0),
                               memory_space=pltpu.VMEM)
        wc_spec = pl.BlockSpec((m.JMP, m.TcP, m.tile_d),
                               lambda b, d, f: (0, 0, 0),
                               memory_space=pltpu.VMEM)

    fc = m.fc_len
    kern_kw = dict(
        n_fc=m.n_fc, fc_len=fc, n_tail=m.n_tail,
        Tc=kt.Tc, inv=np.float32(1.0 / (N * kt.M * kt.M)),
        th_precision=(jax.lax.Precision.DEFAULT if m.mode == "bf16"
                      else jax.lax.Precision.HIGHEST),
        main_precision=(jax.lax.Precision.HIGHEST if m.mode == "f32"
                        else jax.lax.Precision.DEFAULT),
        three_pass=three_pass)
    cost = pl.CostEstimate(
        flops=2 * BP * m.DP * m.KS * FP
        + 12 * m.TtP * BP * m.DP * FP,
        bytes_accessed=(kt.H1.size + kt.H2.size) * kt.H1.dtype.itemsize
        + S.size * S.dtype.itemsize + 4 * BP * m.DP,
        transcendentals=0,
    )
    params = pltpu.CompilerParams(
        vmem_limit_bytes=127 * 1024 * 1024,
        dimension_semantics=("parallel", "arbitrary", "arbitrary"))
    if getattr(m, "sweep", "df") == "fd" and m.n_fc > 1:
        # direction-innermost sweep: S's block index is constant across
        # the d axis, so Pallas fetches each S chunk ONCE per (b, f)
        # instead of once per direction tile; the accumulators become
        # revisited HBM outputs (see _equiv_power_kernel_fd)
        if kt.Wc3 is not None:
            sj_spec = pl.BlockSpec((Bc, m.JMP), lambda b, f, d: (b, 0),
                                   memory_space=pltpu.VMEM)
            wc_spec = pl.BlockSpec((m.JMP, m.TcP, m.tile_d),
                                   lambda b, f, d: (0, 0, d),
                                   memory_space=pltpu.VMEM)
        else:
            sj_spec = pl.BlockSpec((Bc, m.JMP), lambda b, f, d: (0, 0),
                                   memory_space=pltpu.VMEM)
            wc_spec = pl.BlockSpec((m.JMP, m.TcP, m.tile_d),
                                   lambda b, f, d: (0, 0, 0),
                                   memory_space=pltpu.VMEM)
        pow0 = jnp.zeros((BP, m.DP), jnp.float32)
        th0 = jnp.zeros((m.TtP, BP, m.DP), jnp.float32)
        power, _th = pl.pallas_call(
            functools.partial(_equiv_power_kernel_fd,
                              acc_from_out=m.interpret, **kern_kw),
            grid=(BP // Bc, m.n_fc, m.DP // m.tile_d),
            in_specs=[
                pl.BlockSpec((Bc, m.tile_d), lambda b, f, d: (b, d),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((m.TtP, Bc, m.tile_d),
                             lambda b, f, d: (0, b, d),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((fc, Bc, m.KS), lambda b, f, d: (f, b, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((fc, m.KH, m.tile_d),
                             lambda b, f, d: (f, 0, d),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((fc, m.KH, m.tile_d),
                             lambda b, f, d: (f, 0, d),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((FP, m.TtP), lambda b, f, d: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((FP, m.TtP), lambda b, f, d: (0, 0),
                             memory_space=pltpu.VMEM),
                sj_spec,
                wc_spec,
            ],
            out_specs=[
                pl.BlockSpec((Bc, m.tile_d), lambda b, f, d: (b, d),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((m.TtP, Bc, m.tile_d),
                             lambda b, f, d: (0, b, d),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((BP, m.DP), jnp.float32),
                jax.ShapeDtypeStruct((m.TtP, BP, m.DP), jnp.float32),
            ],
            input_output_aliases={0: 0, 1: 1},
            interpret=m.interpret,
            compiler_params=params,
            cost_estimate=cost,
        )(pow0, th0, S, kt.H1, kt.H2, kt.ib1, kt.ib2, sj, wc)
        return power
    power = pl.pallas_call(
        functools.partial(_equiv_power_kernel, **kern_kw),
        grid=(BP // Bc, m.DP // m.tile_d, m.n_fc),
        in_specs=[
            pl.BlockSpec((fc, Bc, m.KS), lambda b, d, f: (f, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((fc, m.KH, m.tile_d),
                         lambda b, d, f: (f, 0, d),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((fc, m.KH, m.tile_d),
                         lambda b, d, f: (f, 0, d),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((FP, m.TtP), lambda b, d, f: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((FP, m.TtP), lambda b, d, f: (0, 0),
                         memory_space=pltpu.VMEM),
            sj_spec,
            wc_spec,
        ],
        out_specs=pl.BlockSpec((Bc, m.tile_d), lambda b, d, f: (b, d),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BP, m.DP), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((m.TtP, Bc, m.tile_d), jnp.float32),
            pltpu.VMEM((Bc, m.tile_d), jnp.float32),
        ],
        interpret=m.interpret,
        compiler_params=params,
        cost_estimate=cost,
    )(S, kt.H1, kt.H2, kt.ib1, kt.ib2, sj, wc)
    return power
