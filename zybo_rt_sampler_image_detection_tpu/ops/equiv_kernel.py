"""Fused Pallas TPU kernel for the EXACT frequency-domain steered power.

The XLA formulation of :mod:`.freq_equiv` materializes the steered
spectra ``Br/Bi`` — two (B, D, F) float32 tensors — in HBM and streams
them three times (Parseval reduction, tail/head inverse-DFT matmul),
~7 GB of round-trips per 512-frame batch at the north-star shape; the
measured split shows the tail/head stage alone costs +8.2 ms of the
16.3 ms total.  This kernel keeps the spectra ON-CHIP:

* grid cell = (frame-chunk, direction-tile); frequency chunks sweep the
  innermost grid axis, each writing its slice of a persistent
  (F, Bc, TILE_D) VMEM scratch via one **batched** ``dot_general``
  (batch dim = frequency, contraction = the stacked 2M mic axis — the
  same stacked-plane trick as the XLA path);
* the Parseval power ``sum_f cf |B_f|^2`` reduces in-register — the
  ``sqrt(cf)`` weights are folded into the response planes at build
  time (and ``1/sqrt(cf)`` into the inverse-DFT basis rows), so the
  reduction is a plain sum of squares;
* the tail/head beam samples come from ONE K=F MXU contraction of the
  scratch against the (F, Tt) inverse-DFT basis — 3D free dims, run at
  HIGHEST (f32) precision since the tail subtraction is
  accuracy-critical;
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


def _equiv_power_kernel(s_ref, h1_ref, h2_ref, ib1_ref, ib2_ref, v_ref,
                        out_ref, br_ref, bi_ref, pow_ref, *, n_fc, fc_len,
                        n_tail, Tc, inv, th_precision, main_precision,
                        three_pass):
    """One (frame-chunk, direction-tile, frequency-chunk) grid cell.

    s_ref:   (P, Fc, Bc, MP2)     spectra planes, f-major, mics stacked
    h1_ref:  (P, Fc, MP2, TILE_D) sqrt(cf)-scaled [H_re | -H_im] planes
    h2_ref:  (P, Fc, MP2, TILE_D) sqrt(cf)-scaled [H_im |  H_re] planes
    ib1/ib2: (FP, TtP)            1/sqrt(cf)-scaled inverse-DFT bases
                                  (re for Br, im for Bi; FP = n_fc * Fc)
    v_ref:   (Bc, TcP, TILE_D)    head-correction values (natural layout)
    out_ref: (Bc, TILE_D)         power tile
    br/bi:   (FP, Bc, TILE_D)     persistent VMEM scratch — the steered
                                  spectra for this cell; each f-chunk
                                  writes its slice, the last chunk
                                  reduces.  Never exists in HBM.
    pow_ref: (Bc, TILE_D)         Parseval accumulator scratch — each
                                  f-chunk folds its sum of squares in
                                  from the still-live dot outputs (an
                                  epilogue sweep over the full scratch
                                  spilled ~68 MB of registers).
    """
    fc_i = pl.program_id(2)

    def bdot(a, b):
        # batch dim = frequency, contract the stacked-mic axis
        return jax.lax.dot_general(
            a, b, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=main_precision)

    if three_pass:
        # x = hi + lo  =>  S@H ~ Shi@Hhi + Shi@Hlo + Slo@Hhi
        br = bdot(s_ref[0], h1_ref[0]) + bdot(s_ref[0], h1_ref[1]) \
            + bdot(s_ref[1], h1_ref[0])
        bi = bdot(s_ref[0], h2_ref[0]) + bdot(s_ref[0], h2_ref[1]) \
            + bdot(s_ref[1], h2_ref[0])
    else:
        br = bdot(s_ref[0], h1_ref[0])
        bi = bdot(s_ref[0], h2_ref[0])
    br_ref[pl.ds(fc_i * fc_len, fc_len)] = br
    bi_ref[pl.ds(fc_i * fc_len, fc_len)] = bi
    # Parseval: sqrt(cf) lives in the planes, so this is a plain sum of
    # squares — folded in per chunk while the dot outputs are live
    partial = jnp.sum(br * br + bi * bi, axis=0)           # (Bc, TILE_D)

    @pl.when(fc_i == 0)
    def _init():
        pow_ref[:, :] = partial

    @pl.when(fc_i > 0)
    def _accum():
        pow_ref[:, :] = pow_ref[:, :] + partial

    @pl.when(fc_i == n_fc - 1)
    def _finish():
        # tail/head beam samples: one K=F contraction per basis —
        # f32 operands at HIGHEST (the tail subtraction is
        # accuracy-critical; bf16 truncation here costs ~3e-4 rel)
        TH = (jax.lax.dot_general(
                  ib1_ref[:], br_ref[:], (((0,), (0,)), ((), ())),
                  preferred_element_type=jnp.float32,
                  precision=th_precision)
              + jax.lax.dot_general(
                  ib2_ref[:], bi_ref[:], (((0,), (0,)), ((), ())),
                  preferred_element_type=jnp.float32,
                  precision=th_precision))                 # (TtP, Bc, TILE_D)
        power = pow_ref[:, :]
        for p in range(n_tail):
            t = TH[p]
            power = power - t * t
        if Tc:
            # ||beam - v||^2 over the head columns: v is (Bc, TcP, TILE_D)
            # in its natural build layout; index per column — no 3D
            # transpose needed
            for c in range(Tc):
                v = v_ref[:, c, :]
                power = power + (v * v - 2.0 * TH[n_tail + c] * v)
        out_ref[:, :] = power * inv


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EquivKernelTables:
    """Device-resident f-major planes for the fused equiv kernel.

    All arrays enter the jitted forward as ARGUMENTS (the reference-shape
    planes are ~860 MB — closure constants are the known
    minutes-long-compile failure mode, see CLAUDE.md)."""

    H1: jax.Array               # (P, FP, MP2, DP) sqrt(cf)*[H_re | -H_im]
    H2: jax.Array               # (P, FP, MP2, DP) sqrt(cf)*[H_im |  H_re]
    ib1: jax.Array              # (FP, TtP) inverse-DFT basis / sqrt(cf)
    ib2: jax.Array              # (FP, TtP)
    dft_re: jax.Array           # (N, F) rfft basis (unpadded — spectra
    dft_im: jax.Array           #   are padded after the DFT matmul)
    Wc2: Optional[jax.Array]    # (J*M, Tc*D) flat head-correction weights
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
                 vmem_budget: int = 88 * 1024 * 1024):
        et = t if isinstance(t, EquivFreqTables) else make_equiv_tables(t)
        if mode is None:
            mode = {"high": "high", "highest": "f32"}.get(
                et.precision, "bf16")
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        self.mode = mode
        self.interpret = interpret
        self.three_pass = mode == "high"
        P = 2 if self.three_pass else 1
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
        TtP = _round_up(Tt, 8)
        TcP = _round_up(max(Tc, 1), 8)
        n_tail = et.n_tail

        # frequency chunking: largest Fc whose working set fits VMEM
        # (the spectra scratch is full-F regardless — it is the point)
        isz = np.dtype(plane_dtype).itemsize

        def vmem_est(FPp, fc, bc):
            return (2 * FPp * bc * tile_d * 4            # Br/Bi scratch
                    + 2 * P * fc * bc * MP2 * isz        # s chunk (dbl)
                    + 2 * 2 * P * fc * MP2 * tile_d * isz   # H1/H2 (dbl)
                    + 2 * fc * bc * tile_d * 4           # per-chunk dot
                    + 2 * TtP * bc * tile_d * 4          # TH + reuse
                    + bc * TcP * tile_d * 4 * 2          # v (dbl)
                    + 2 * bc * tile_d * 4                # out
                    + 2 * FPp * TtP * 4)                 # bases

        self.chunk_b = None
        plan = None
        for bc in (512, 256, 128, 64, 32, 16, 8):
            for n_fc in (1, 2, 3, 4, 6, 8, 12, 16, 24):
                fc = -(-F // n_fc)
                fc = _round_up(fc, 1)
                FPp = fc * n_fc
                if vmem_est(FPp, fc, bc) < vmem_budget:
                    plan = (bc, n_fc, fc, FPp)
                    break
            if plan:
                break
        if plan is None:
            raise ValueError(
                f"equiv kernel: no VMEM plan for D={D} M={M} F={F}")
        self.chunk_b, self.n_fc, self.fc_len, FP = plan
        self.FP, self.MP2, self.DP, self.TtP, self.TcP = \
            FP, MP2, DP, TtP, TcP
        self.n_tail, self.Tc = n_tail, Tc
        self.vmem_bytes = vmem_est(FP, self.fc_len, self.chunk_b)

        # --- build the device tables (f-major, scaled, padded, split) --
        cf = np.asarray(et.cf, np.float64)
        scf = np.sqrt(cf).astype(np.float32)             # (F,)
        inv_scf = (1.0 / np.sqrt(cf)).astype(np.float32)

        def planes(Hs):
            # (D, 2M, F) -> sqrt(cf)-scaled (F, 2M, D), padded, split
            h = (Hs * jnp.asarray(scf)[None, None, :]).transpose(2, 1, 0)
            h = jnp.pad(h, ((0, FP - F), (0, MP2 - M2), (0, DP - D)))
            if self.three_pass:
                hi, lo = _split_bf16(h)
                return jnp.stack([hi, lo])
            return h.astype(plane_dtype)[None]

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
            # (J, D, Tc, M) -> (J*M, Tc*D): the flat matmul's output
            # (B, Tc*D) reshapes straight into the kernel's natural
            # (Bc, TcP, TILE_D) v-block layout — no transposes
            Wc2 = jnp.asarray(et.Wc, jnp.float32).transpose(
                0, 3, 2, 1).reshape(J * M, Tc * D)
        else:
            Wc2 = None

        adp = np.asarray(et.adaptive)
        adaptive = None if np.array_equal(adp, np.arange(M)) \
            else jnp.asarray(adp)
        self.kt = EquivKernelTables(
            H1=H1, H2=H2, ib1=ib1, ib2=ib2,
            dft_re=et.dft_re, dft_im=et.dft_im, Wc2=Wc2,
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
    """Jitted forward: DFT (flat matmuls, f-major output via transposed
    contraction — no large transposes) -> plane split -> fused kernel."""
    m = meta
    B, _, N = signals.shape
    M, F, FP, MP2 = kt.M, kt.F, m.FP, m.MP2
    Bc = min(m.chunk_b, _round_up(B, 8))
    BP = _round_up(B, Bc)
    three_pass = m.three_pass
    dft_prec = (jax.lax.Precision.DEFAULT if m.mode == "bf16"
                else jax.lax.Precision.HIGHEST)

    sf = signals if kt.adaptive is None else signals[:, kt.adaptive, :]
    if kt.adaptive is None and sf.shape[1] != M:
        sf = sf[:, :M, :]
    sf = sf.astype(jnp.float32)
    s2 = sf.reshape(B * M, N)
    # f-major spectra directly from a transposed contraction:
    # (N, F)^T-contract (B*M, N) -> (F, B*M); no (B, 2M, F) transpose
    srT = jax.lax.dot_general(
        kt.dft_re, s2, (((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=dft_prec).reshape(F, B, M)
    siT = jax.lax.dot_general(
        kt.dft_im, s2, (((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=dft_prec).reshape(F, B, M)
    S3 = jnp.concatenate([srT, siT], axis=2)             # (F, B, 2M)
    S3 = jnp.pad(S3, ((0, FP - F), (0, BP - B), (0, MP2 - 2 * M)))
    if three_pass:
        hi, lo = _split_bf16(S3)
        S = jnp.stack([hi, lo])                          # (P, FP, BP, MP2)
    else:
        S = S3.astype(kt.H1.dtype)[None]

    # head-correction values v in their NATURAL kernel layout:
    # (B, Tc*D) -> (BP, TcP, DP) with no transposes
    if kt.Wc2 is not None:
        sj = jnp.stack([sf[:, :, j] for j in kt.corr_js], axis=1)
        v = jnp.dot(sj.reshape(B, -1), kt.Wc2,
                    precision=jax.lax.Precision.HIGHEST)
        v = v.reshape(B, kt.Tc, kt.D)
        v = jnp.pad(v, ((0, BP - B), (0, m.TcP - kt.Tc),
                        (0, m.DP - kt.D)))
        v_spec = pl.BlockSpec((Bc, m.TcP, m.tile_d),
                              lambda b, d, f: (b, 0, d),
                              memory_space=pltpu.VMEM)
    else:
        # no boundary corrections: a single shared dummy block (the
        # kernel's Tc==0 branch never reads it)
        v = jnp.zeros((Bc, m.TcP, m.tile_d), jnp.float32)
        v_spec = pl.BlockSpec((Bc, m.TcP, m.tile_d),
                              lambda b, d, f: (0, 0, 0),
                              memory_space=pltpu.VMEM)

    P = S.shape[0]
    grid = (BP // Bc, m.DP // m.tile_d, m.n_fc)
    fc = m.fc_len
    kernel = functools.partial(
        _equiv_power_kernel, n_fc=m.n_fc, fc_len=fc, n_tail=m.n_tail,
        Tc=kt.Tc, inv=np.float32(1.0 / (N * kt.M * kt.M)),
        th_precision=(jax.lax.Precision.DEFAULT if m.mode == "bf16"
                      else jax.lax.Precision.HIGHEST),
        main_precision=(jax.lax.Precision.HIGHEST if m.mode == "f32"
                        else jax.lax.Precision.DEFAULT),
        three_pass=three_pass)
    power = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((P, fc, Bc, MP2), lambda b, d, f: (0, f, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, fc, MP2, m.tile_d),
                         lambda b, d, f: (0, f, 0, d),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, fc, MP2, m.tile_d),
                         lambda b, d, f: (0, f, 0, d),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((FP, m.TtP), lambda b, d, f: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((FP, m.TtP), lambda b, d, f: (0, 0),
                         memory_space=pltpu.VMEM),
            v_spec,
        ],
        out_specs=pl.BlockSpec((Bc, m.tile_d), lambda b, d, f: (b, d),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BP, m.DP), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((FP, Bc, m.tile_d), jnp.float32),
            pltpu.VMEM((FP, Bc, m.tile_d), jnp.float32),
            pltpu.VMEM((Bc, m.tile_d), jnp.float32),
        ],
        interpret=m.interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024,
            dimension_semantics=("parallel", "arbitrary", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * P * BP * m.DP * MP2 * FP
            + 12 * m.TtP * BP * m.DP * FP,
            bytes_accessed=(kt.H1.size + kt.H2.size) * kt.H1.dtype.itemsize
            + S.size * S.dtype.itemsize + 4 * BP * m.DP,
            transcendentals=0,
        ),
    )(S, kt.H1, kt.H2, kt.ib1, kt.ib2, v)
    return power[:B, :kt.D].reshape(B, kt.res_x, kt.res_y)
