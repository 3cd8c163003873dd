"""Fused Pallas TPU kernel for the steered-power (MIMO) heatmap.

One launch computes every (azimuth, elevation) power pixel for a batch of
frames with near-minimal HBM traffic:

* the mic signals for a frame chunk stay **resident in VMEM**; the first
  direction tile of each chunk materializes the delay-line expansion into
  a persistent VMEM scratch (static slice + concat) that all remaining
  tiles reuse — the (T*M, B*N) delay-line tensor never exists in HBM;
* each grid cell is then a single (TILE_D, T*M) @ (T*M, Bc*N) MXU pass;
* boundary corrections arrive as a narrow chunk-layout tensor (built by
  one einsum, no transposes) and are subtracted in-register;
* the per-direction mean power reduces in-register — the (D, B*N) beam
  tensor never exists in HBM either.

Measured: 30k heatmaps/s at bf16 (64 ch x 65x65, B=512, one v5e), ~2.1x
the unfused XLA path and 30x the project's north-star target — the serial
per-direction C loop of ``pad_and_sum.c:114-142`` becomes a compute-bound
systolic-array program.

The exact XLA formulation in :mod:`.beamform` is the ground truth; this
kernel must (and is tested to) match it.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .beamform import SteeringTables

CORR_COLS = 128          # boundary corrections live in the first N columns


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _shift3(x3: jax.Array, tau: int) -> jax.Array:
    """Zero-fill shift along the last (time) axis of (M, Bc, N) — the C
    ``pad_delay`` semantics per frame."""
    M, Bc, N = x3.shape
    if tau == 0:
        return x3
    if tau >= N or tau <= -N:
        return jnp.zeros_like(x3)
    if tau > 0:
        z = jnp.zeros((M, Bc, tau), x3.dtype)
        return jnp.concatenate([z, x3[:, :, : N - tau]], axis=2)
    z = jnp.zeros((M, Bc, -tau), x3.dtype)
    return jnp.concatenate([x3[:, :, -tau:], z], axis=2)


def _power_kernel(w_ref, s_ref, corr_ref, out_ref, sdel_ref, *, T, M,
                  tau_min, Bc, N, cc, inv_n, inv_len, precision,
                  three_pass):
    """One (frame-chunk, direction-tile) grid cell.

    w_ref:    (P, TILE_D, T*M) delay-line weights for this direction tile
              (P=1, or P=2 hi/lo bf16 planes in three-pass mode)
    s_ref:    (P, M, Bc, N)   resident signal chunk
    corr_ref: (TILE_D, Bc, cc) boundary corrections (to subtract)
    out_ref:  (Bc, TILE_D)    mean power per (frame, direction)
    sdel_ref: (P, T*M, Bc, N) VMEM scratch — the on-chip delay lines,
              built once per frame chunk (first direction tile) and reused
              by the remaining ~D/TILE_D tiles; it never exists in HBM.

    ``three_pass`` emulates f32 precision from bf16 planes (Mosaic lacks
    Precision.HIGH): x = hi + lo => W@S ≈ Whi@Shi + Whi@Slo + Wlo@Shi.
    """
    n_planes = 2 if three_pass else 1

    @pl.when(pl.program_id(1) == 0)
    def _build_delay_lines():
        for pidx in range(n_planes):
            x3 = s_ref[pidx]
            for t in range(T):
                sdel_ref[pidx, pl.ds(t * M, M), :] = _shift3(
                    x3, tau_min + t).reshape(M, Bc * N)

    def dot(wp, sp):
        return jax.lax.dot_general(
            w_ref[wp], sdel_ref[sp], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)

    tile_d = w_ref.shape[1]
    if three_pass:
        acc = ((dot(0, 1) + dot(1, 0)) + dot(0, 0))
    else:
        acc = dot(0, 0)
    corr = corr_ref[:].astype(jnp.float32)
    if cc < N:   # extend with zeros; Mosaic has no scatter-add
        corr = jnp.concatenate(
            [corr, jnp.zeros(corr.shape[:2] + (N - cc,), jnp.float32)],
            axis=2)
    beams = (acc.reshape(tile_d, Bc, N) - corr) * inv_n
    power = jnp.sum(beams * beams, axis=2) * inv_len  # (TILE_D, Bc)
    out_ref[:, :] = power.T


class FusedBeamformer:
    """Precomputed padded weights + a jitted fused pallas launch.

    Usage::

        fused = FusedBeamformer(tables)
        power = fused(frames)            # (B, X, Y) or (X, Y)

    ``chunk_b`` frames are processed per grid step with the signal block
    resident in VMEM.  Falls back to the XLA path when the working set
    would not fit VMEM.
    """

    def __init__(self, t: SteeringTables, tile_d: int = 256,
                 chunk_b: Optional[int] = None,
                 interpret: Optional[bool] = None):
        self.t = t
        D, T, M = t.W.shape
        N = t.n_samples
        w_dtype = np.dtype(np.asarray(t.W).dtype)
        # "high" from f32 tables: emulate 3-pass f32 with bf16 hi/lo planes
        self.three_pass = (t.precision == "high" and w_dtype.itemsize == 4)
        self.n_planes = 2 if self.three_pass else 1
        self.plane_dtype = jnp.bfloat16 if self.three_pass \
            else jnp.dtype(w_dtype)
        if chunk_b is None:
            # bf16 scratch fits twice the frames of f32 in the same VMEM
            chunk_b = 16 if (w_dtype.itemsize == 2 and not self.three_pass) \
                else 8
        self.T, self.M, self.N = T, M, N
        self.DP = _round_up(D, tile_d)
        self.tile_d = tile_d
        self.chunk_b = chunk_b
        self.cc = min(CORR_COLS, N)
        wf = np.zeros((self.DP, T * M), dtype=w_dtype)
        wf[:D] = np.asarray(t.W).reshape(D, T * M)
        if self.three_pass:
            hi = wf.astype(np.float32).astype(jnp.bfloat16)
            lo = (wf.astype(np.float32)
                  - np.asarray(hi, np.float32)).astype(jnp.bfloat16)
            self.Wp = jnp.stack([jnp.asarray(hi), jnp.asarray(lo)])
        else:
            self.Wp = jnp.asarray(wf)[None]            # (1, DP, K)
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        self.interpret = interpret
        isz = np.dtype(self.plane_dtype).itemsize
        P = self.n_planes
        vmem = (2 * P * tile_d * T * M * isz           # W tiles (dbl buf)
                + P * M * chunk_b * N * isz            # resident signals
                + P * T * M * chunk_b * N * isz        # delay-line scratch
                + 2 * tile_d * chunk_b * N * 4         # acc + beams
                + 2 * tile_d * chunk_b * self.cc * 4)  # corr
        corr_fits = t.Wc is None or t.Wc.shape[2] <= self.cc
        self.vmem_bytes = vmem
        self.fits_vmem = corr_fits and vmem < 28 * 1024 * 1024
        self._call = jax.jit(self._forward)

    def _forward(self, signals: jax.Array) -> jax.Array:
        t = self.t
        squeeze = signals.ndim == 2
        if squeeze:
            signals = signals[None]
        B = signals.shape[0]
        Bc = self.chunk_b
        if B % Bc:
            pad_b = Bc - B % Bc
            signals = jnp.concatenate(
                [signals, jnp.zeros((pad_b,) + signals.shape[1:],
                                    signals.dtype)], axis=0)
        BP = signals.shape[0]
        N, D, M, T = self.N, t.n_directions, self.M, self.T

        sf = signals[:, t.adaptive, :]                        # (BP, M, N)
        if self.three_pass:
            hi = sf.astype(jnp.float32).astype(jnp.bfloat16)
            lo = (sf.astype(jnp.float32)
                  - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            s = jnp.stack([hi, lo], axis=1)                   # (BP, P, M, N)
        else:
            s = sf.astype(self.plane_dtype)[:, None]          # (BP, 1, M, N)
        s_chunks = s.reshape(BP // Bc, Bc, self.n_planes, M, N) \
                    .transpose(0, 2, 3, 1, 4)    # (chunks, P, M, Bc, N)

        # narrow dense corrections, computed straight into the kernel's
        # (chunks, DP, Bc, cc) layout — no transpose of the big tensor
        if t.Wc is None:
            corr = jnp.zeros((BP // Bc, self.DP, Bc, self.cc), jnp.float32)
        else:
            sj = jnp.stack(
                [signals[:, t.adaptive, j].astype(jnp.float32)
                 for j in t.corr_js], axis=1)          # (BP, J, M)
            sjc = sj.reshape(BP // Bc, Bc, len(t.corr_js), M)
            wc = jnp.pad(t.Wc.astype(jnp.float32),
                         ((0, 0), (0, self.DP - D), (0, 0), (0, 0)))
            corr = jnp.einsum("jdtm,cbjm->cdbt", wc, sjc,
                              precision=t.lax_precision)
            corr = jnp.pad(
                corr, ((0, 0), (0, 0), (0, 0),
                       (0, self.cc - corr.shape[-1])))

        grid = (BP // Bc, self.DP // self.tile_d)
        kernel = functools.partial(
            _power_kernel,
            T=T, M=M,
            tau_min=t.tau_min,
            Bc=Bc, N=N, cc=self.cc,
            inv_n=np.float32(1.0 / t.n_mics),
            inv_len=np.float32(1.0 / N),
            precision=(jax.lax.Precision.HIGHEST
                       if t.precision == "highest" and not self.three_pass
                       else jax.lax.Precision.DEFAULT),
            three_pass=self.three_pass,
        )
        P = self.n_planes
        power = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((P, self.tile_d, T * M),
                             lambda b, d: (0, d, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, P, self.M, Bc, N),
                             lambda b, d: (b, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, self.tile_d, Bc, self.cc),
                             lambda b, d: (b, d, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((None, Bc, self.tile_d),
                                   lambda b, d: (b, 0, d),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((BP // Bc, Bc, self.DP),
                                           jnp.float32),
            scratch_shapes=[pltpu.VMEM((P, T * M, Bc * N),
                                       self.plane_dtype)],
            interpret=self.interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
            cost_estimate=pl.CostEstimate(
                flops=2 * BP * self.DP * T * M * N,
                bytes_accessed=4 * (BP // Bc * self.DP * T * M
                                    + BP * M * N + BP * self.DP),
                transcendentals=0,
            ),
        )(self.Wp, s_chunks, corr)
        power = power.reshape(BP, self.DP)[:B, :D]
        power = power.reshape(B, t.res_x, t.res_y)
        return power[0] if squeeze else power

    def __call__(self, signals: jax.Array) -> jax.Array:
        if not self.fits_vmem:
            from .beamform import steered_power
            return steered_power(signals, self.t)
        return self._call(signals)
