"""Fused Pallas TPU kernel for the steered-power (MIMO) heatmap.

One launch computes every (azimuth, elevation) power pixel for a batch of
frames: the delay-line weight matrix streams HBM->VMEM tile by tile, each
tile is contracted against the resident delay-line signal block on the MXU,
boundary corrections are subtracted, and the per-direction mean power is
reduced in-register — the (B, D, N) beam tensor never touches HBM.

This replaces the reference's serial per-direction C loop
(``pad_and_sum.c:114-142``) and its AVX2 inner vectorization
(``convolve_and_sum.c:92-128``): the 1824-direction axis the C walked one
pixel at a time becomes the matmul M-dimension of a systolic-array pass.

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

from .beamform import SteeringTables, delay_lines, _apply_corrections


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _power_kernel(w_ref, sdel_ref, corr_ref, out_ref, *, inv_n, inv_len,
                  n_pad, precision):
    """One (batch, direction-tile) grid cell.

    w_ref:    (TILE_D, K)   delay-line weights for this direction tile
    sdel_ref: (K, NP)       delay-line signal block for this batch frame
    corr_ref: (TILE_D, NP)  dense boundary corrections (to subtract)
    out_ref:  (1, TILE_D)   mean power per direction
    """
    acc = jnp.dot(
        w_ref[:], sdel_ref[:], preferred_element_type=jnp.float32,
        precision=precision,
    )
    acc = acc - corr_ref[:]
    acc = acc * inv_n
    # padded tail columns of sdel are zero and corr is zero there, so they
    # contribute nothing; divide by the true N, not NP.
    out_ref[0, :] = jnp.sum(acc * acc, axis=1) * inv_len


class FusedBeamformer:
    """Precomputed padded weights + a jitted fused pallas launch.

    Usage::

        fused = FusedBeamformer(tables)
        power = fused(frames)            # (B, X, Y) or (X, Y)

    Falls back to the XLA path automatically when the tile working set would
    not fit VMEM (`~pltpu` budget) or when running on a non-TPU backend
    without ``interpret`` support.
    """

    def __init__(self, t: SteeringTables, tile_d: int = 128,
                 interpret: Optional[bool] = None):
        self.t = t
        D, T, M = t.W.shape
        N = t.n_samples
        self.K = T * M
        self.KP = _round_up(self.K, 128)
        self.NP = _round_up(N, 128)
        self.DP = _round_up(D, tile_d)
        self.tile_d = tile_d
        w = np.zeros((self.DP, self.KP), dtype=np.asarray(t.W).dtype)
        w[:D, : self.K] = np.asarray(t.W).reshape(D, self.K)
        self.W2 = jnp.asarray(w)
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        self.interpret = interpret
        # VMEM working set: W tile (double-buffered) + sdel + corr + acc.
        vmem = (2 * tile_d * self.KP + self.KP * self.NP
                + 2 * tile_d * self.NP) * 4
        self.fits_vmem = vmem < 14 * 1024 * 1024
        self._call = jax.jit(self._forward)

    def _forward(self, signals: jax.Array) -> jax.Array:
        t = self.t
        squeeze = signals.ndim == 2
        if squeeze:
            signals = signals[None]
        B = signals.shape[0]
        N, D = t.n_samples, t.n_directions
        s = signals[:, t.adaptive, :]
        sdel = delay_lines(s.astype(self.W2.dtype), t.tau_min, t.n_taps_line)
        sdel = sdel.reshape(B, self.K, N)
        sdel = jnp.pad(sdel, ((0, 0), (0, self.KP - self.K),
                              (0, self.NP - N)))
        # Dense boundary corrections (zeros for pad/convolve/truncated).
        corr = -_apply_corrections(
            jnp.zeros((B, D, N), jnp.float32), s.astype(jnp.float32), t
        )
        corr = jnp.pad(corr, ((0, 0), (0, self.DP - D), (0, self.NP - N)))

        grid = (B, self.DP // self.tile_d)
        kernel = functools.partial(
            _power_kernel,
            inv_n=np.float32(1.0 / t.n_mics),
            inv_len=np.float32(1.0 / N),
            n_pad=self.NP - N,
            # Mosaic supports only DEFAULT/HIGHEST dot precision; "high"
            # falls back to the exact 6-pass mode inside the kernel.
            precision=(jax.lax.Precision.DEFAULT
                       if t.precision == "default"
                       else jax.lax.Precision.HIGHEST),
        )
        power = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((self.tile_d, self.KP), lambda b, d: (d, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, self.KP, self.NP), lambda b, d: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, self.tile_d, self.NP),
                             lambda b, d: (b, d, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((None, 1, self.tile_d),
                                   lambda b, d: (b, 0, d),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, 1, self.DP), jnp.float32),
            interpret=self.interpret,
            cost_estimate=pl.CostEstimate(
                flops=2 * B * self.DP * self.KP * self.NP,
                bytes_accessed=4 * (B * self.DP * self.KP
                                    + B * self.KP * self.NP + B * self.DP),
                transcendentals=0,
            ),
        )(self.W2, sdel, corr)
        power = power[:, 0, :D].reshape(B, t.res_x, t.res_y)
        return power[0] if squeeze else power

    def __call__(self, signals: jax.Array) -> jax.Array:
        if not self.fits_vmem:
            from .beamform import steered_power
            return steered_power(signals, self.t)
        return self._call(signals)
