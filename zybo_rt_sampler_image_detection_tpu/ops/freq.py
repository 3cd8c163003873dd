"""Frequency-domain beamformers: phase-shift (Bartlett) and MVDR (Capon).

The phase-shift path reproduces the reference web app's third backend
(``PC/application/realtime_scripts/beam_forming_algorithm.py:30-70``):
rfft each mic, keep a frequency band, multiply by the precomputed steering
tensor, and sum ``|sum_mics|^2`` over frequencies.

TPU-native formulation: the ambient TPU backend implements no complex
arithmetic, and on the MXU a DFT of a 256-sample frame *is* a small matmul
anyway — so everything here is expressed over explicit (re, im) planes:

* rfft        -> two real matmuls against precomputed DFT bases;
* steering    -> four real einsums (complex multiply expanded);
* covariance  -> real/imag outer products;
* MVDR solve  -> the Hermitian system lifted to its real 2Mx2M block form
                 ``[[Re, -Im], [Im, Re]]``.

MVDR is the adaptive extension named in the project north star: streaming
per-bin spatial covariance (EMA), trace-scaled diagonal loading, Capon
spectrum ``P(d) = 1 / (a^H R^{-1} a)``, and a distortionless
single-direction beam returned to the time domain by an inverse-DFT matmul.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from . import geometry

_HI = jax.lax.Precision.HIGHEST


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FreqTables:
    """Steering tensor + DFT bases for the selected rfft band."""

    phase_re: jax.Array         # (F, M, D) float32
    phase_im: jax.Array         # (F, M, D) float32
    dft_re: jax.Array           # (N, F) float32 — rfft basis, selected bins
    dft_im: jax.Array           # (N, F) float32
    idft_re: jax.Array          # (F, N) float32 — band-limited irfft basis
    idft_im: jax.Array          # (F, N) float32
    adaptive: jax.Array         # (M,) int32
    lo: int = dataclasses.field(metadata=dict(static=True))
    hi: int = dataclasses.field(metadata=dict(static=True))
    res_x: int = dataclasses.field(metadata=dict(static=True))
    res_y: int = dataclasses.field(metadata=dict(static=True))
    n_samples: int = dataclasses.field(metadata=dict(static=True))


def make_freq_tables(cfg: Config, freq_low: Optional[float] = None,
                     freq_high: Optional[float] = None) -> FreqTables:
    """Band limits default to the config's ``freq_band_low/high``
    (``realtime_scripts/config.py:47-48`` threshold_freq_lower/upper);
    the mic model follows ``cfg.fft_mic_model``."""
    if freq_low is None:
        freq_low = cfg.freq_band_low
    if freq_high is None and cfg.freq_band_high > 0:
        freq_high = cfg.freq_band_high
    phase, (lo, hi) = geometry.phase_shift_tensor(cfg, freq_low, freq_high)
    F, M, X, Y = phase.shape
    active, _ = geometry.active_microphones(cfg)

    N = cfg.n_samples
    n = np.arange(N)[:, None]
    f = np.arange(lo, hi)[None, :]
    ang = -2.0 * np.pi * n * f / N
    dft_re = np.cos(ang)
    dft_im = np.sin(ang)
    # irfft of a band-limited spectrum: x[n] = (1/N) sum_f c_f (re cos + im·(-sin))
    # with c_f = 1 for the DC and Nyquist bins, else 2.
    c = np.where((f == 0) | (f == N // 2), 1.0, 2.0)
    iang = 2.0 * np.pi * f.T * np.arange(N)[None, :] / N
    idft_re = (c.T * np.cos(iang)) / N
    idft_im = (-c.T * np.sin(iang)) / N

    return FreqTables(
        phase_re=jnp.asarray(phase.real.reshape(F, M, X * Y), jnp.float32),
        phase_im=jnp.asarray(phase.imag.reshape(F, M, X * Y), jnp.float32),
        dft_re=jnp.asarray(dft_re, jnp.float32),
        dft_im=jnp.asarray(dft_im, jnp.float32),
        idft_re=jnp.asarray(idft_re, jnp.float32),
        idft_im=jnp.asarray(idft_im, jnp.float32),
        adaptive=jnp.asarray(active, jnp.int32),
        lo=lo, hi=hi, res_x=X, res_y=Y, n_samples=cfg.n_samples,
    )


def _frame_fft(signals: jax.Array, t: FreqTables) -> Tuple[jax.Array, jax.Array]:
    """(B, channels, N) -> band-limited spectra (re, im), each (B, F, M)."""
    s = signals[:, t.adaptive, :].astype(jnp.float32)
    re = jnp.einsum("bmn,nf->bfm", s, t.dft_re, precision=_HI)
    im = jnp.einsum("bmn,nf->bfm", s, t.dft_im, precision=_HI)
    return re, im


@jax.jit
def fft_steered_power(signals: jax.Array, t: FreqTables) -> jax.Array:
    """Bartlett steered power (B, X, Y): ``sum_f |sum_m S[f,m] P[f,m,d]|^2``.

    Matches ``beam_forming_algorithm.main`` before its normalize/threshold
    step (display logic; see :func:`normalize_heatmap`).
    """
    squeeze = signals.ndim == 2
    if squeeze:
        signals = signals[None]
    sr, si = _frame_fft(signals, t)                   # (B, F, M)
    rr = jnp.einsum("bfm,fmd->bfd", sr, t.phase_re, precision=_HI)
    ii = jnp.einsum("bfm,fmd->bfd", si, t.phase_im, precision=_HI)
    ri = jnp.einsum("bfm,fmd->bfd", sr, t.phase_im, precision=_HI)
    ir = jnp.einsum("bfm,fmd->bfd", si, t.phase_re, precision=_HI)
    re_d = rr - ii
    im_d = ri + ir
    power = jnp.sum(re_d * re_d + im_d * im_d, axis=1)  # (B, D)
    power = power.reshape(-1, t.res_x, t.res_y)
    return power[0] if squeeze else power


def normalize_heatmap(power: jax.Array, threshold: float = 0.2) -> jax.Array:
    """The reference's display normalization (``beam_forming_algorithm.py:
    57-63``): zero the map unless its max exceeds ``threshold``, else divide
    by the max."""
    mx = jnp.max(power)
    return jnp.where(mx < threshold, jnp.zeros_like(power), power / mx)


@jax.jit
def fft_power_spectrum(signals: jax.Array, t: FreqTables) -> jax.Array:
    """Per-frequency-bin steered power (B, F, X, Y) — the ``FFT_power``
    intermediate of ``beam_forming_algorithm.main`` (line 53) before the
    sum over frequencies; input to :func:`peak_detection`."""
    squeeze = signals.ndim == 2
    if squeeze:
        signals = signals[None]
    sr, si = _frame_fft(signals, t)
    rr = jnp.einsum("bfm,fmd->bfd", sr, t.phase_re, precision=_HI)
    ii = jnp.einsum("bfm,fmd->bfd", si, t.phase_im, precision=_HI)
    ri = jnp.einsum("bfm,fmd->bfd", sr, t.phase_im, precision=_HI)
    ir = jnp.einsum("bfm,fmd->bfd", si, t.phase_re, precision=_HI)
    re_d = rr - ii
    im_d = ri + ir
    power = (re_d * re_d + im_d * im_d).reshape(
        signals.shape[0], -1, t.res_x, t.res_y)
    return power[0] if squeeze else power


@jax.jit
def peak_detection(power_f: jax.Array, t: FreqTables,
                   threshold_upper: float = 0.8,
                   threshold_lower: float = 0.1) -> jax.Array:
    """Per-frequency-bin peak map (X, Y) — ``beam_forming_algorithm.py:
    37-48`` (present upstream but disabled in its ``main()``).

    For every bin whose grid maximum exceeds both ``threshold_upper *
    global_max`` and ``threshold_lower``, the bin's peak value is written at
    its argmax cell, keeping the largest across bins.  Reference quirk kept:
    the function slices ``power_in[threshold_freq_lower_idx:]`` even though
    its input already starts at that band index (line 39) — a double cut
    whenever the lower band edge is above bin 0.
    """
    power = power_f[t.lo:]                       # the double-slice quirk
    F = power.shape[0]
    flat = power.reshape(F, -1)                  # (F, X*Y)
    pmax = jnp.max(flat, axis=1)                 # (F,)
    amax = jnp.argmax(flat, axis=1)              # first occurrence, like C
    qual = (pmax > threshold_upper * jnp.max(pmax)) & (pmax > threshold_lower)
    contrib = jnp.where(qual, pmax, 0.0)
    onehot = jax.nn.one_hot(amax, flat.shape[1], dtype=power.dtype)
    heat = jnp.max(onehot * contrib[:, None], axis=0)
    return heat.reshape(t.res_x, t.res_y)


# ---------------------------------------------------------------------------
# MVDR (Capon)
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class CovarianceState:
    """Streaming per-bin spatial covariance R[f] (EMA over frames)."""

    R_re: jax.Array             # (F, M, M) float32
    R_im: jax.Array             # (F, M, M) float32
    count: jax.Array            # () int32 — update steps absorbed


def init_covariance(t: FreqTables) -> CovarianceState:
    F = t.hi - t.lo
    M = t.phase_re.shape[1]
    eye = jnp.broadcast_to(jnp.eye(M, dtype=jnp.float32), (F, M, M))
    return CovarianceState(R_re=eye, R_im=jnp.zeros((F, M, M), jnp.float32),
                           count=jnp.zeros((), jnp.int32))


@jax.jit
def update_covariance(state: CovarianceState, signals: jax.Array,
                      t: FreqTables, alpha: float = 0.9) -> CovarianceState:
    """EMA update ``R <- alpha R + (1-alpha) mean_b(S S^H)`` per bin.

    ``S S^H`` expanded: Re = sr sr^T + si si^T; Im = si sr^T - sr si^T.
    """
    if signals.ndim == 2:
        signals = signals[None]
    sr, si = _frame_fft(signals, t)                    # (B, F, M)
    B = signals.shape[0]
    o_re = (jnp.einsum("bfm,bfn->fmn", sr, sr, precision=_HI)
            + jnp.einsum("bfm,bfn->fmn", si, si, precision=_HI)) / B
    o_im = (jnp.einsum("bfm,bfn->fmn", si, sr, precision=_HI)
            - jnp.einsum("bfm,bfn->fmn", sr, si, precision=_HI)) / B
    is_first = state.count == 0
    R_re = jnp.where(is_first, o_re, alpha * state.R_re + (1 - alpha) * o_re)
    R_im = jnp.where(is_first, o_im, alpha * state.R_im + (1 - alpha) * o_im)
    return CovarianceState(R_re=R_re, R_im=R_im, count=state.count + 1)


def _loaded(state: CovarianceState, diagonal_loading: float):
    F, M, _ = state.R_re.shape
    tr = jnp.einsum("fmm->f", state.R_re) / M
    load = diagonal_loading * tr + 1e-12
    R_re = state.R_re + load[:, None, None] * jnp.eye(M, dtype=jnp.float32)
    return R_re, state.R_im


def _solve_hermitian(R_re, R_im, b_re, b_im):
    """Solve the complex system R x = b via its real 2Mx2M block form.

    R: (F, M, M) hermitian (R_re symmetric, R_im antisymmetric);
    b: (F, M, K).  Returns (x_re, x_im) each (F, M, K).
    """
    F, M, _ = R_re.shape
    top = jnp.concatenate([R_re, -R_im], axis=2)
    bot = jnp.concatenate([R_im, R_re], axis=2)
    big = jnp.concatenate([top, bot], axis=1)          # (F, 2M, 2M)
    rhs = jnp.concatenate([b_re, b_im], axis=1)        # (F, 2M, K)
    x = jnp.linalg.solve(big, rhs)
    return x[:, :M, :], x[:, M:, :]


@jax.jit
def mvdr_power(state: CovarianceState, t: FreqTables,
               diagonal_loading: float = 1e-3) -> jax.Array:
    """Capon spectrum (X, Y): ``P(d) = sum_f 1 / (a_d^H R_f^{-1} a_d)``.

    The Bartlett path computes ``|sum_m P_m S_m|^2`` so its implied steering
    vector is ``a = conj(P)``.  Diagonal loading scales with tr(R)/M per
    bin — the standard robustifier for a streaming estimate.
    """
    R_re, R_im = _loaded(state, diagonal_loading)
    a_re, a_im = t.phase_re, -t.phase_im               # a = conj(P), (F, M, D)
    x_re, x_im = _solve_hermitian(R_re, R_im, a_re, a_im)
    # denom = Re(a^H x) = a_re.x_re + a_im.x_im
    denom = (jnp.einsum("fmd,fmd->fd", a_re, x_re, precision=_HI)
             + jnp.einsum("fmd,fmd->fd", a_im, x_im, precision=_HI))
    denom = jnp.maximum(denom, 1e-12)
    power = jnp.sum(1.0 / denom, axis=0)
    return power.reshape(t.res_x, t.res_y)


@jax.jit
def mvdr_beam(state: CovarianceState, t: FreqTables, signals: jax.Array,
              direction: jax.Array,
              diagonal_loading: float = 1e-3) -> jax.Array:
    """MVDR-weighted single-direction beam in the time domain (B, N):
    ``w_f = R^{-1} a / (a^H R^{-1} a)`` per bin, inverse DFT by matmul."""
    squeeze = signals.ndim == 2
    if squeeze:
        signals = signals[None]
    R_re, R_im = _loaded(state, diagonal_loading)
    a_re = jax.lax.dynamic_index_in_dim(t.phase_re, direction, 2, False)
    a_im = -jax.lax.dynamic_index_in_dim(t.phase_im, direction, 2, False)
    x_re, x_im = _solve_hermitian(R_re, R_im, a_re[..., None], a_im[..., None])
    x_re, x_im = x_re[..., 0], x_im[..., 0]            # (F, M)
    denom = jnp.maximum(
        jnp.sum(a_re * x_re + a_im * x_im, axis=1), 1e-12
    )[:, None]
    w_re, w_im = x_re / denom, x_im / denom
    sr, si = _frame_fft(signals, t)                    # (B, F, M)
    # beam_f = w^H S = conj(w).S
    b_re = jnp.einsum("bfm,fm->bf", sr, w_re, precision=_HI) \
         + jnp.einsum("bfm,fm->bf", si, w_im, precision=_HI)
    b_im = jnp.einsum("bfm,fm->bf", si, w_re, precision=_HI) \
         - jnp.einsum("bfm,fm->bf", sr, w_im, precision=_HI)
    beam = (jnp.einsum("bf,fn->bn", b_re, t.idft_re, precision=_HI)
            + jnp.einsum("bf,fn->bn", b_im, t.idft_im, precision=_HI))
    return beam[0] if squeeze else beam
