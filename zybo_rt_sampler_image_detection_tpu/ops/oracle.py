"""NumPy CPU oracle — literal transcription of the reference C kernels.

This module exists ONLY as test ground truth.  Each function mirrors the
corresponding C loop in ``PC/src/algorithms/`` sample-for-sample, including
the edge semantics that define "bit-comparable" output:

* ``pad_delay`` drops the tail of the signal (``pad_and_sum.c:41-47``);
* the lerp delay shifts by **pad+1** samples and its first output sample
  receives no ``h·s[0]`` term (``lerp_and_sum.c:50-56``);
* convolve pads the signal by ``n_taps/2`` zeros on both sides
  (``convolve_and_sum.c:52-68``);
* hybrid applies the FIR only for ``i in [0, N-pad-1)`` — the first few
  taps of the frame are cut (``hybrid_convolve_and_sum.c:51-64``);
* MIMO power per pixel is ``sum((beam/n)**2)/N`` (``pad_and_sum.c:122-131``).

Everything is float32, like the C.  These run in O(grid × mics) Python
loops with vectorized inner slices — fast enough for test-sized configs.
"""

from __future__ import annotations

import numpy as np


# -- elementary delays ------------------------------------------------------

def pad_delay(signal: np.ndarray, out: np.ndarray, pad: int) -> None:
    """``pad_and_sum.c:41-47``: out[pad+i] += signal[i] for i < N-pad."""
    n = signal.shape[0]
    if pad < n:
        out[pad:] += signal[: n - pad]


def lerp_delay(signal: np.ndarray, out: np.ndarray, h: float, pad: int) -> None:
    """``lerp_and_sum.c:50-56``: out[pad+i+1] += s[i] + h*(s[i+1]-s[i])
    for i < N-pad-1, with h already reversed (h = 1-frac)."""
    n = signal.shape[0]
    m = n - pad - 1
    if m <= 0:
        return
    s0 = signal[:m]
    s1 = signal[1 : m + 1]
    out[pad + 1 : pad + 1 + m] += s0 + out.dtype.type(h) * (s1 - s0)


def convolve_delay_add(signal: np.ndarray, h: np.ndarray, out: np.ndarray) -> None:
    """``convolve_and_sum.c:73-87``: backwards convolution over a
    zero-padded copy with offset n_taps/2, accumulated into out."""
    n = signal.shape[0]
    t = h.shape[0]
    off = t // 2
    padded = np.zeros(n + t, dtype=out.dtype)
    padded[off : off + n] = signal
    for k in range(t):
        out += out.dtype.type(h[k]) * padded[k : k + n]


def hybrid_delay_add(signal: np.ndarray, h: np.ndarray, pad: int, out: np.ndarray) -> None:
    """``hybrid_convolve_and_sum.c:51-64``: whole-sample zero-pad plus FIR
    on the remainder; loop range i < N-pad-1 cuts the frame head."""
    n = signal.shape[0]
    t = h.shape[0]
    off = t // 2
    padded = np.zeros(n + t, dtype=out.dtype)
    padded[off : off + n] = signal
    m = n - pad - 1
    if m <= 0:
        return
    for k in range(t):
        out[pad + 1 : pad + 1 + m] += out.dtype.type(h[k]) * padded[k : k + m]


# -- MISO (single direction) ------------------------------------------------

def miso_pad(signals, adaptive, whole_flat, n, offset):
    """``pad_and_sum.c:54-70``; whole_flat is the flattened (X,Y,n) table."""
    n_samples = signals.shape[1]
    out = np.zeros(n_samples, dtype=signals.dtype)
    for m in range(n):
        pad_delay(signals[adaptive[m]], out, int(whole_flat[offset + m]))
    return out


def miso_lerp(signals, adaptive, whole_flat, frac_flat, n, offset):
    """``lerp_and_sum.c:67-92``."""
    n_samples = signals.shape[1]
    out = np.zeros(n_samples, dtype=signals.dtype)
    for m in range(n):
        lerp_delay(signals[adaptive[m]], out,
                   float(frac_flat[offset + m]), int(whole_flat[offset + m]))
    return out


def miso_convolve(signals, adaptive, taps_flat, n, offset, n_taps):
    """``convolve_and_sum.c:213-229`` (naive == vectorized semantics)."""
    n_samples = signals.shape[1]
    out = np.zeros(n_samples, dtype=signals.dtype)
    for m in range(n):
        h = taps_flat[offset + m * n_taps : offset + (m + 1) * n_taps]
        convolve_delay_add(signals[adaptive[m]], h, out)
    return out


def miso_hybrid(signals, adaptive, whole_flat, taps_flat, n, offset, n_taps):
    """``hybrid_convolve_and_sum.c:66-86``."""
    n_samples = signals.shape[1]
    out = np.zeros(n_samples, dtype=signals.dtype)
    for m in range(n):
        h = taps_flat[(offset + m) * n_taps : (offset + m + 1) * n_taps]
        hybrid_delay_add(signals[adaptive[m]], h, int(whole_flat[offset + m]), out)
    return out


# -- MIMO (full steering grid) ----------------------------------------------

def _power(out: np.ndarray, n: int):
    """``pad_and_sum.c:122-131``: mean power of beam/n (dtype-preserving so
    the oracle can also run in float64 for exactness gates)."""
    beam = out / out.dtype.type(n)
    return np.sum(beam * beam) / out.dtype.type(out.shape[0])


def mimo_pad(signals, whole, adaptive):
    """``pad_and_sum.c:100-143``.  whole: (X, Y, n) int table over active
    mics; signals: (n_mics_total, N) float32; adaptive: active mic indices.
    Returns (X, Y) image — the flat pixel/table index scrambling in the C
    (it reads the (X,Y,n) table with a (Y,X,n) stride pattern but writes the
    image with the same flat order) cancels out, so semantically
    ``image[x, y] = power(delays[x, y, :])``."""
    X, Y, n = whole.shape
    image = np.zeros((X, Y), dtype=signals.dtype)
    for x in range(X):
        for y in range(Y):
            out = np.zeros(signals.shape[1], dtype=signals.dtype)
            for m in range(n):
                pad_delay(signals[adaptive[m]], out, int(whole[x, y, m]))
            image[x, y] = _power(out, n)
    return image


def mimo_lerp(signals, whole, frac, adaptive):
    """``lerp_and_sum.c:103-136``."""
    X, Y, n = whole.shape
    image = np.zeros((X, Y), dtype=signals.dtype)
    for x in range(X):
        for y in range(Y):
            out = np.zeros(signals.shape[1], dtype=signals.dtype)
            for m in range(n):
                lerp_delay(signals[adaptive[m]], out,
                           float(frac[x, y, m]), int(whole[x, y, m]))
            image[x, y] = _power(out, n)
    return image


def mimo_convolve(signals, taps, adaptive):
    """``convolve_and_sum.c:231-272``.  taps: (X, Y, n, n_taps)."""
    X, Y, n, _ = taps.shape
    image = np.zeros((X, Y), dtype=signals.dtype)
    for x in range(X):
        for y in range(Y):
            out = np.zeros(signals.shape[1], dtype=signals.dtype)
            for m in range(n):
                convolve_delay_add(signals[adaptive[m]], taps[x, y, m], out)
            image[x, y] = _power(out, n)
    return image


def mimo_hybrid(signals, whole, taps, adaptive):
    """``hybrid_convolve_and_sum.c:88-121``."""
    X, Y, n = whole.shape
    image = np.zeros((X, Y), dtype=signals.dtype)
    for x in range(X):
        for y in range(Y):
            out = np.zeros(signals.shape[1], dtype=signals.dtype)
            for m in range(n):
                hybrid_delay_add(signals[adaptive[m]], taps[x, y, m],
                                 int(whole[x, y, m]), out)
            image[x, y] = _power(out, n)
    return image


def mimo_truncated(signals, whole, adaptive):
    """``api.c:1015-1056`` — identical inner math to :func:`mimo_pad` with
    its own statically-loaded table; subsumed by the pad kernel."""
    return mimo_pad(signals, whole, adaptive)


# -- FFT-domain oracle -------------------------------------------------------

def fft_mimo(signal_tm, phase_shift, lo, hi, threshold_heatmap=0.2):
    """``beam_forming_algorithm.py:30-70``.  signal_tm: (N, M) time-major;
    phase_shift: (F, M, X, Y) complex; returns normalized (X, Y) heatmap."""
    fft = np.fft.rfft(signal_tm, axis=0)[lo:hi, :]
    fft = fft.reshape(fft.shape[0], fft.shape[1], 1, 1)
    shifted = fft * phase_shift
    power = np.abs(shifted.sum(axis=1)) ** 2
    heatmap = power.sum(axis=0)
    if heatmap.max() < threshold_heatmap:
        heatmap = np.zeros_like(heatmap)
    else:
        heatmap = heatmap / heatmap.max()
    return heatmap


def fft_r_prime(cfg):
    """``realtime_scripts/calc_r_prime.py:9-24`` — the FFT stack's own mic
    model with camera_offset / ARRAY_SEPARATION; returns (r_all, r_active)
    like the reference's (r_prime_all, r_prime)."""
    d = cfg.element_distance
    half = d / 2
    r_prime = np.zeros((2, cfg.n_microphones))
    element_index = 0
    for array in range(cfg.active_arrays):
        array *= -1
        for row in range(cfg.rows):
            for col in range(cfg.columns):
                r_prime[0, element_index] = (
                    -col * d - half + array * cfg.columns * d
                    + array * cfg.array_separation
                    + cfg.columns * cfg.active_arrays * half)
                r_prime[1, element_index] = (
                    row * d - cfg.rows * half + half - cfg.camera_offset)
                element_index += 1
    r_prime[0, :] += (cfg.active_arrays - 1) * cfg.array_separation / 2
    from . import geometry
    active, _ = geometry.active_microphones(cfg)
    return r_prime, r_prime[:, active]


def fft_phase_shift(cfg, lo=None, hi=None):
    """``realtime_scripts/calc_phase_shift_cartesian.py:7-51`` — the full
    4-D complex steering tensor over the FFT stack's own geometry/config.
    Returns (phase (F, M_active, X, Y) complex, (lo, hi))."""
    c = cfg.propagation_speed
    fs = int(cfg.sample_rate)
    N = cfg.n_samples
    theta_max = cfg.view_angle / 2
    r_prime_all, _ = fft_r_prime(cfg)
    x_i = r_prime_all[0, :].reshape(1, -1, 1, 1)
    y_i = r_prime_all[1, :].reshape(1, -1, 1, 1)

    x_scan_max = cfg.z_scan * np.tan(np.deg2rad(theta_max))
    y_scan_max = x_scan_max / cfg.aspect_ratio
    x_scan = np.linspace(-x_scan_max, x_scan_max,
                         cfg.max_res_x).reshape(1, 1, -1, 1)
    y_scan = np.linspace(-y_scan_max, y_scan_max,
                         cfg.max_res_y).reshape(1, 1, 1, -1)
    r_scan = np.sqrt(x_scan**2 + y_scan**2 + cfg.z_scan**2)

    f = np.linspace(0, int(fs / 2), int(N / 2) + 1)
    if lo is None:
        lo = int(np.abs(f - cfg.freq_band_low).argmin())
    if hi is None:
        fb_hi = cfg.freq_band_high if cfg.freq_band_high > 0 else fs / 2
        hi = int(np.abs(f - fb_hi).argmin())
    fsel = f[lo:hi].reshape(-1, 1, 1, 1)
    k = 2 * np.pi * fsel / c
    phase_full = np.exp(1j * (-k * (x_scan * x_i + y_scan * y_i) / r_scan))
    from . import geometry
    active, _ = geometry.active_microphones(cfg)
    return phase_full[:, active, :, :], (lo, hi)


def fft_peak_detection(power_in, threshold_upper, threshold_lower, lo,
                       res_x, res_y):
    """``beam_forming_algorithm.py:37-48`` verbatim, including the double
    slice of the already-band-limited power by the lower band index."""
    heatmap = np.zeros((res_x, res_y))
    power = power_in[lo:, :, :]
    for f_ind in range(0, len(power[:, 0, 0])):
        if (np.max(power[f_ind, :, :]) > threshold_upper * np.max(power)
                and np.max(power[f_ind, :, :]) > threshold_lower):
            (x_max, y_max) = np.unravel_index(
                power[f_ind, :, :].argmax(), np.shape(power[f_ind, :, :]))
            if power[f_ind, x_max, y_max] > heatmap[x_max, y_max]:
                heatmap[x_max, y_max] = power[f_ind, x_max, y_max]
    return heatmap
