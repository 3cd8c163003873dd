"""FFT-domain beamformer vs the NumPy transcription of the reference web
backend, plus MVDR property tests."""

import numpy as np
import pytest

import zybo_rt_sampler_image_detection_tpu as zrt
from zybo_rt_sampler_image_detection_tpu.ops import freq, geometry, oracle

from conftest import synth_frame


def test_fft_power_matches_oracle(tiny_cfg, frame):
    cfg = tiny_cfg
    t = freq.make_freq_tables(cfg, 100.0, 20000.0)
    phase, (lo, hi) = geometry.phase_shift_tensor(cfg, 100.0, 20000.0)
    active, _ = geometry.active_microphones(cfg)
    # the oracle consumes time-major (N, M) like receive() provides to main()
    ref_power = None
    sig_tm = frame[active, :].T
    fft = np.fft.rfft(sig_tm, axis=0)[lo:hi, :]
    fft = fft.reshape(fft.shape[0], fft.shape[1], 1, 1)
    power = (np.abs((fft * phase).sum(axis=1)) ** 2).sum(axis=0)
    got = np.asarray(freq.fft_steered_power(frame, t))
    np.testing.assert_allclose(got, power, rtol=2e-4, atol=1e-6)


def test_fft_normalize_matches_reference(tiny_cfg, frame):
    cfg = tiny_cfg
    t = freq.make_freq_tables(cfg, 100.0, 20000.0)
    phase, (lo, hi) = geometry.phase_shift_tensor(cfg, 100.0, 20000.0)
    active, _ = geometry.active_microphones(cfg)
    ref = oracle.fft_mimo(frame[active, :].T.astype(np.float64),
                          phase, lo, hi)
    got = np.asarray(freq.normalize_heatmap(
        freq.fft_steered_power(frame, t)))
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-5)


def test_fft_broadside_peak(tiny_cfg):
    rng = np.random.default_rng(5)
    f = synth_frame(tiny_cfg, rng, kind="replicated")
    t = freq.make_freq_tables(tiny_cfg, 4000.0, 20000.0)
    img = np.asarray(freq.fft_steered_power(f, t))
    x, y = np.unravel_index(img.argmax(), img.shape)
    cx, cy = (tiny_cfg.max_res_x - 1) / 2, (tiny_cfg.max_res_y - 1) / 2
    assert abs(x - cx) <= 1 and abs(y - cy) <= 1


def _delayed_source_frame(cfg, tx, ty, seed=11):
    """Frame containing a wideband source at grid cell (tx, ty)."""
    rng = np.random.default_rng(seed)
    delays = geometry.calculate_delays(cfg)
    active, _ = geometry.active_microphones(cfg)
    base = rng.standard_normal(cfg.n_samples * 3).astype(np.float32)
    frame = np.zeros((cfg.n_microphones, cfg.n_samples), np.float32)
    d = delays[tx, ty]
    lag = (d.max() - d).round().astype(int)
    for i, m in enumerate(active):
        s = cfg.n_samples - lag[i]
        frame[m] = base[s : s + cfg.n_samples]
    return frame


def test_mvdr_localizes_source(tiny_cfg):
    cfg = tiny_cfg
    tx, ty = 6, 2
    t = freq.make_freq_tables(cfg, 2000.0, 20000.0)
    state = freq.init_covariance(t)
    for seed in range(4):
        frame = _delayed_source_frame(cfg, tx, ty, seed=20 + seed)
        frame += 0.01 * np.random.default_rng(seed).standard_normal(
            frame.shape).astype(np.float32)
        state = freq.update_covariance(state, frame, t)
    img = np.asarray(freq.mvdr_power(state, t))
    x, y = np.unravel_index(img.argmax(), img.shape)
    assert abs(x - tx) <= 1 and abs(y - ty) <= 1


def test_mvdr_resolves_two_sources(tiny_cfg):
    """Two incoherent sources several cells apart must appear as two
    distinct peaks in the Capon map with a clear valley between them.
    (No Bartlett comparison: in this snapshot-starved tiny setup — 8
    snapshots ~ M mics — averaged Bartlett can out-resolve Capon; the
    property under test is that MVDR separates the sources at all.)"""
    cfg = tiny_cfg
    # high band: the tiny aperture's low-frequency beamwidth spans the
    # whole grid, so resolution only exists above ~12 kHz
    t = freq.make_freq_tables(cfg, 12000.0, 24000.0)
    a = (1, 2)
    b = (7, 2)
    state = freq.init_covariance(t)
    bart = np.zeros((cfg.max_res_x, cfg.max_res_y), np.float64)
    for seed in range(8):
        # independent wideband signals per source -> incoherent
        fa = _delayed_source_frame(cfg, *a, seed=100 + seed)
        fb = _delayed_source_frame(cfg, *b, seed=200 + seed)
        frame = fa + fb + 0.01 * np.random.default_rng(seed) \
            .standard_normal(fa.shape).astype(np.float32)
        state = freq.update_covariance(state, frame, t)
        bart += np.asarray(freq.fft_steered_power(frame, t), np.float64)
    capon = np.asarray(freq.mvdr_power(state, t), np.float64)

    def peaks_and_valley(img):
        pa, pb = img[a], img[b]
        # valley: minimum along the straight line between the two cells
        xs = np.linspace(a[0], b[0], 7).round().astype(int)
        ys = np.linspace(a[1], b[1], 7).round().astype(int)
        valley = min(img[x, y] for x, y in zip(xs[1:-1], ys[1:-1]))
        return valley / min(pa, pb)

    # both sources visible to MVDR: each true cell within 1 cell of a
    # local max of the map
    for cell in (a, b):
        x, y = cell
        patch = capon[max(0, x - 1):x + 2, max(0, y - 1):y + 2]
        assert patch.max() >= 0.8 * capon.max(), \
            f"MVDR lost the source at {cell}"
    r_capon = peaks_and_valley(capon)
    assert r_capon < 0.7, f"sources not resolved: valley ratio {r_capon:.3f}"
    # the summed Bartlett map localizes them too (same ground truth)
    r_bart = peaks_and_valley(bart)
    assert r_bart < 0.9


def test_mvdr_beam_recovers_signal(tiny_cfg):
    cfg = tiny_cfg
    tx, ty = 4, 3
    t = freq.make_freq_tables(cfg, 0.0, None)
    state = freq.init_covariance(t)
    frame = _delayed_source_frame(cfg, tx, ty)
    state = freq.update_covariance(state, frame, t)
    d = tx * cfg.max_res_y + ty
    beam = np.asarray(freq.mvdr_beam(state, t, frame, d))
    # Distortionless response: the beam output should correlate strongly
    # with what a single mic hears (same wideband source).
    active, _ = geometry.active_microphones(cfg)
    ref = frame[active[0]]
    c = np.corrcoef(beam, ref)[0, 1]
    assert abs(c) > 0.7


def test_batched_covariance_update(tiny_cfg, rng):
    """update_covariance over a batch equals the mean of per-frame outers."""
    from conftest import synth_frame

    frames = np.stack([synth_frame(tiny_cfg, rng) for _ in range(3)])
    t = freq.make_freq_tables(tiny_cfg, 100.0, 20000.0)
    s_batch = freq.update_covariance(freq.init_covariance(t), frames, t)
    # manual: first update replaces the identity with the batch mean
    singles = [freq.update_covariance(freq.init_covariance(t), f, t)
               for f in frames]
    mean_re = np.mean([np.asarray(s.R_re) for s in singles], axis=0)
    np.testing.assert_allclose(np.asarray(s_batch.R_re), mean_re,
                               rtol=2e-4, atol=1e-6)


# ---------------------------------------------------------------------------
# FFT-stack fidelity profile (Config.fft_reference, round 2)
# ---------------------------------------------------------------------------

def test_fft_r_prime_matches_oracle():
    """geometry.r_prime_fft == the literal calc_r_prime.py transcription,
    including camera_offset and a nonzero ARRAY_SEPARATION."""
    for cfg in (zrt.Config.fft_reference(),
                zrt.Config.fft_reference().replace(array_separation=0.08),
                zrt.Config.fft_reference().replace(active_arrays=2,
                                                   array_slots=2,
                                                   n_microphones=128)):
        got_all, got_act = geometry.r_prime_fft(cfg)
        ref_all, ref_act = oracle.fft_r_prime(cfg)
        np.testing.assert_array_equal(got_all, ref_all)
        np.testing.assert_array_equal(got_act, ref_act)


def test_fft_reference_preset_fields():
    """The preset reproduces the divergent realtime_scripts/config.py."""
    cfg = zrt.Config.fft_reference()
    assert (cfg.max_res_x, cfg.max_res_y) == (13, 13)
    assert cfg.propagation_speed == 343.0
    assert cfg.active_arrays == 4 and cfg.view_angle == 68.0
    assert cfg.camera_offset == 0.11 and cfg.n_taps == 64
    assert (cfg.freq_band_low, cfg.freq_band_high) == (0.0, 18000.0)
    assert cfg.fft_mic_model == "fft"


def test_fft_reference_phase_tensor_matches_oracle():
    cfg = zrt.Config.fft_reference()
    phase, (lo, hi) = geometry.phase_shift_tensor(cfg)
    ref, (rlo, rhi) = oracle.fft_phase_shift(cfg)
    assert (lo, hi) == (rlo, rhi)
    np.testing.assert_allclose(phase, ref.astype(np.complex64),
                               rtol=1e-5, atol=1e-6)


def test_fft_reference_backend_e2e():
    """Full web backend-3 parity on the shipped config: receive ->
    rfft -> phase shift -> power -> normalize, vs the oracle."""
    cfg = zrt.Config.fft_reference()
    rng = np.random.default_rng(33)
    frame = (rng.standard_normal(
        (cfg.n_microphones, cfg.n_samples)) * 0.3).astype(np.float32)
    t = freq.make_freq_tables(cfg)
    ref_phase, (lo, hi) = oracle.fft_phase_shift(cfg)
    ref = oracle.fft_mimo(frame.T.astype(np.float64), ref_phase, lo, hi)
    got = np.asarray(freq.normalize_heatmap(freq.fft_steered_power(frame, t)))
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=1e-5)


@pytest.mark.parametrize("band", [(0.0, None), (2000.0, 20000.0)])
def test_peak_detection_matches_oracle(tiny_cfg, band):
    """freq.peak_detection == beam_forming_algorithm.py:37-48 verbatim,
    including the double slice by the lower band index (band[0] > 0)."""
    cfg = tiny_cfg
    t = freq.make_freq_tables(cfg, *band)
    rng = np.random.default_rng(44)
    for trial in range(3):
        frame = (rng.standard_normal(
            (cfg.n_microphones, cfg.n_samples)) * 0.2).astype(np.float32)
        power_f = np.asarray(freq.fft_power_spectrum(frame, t))
        ref = oracle.fft_peak_detection(
            power_f.astype(np.float64), 0.8, 0.1, t.lo,
            cfg.max_res_x, cfg.max_res_y)
        got = np.asarray(freq.peak_detection(power_f, t))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-7)


def test_peak_detection_threshold_gates(tiny_cfg):
    """Below threshold_lower nothing qualifies -> all-zero map."""
    t = freq.make_freq_tables(tiny_cfg, 0.0, None)
    F = t.hi - t.lo
    power_f = np.full((F, tiny_cfg.max_res_x, tiny_cfg.max_res_y), 1e-6,
                      np.float32)
    got = np.asarray(freq.peak_detection(power_f, t, 0.8, 0.1))
    assert np.all(got == 0.0)


def test_mvdr_ill_conditioned_single_source(tiny_cfg):
    """Single coherent source with alpha -> 1 drives R toward rank-1; the
    trace-scaled loading must keep the Cholesky solve finite and the peak
    on the source (round-2 robustness gate)."""
    cfg = tiny_cfg
    tx, ty = 6, 2
    t = freq.make_freq_tables(cfg, 2000.0, 20000.0)
    state = freq.init_covariance(t)
    frame = _delayed_source_frame(cfg, tx, ty, seed=77)   # noiseless
    for _ in range(8):
        state = freq.update_covariance(state, frame, t, alpha=0.999)
    img = np.asarray(freq.mvdr_power(state, t))
    assert np.all(np.isfinite(img))
    x, y = np.unravel_index(img.argmax(), img.shape)
    assert abs(x - tx) <= 1 and abs(y - ty) <= 1


def test_mvdr_loading_sweep(tiny_cfg):
    """The Capon map must stay finite and localized over four decades of
    diagonal loading."""
    cfg = tiny_cfg
    tx, ty = 4, 3
    t = freq.make_freq_tables(cfg, 2000.0, 20000.0)
    state = freq.init_covariance(t)
    rng = np.random.default_rng(78)
    for seed in range(3):
        frame = _delayed_source_frame(cfg, tx, ty, seed=80 + seed)
        frame += 0.02 * rng.standard_normal(frame.shape).astype(np.float32)
        state = freq.update_covariance(state, frame, t)
    for load in (1e-5, 1e-3, 1e-1, 1.0):
        img = np.asarray(freq.mvdr_power(state, t, diagonal_loading=load))
        assert np.all(np.isfinite(img)), f"load={load}"
        x, y = np.unravel_index(img.argmax(), img.shape)
        assert abs(x - tx) <= 1 and abs(y - ty) <= 1, f"load={load}"


def test_solve_hermitian_matches_numpy(tiny_cfg, rng):
    """Cholesky block solve == numpy complex solve on random Hermitian-PD
    systems."""
    F, M, K = 3, 6, 2
    A = rng.standard_normal((F, M, M)) + 1j * rng.standard_normal((F, M, M))
    R = A @ A.conj().transpose(0, 2, 1) + 0.1 * np.eye(M)
    b = rng.standard_normal((F, M, K)) + 1j * rng.standard_normal((F, M, K))
    want = np.linalg.solve(R, b)
    xr, xi = freq._solve_hermitian(
        np.float32(R.real), np.float32(R.imag),
        np.float32(b.real), np.float32(b.imag))
    got = np.asarray(xr) + 1j * np.asarray(xi)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_invert_hermitian_matches_numpy():
    """The blocked potri-style inversion (the round-4 refresh path) ==
    float64 numpy inverse, at sizes that exercise BOTH the batched-leaf
    trtri merge (n/base a power of two) and the odd-size fallback.

    Local rng: the session fixture's draw order calibrates the long-run
    drift gates downstream — consuming it here would shift their noise
    realizations."""
    rng = np.random.default_rng(42)
    for F, M, base in [(3, 32, 8), (2, 7, 8), (1, 16, 4)]:
        A = (rng.standard_normal((F, M, M))
             + 1j * rng.standard_normal((F, M, M)))
        R = A @ A.conj().transpose(0, 2, 1) + 0.5 * np.eye(M)
        want = np.linalg.inv(R)
        pr, pi = freq.invert_hermitian(
            np.float32(R.real), np.float32(R.imag), base=base)
        got = np.asarray(pr) + 1j * np.asarray(pi)
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)
        # near-Hermitian on well-conditioned input (the f32 embedding
        # factorization breaks exact structure by ~cond*eps; see the
        # invert_hermitian docstring for why it must NOT be re-projected)
        np.testing.assert_allclose(np.asarray(pr),
                                   np.asarray(pr).transpose(0, 2, 1),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(pi),
                                   -np.asarray(pi).transpose(0, 2, 1),
                                   atol=1e-4)


# ---------------------------------------------------------------------------
# Streaming inverse covariance (RLS / Sherman-Morrison) — real-time MVDR
# ---------------------------------------------------------------------------

def _manual_ema_inverse(frames, t, load, alpha):
    """numpy ground truth: P_N = inv(M_N), M_0 = (1+load) I,
    M_t = alpha M + (1-alpha) s s^H per frame."""
    F = t.hi - t.lo
    M = np.asarray(t.phase_re).shape[1]
    dft = np.asarray(t.dft_re) + 1j * np.asarray(t.dft_im)
    active = np.asarray(t.adaptive)
    Mat = np.broadcast_to((1.0 + load) * np.eye(M), (F, M, M)).astype(
        np.complex128).copy()
    for fr in frames:
        S = fr[active].astype(np.float64) @ dft.astype(np.complex128)  # (M,F)
        s = S.T                                                        # (F,M)
        outer = s[:, :, None] * s.conj()[:, None, :]
        Mat = alpha * Mat + (1 - alpha) * outer
    return np.linalg.inv(Mat)


def test_precision_update_matches_inverse(tiny_cfg, rng):
    cfg = tiny_cfg
    t = freq.make_freq_tables(cfg, 2000.0, 20000.0)
    frames = [synth_frame(cfg, rng) for _ in range(5)]
    st = freq.init_precision(t, load=1e-2)
    for fr in frames:
        st = freq.update_precision(st, fr, t, alpha=0.9)
    want = _manual_ema_inverse(frames, t, 1e-2, 0.9)
    got = np.asarray(st.P_re) + 1j * np.asarray(st.P_im)
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-4)


def test_precision_block_matches_sequential(tiny_cfg, rng):
    """The rank-B Woodbury block update equals B sequential per-frame
    Sherman-Morrison updates (same math, one pass over the state), on
    both the first-ever batch (covariance replacement quirk) and a warm
    state."""
    cfg = tiny_cfg
    t = freq.make_freq_tables(cfg, 2000.0, 20000.0)
    frames = np.stack([synth_frame(cfg, rng) for _ in range(6)])

    seq = freq.init_precision(t, load=1e-2)
    for fr in frames[:3]:
        seq = freq.update_precision(seq, fr, t, alpha=0.9)
    blk = freq.update_precision_block(
        freq.init_precision(t, load=1e-2), frames[:3], t, alpha=0.9)
    for a, b in ((seq.P_re, blk.P_re), (seq.P_im, blk.P_im),
                 (seq.cov.R_re, blk.cov.R_re),
                 (seq.cov.R_im, blk.cov.R_im)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
    assert int(blk.cov.count) == 3

    # warm continuation
    for fr in frames[3:]:
        seq = freq.update_precision(seq, fr, t, alpha=0.9)
    blk = freq.update_precision_block(blk, frames[3:], t, alpha=0.9)
    np.testing.assert_allclose(np.asarray(seq.P_re), np.asarray(blk.P_re),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(seq.cov.R_re),
                               np.asarray(blk.cov.R_re),
                               rtol=1e-4, atol=1e-5)

    # a single BATCHED update_precision call must also equal the
    # per-frame loop — including the covariance co-estimate (it used to
    # take a batch-mean EMA step, so refresh would snap P onto a
    # different estimate for B > 1)
    one = freq.update_precision(
        freq.init_precision(t, load=1e-2), frames, t, alpha=0.9)
    seq2 = freq.init_precision(t, load=1e-2)
    for fr in frames:
        seq2 = freq.update_precision(seq2, fr, t, alpha=0.9)
    np.testing.assert_allclose(np.asarray(one.P_re), np.asarray(seq2.P_re),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(one.cov.R_re),
                               np.asarray(seq2.cov.R_re),
                               rtol=1e-4, atol=1e-5)
    assert int(one.cov.count) == int(seq2.cov.count) == len(frames)


def test_mvdr_maps_scan_matches_sequential(tiny_cfg, rng):
    """The subspace-recursive per-frame Capon maps (one full quadratic
    form + a B-step scan) must equal the sequential per-frame
    update+map loop exactly, and return the same posterior state."""
    cfg = tiny_cfg
    t = freq.make_freq_tables(cfg, 2000.0, 20000.0)
    frames = np.stack([synth_frame(cfg, rng) for _ in range(6)])
    st = freq.init_precision(t, load=1e-2)
    s = st
    seq = []
    for fr in frames:
        s = freq.update_precision(s, fr, t, alpha=0.9)
        seq.append(np.asarray(freq.mvdr_power_precision(s, t)))
    maps, s2 = freq.mvdr_maps_scan(st, frames, t, alpha=0.9)
    np.testing.assert_allclose(np.asarray(maps), np.stack(seq),
                               rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s2.P_re), np.asarray(s.P_re),
                               rtol=1e-4, atol=1e-5)


def test_mvdr_maps_scan_deep_block(tiny_cfg, rng):
    """B=24 spans a chunk boundary (chunk depth 16) and stresses the
    coefficient-matrix path: per-step factors grow like alpha^-t, so a
    deep block amplifies any mis-ordering that a 6-frame block would
    hide.  Measured: maps 1.6e-4 max rel vs the sequential loop (the
    pre-chunking formulation drifted to 8e-3 here); the P comparison is
    chained-Woodbury vs sequential Sherman-Morrison f32 drift on tiny
    entries (abs ~4e-5)."""
    cfg = tiny_cfg
    t = freq.make_freq_tables(cfg, 2000.0, 20000.0)
    frames = np.stack([synth_frame(cfg, rng, freq=2500.0 + 450.0 * i)
                       for i in range(24)])
    st = freq.init_precision(t, load=1e-2)
    s = st
    seq = []
    for fr in frames:
        s = freq.update_precision(s, fr, t, alpha=0.9)
        seq.append(np.asarray(freq.mvdr_power_precision(s, t)))
    maps, s2 = freq.mvdr_maps_scan(st, frames, t, alpha=0.9)
    np.testing.assert_allclose(np.asarray(maps), np.stack(seq),
                               rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s2.P_re), np.asarray(s.P_re),
                               rtol=1e-3, atol=2e-4)


def test_mvdr_maps_scan_carried_d_matches_blocked(tiny_cfg):
    """Streaming carry: four B=16 calls threading d0/return_d run the
    SAME op sequence as one B=64 call (the chunk boundary and the call
    boundary are the same code path), so the O(F M^2 D) quadratic form
    runs once instead of four times.  Exact equality is impossible —
    the standalone-jitted mvdr_d0 fuses/reassociates differently than
    the inlined evaluation (ulp level), and any ulp at frame 0
    amplifies by ~alpha^-t (850x over the 64-frame window) — so the
    gate is ulp-amplification-scale on the first block and drift-scale
    on the rest (measured 2.6e-4 / 1.4e-2)."""
    cfg = tiny_cfg
    t = freq.make_freq_tables(cfg, 2000.0, 20000.0)
    # OWN seeded generator: these gates sit at the drift-amplified
    # tolerance edge, so the data must not depend on how many draws
    # earlier tests consumed from the shared session rng
    rng = np.random.default_rng(31)
    frames = np.stack([synth_frame(cfg, rng, freq=2500.0 + 120.0 * i)
                       for i in range(64)])
    st0 = freq.init_precision(t, load=1e-2)
    ref, st_ref = freq.mvdr_maps_scan(st0, frames, t, alpha=0.9)

    st = st0
    dq = freq.mvdr_d0(st, t)
    parts = []
    for b in range(4):
        m, st, dq = freq.mvdr_maps_scan(st, frames[b * 16:(b + 1) * 16],
                                        t, alpha=0.9, d0=dq, return_d=True)
        parts.append(np.asarray(m))
    got = np.concatenate(parts)
    np.testing.assert_allclose(got[:16], np.asarray(ref)[:16],
                               rtol=1e-3, atol=1e-8)
    np.testing.assert_allclose(got, np.asarray(ref), rtol=5e-2, atol=1e-6)
    np.testing.assert_allclose(np.asarray(st.P_re), np.asarray(st_ref.P_re),
                               rtol=5e-2, atol=1e-4)


def test_refresh_interval_bounds_long_run_drift(tiny_cfg, rng):
    """The refresh cadence MUST be alpha-aware: every recursion step
    amplifies f32 rounding error by 1/alpha, so at alpha=0.9 a fixed
    256-frame interval overflows to NaN maps around frame ~110 (then the
    1e-12 denominator clamp sprays 1e12 spikes), while the
    freq.refresh_interval cadence tracks the exact loaded f64 estimator
    at the ~1e-3 level indefinitely.  320 frames in 16-frame blocks —
    the production full-rate shape."""
    cfg = tiny_cfg
    alpha = 0.9
    t = freq.make_freq_tables(cfg, 2000.0, 20000.0)
    NB, B = 20, 16
    frames = np.stack([
        synth_frame(cfg, rng, freq=2300.0 + 37.0 * i)
        + 0.03 * rng.standard_normal(
            (cfg.n_microphones, cfg.n_samples)).astype(np.float32)
        for i in range(NB * B)])

    def run(every):
        # mirrors the production process_fn: dq carried between calls
        # up to d0_carry_interval frames, re-measured after refresh
        carry_max = freq.d0_carry_interval(alpha)
        st = freq.init_precision(t)
        out, n, r, dq, dqc = [], 0, 0, None, 0
        for b in range(NB):
            if dq is None or dqc >= carry_max:
                dq = freq.mvdr_d0(st, t)
                dqc = 0
            m, st, dq = freq.mvdr_maps_scan(st, frames[b * B:(b + 1) * B],
                                            t, alpha=alpha, d0=dq,
                                            return_d=True)
            out.append(np.asarray(m).reshape(B, -1))
            n += B
            dqc += B
            if n - r >= every:
                st = freq.refresh_precision(st, t)
                dq = None
                r = n
        return np.concatenate(out)

    # the old fixed cadence is broken at alpha=0.9: NaN maps mid-run
    assert np.isnan(run(256)).any(), \
        "if this starts passing, tighten refresh_interval's rationale"

    every = freq.refresh_interval(alpha)
    assert 32 <= every <= 128            # ~70 at alpha=0.9
    maps = run(every)
    assert np.isfinite(maps).all()

    # f64 SAME-TRAJECTORY oracle: identical recursion (per-frame
    # Sherman-Morrison + EMA covariance with first-frame replacement)
    # and identical refresh points, in complex128 — so the comparison
    # isolates f32 ROUNDING drift from the (by-design) mid-interval
    # load decay of the RLS estimator.
    import jax.numpy as jnp
    sr, si = freq._frame_fft(jnp.asarray(frames), t)
    S = (np.asarray(sr).astype(np.float64)
         + 1j * np.asarray(si).astype(np.float64))
    a = (np.asarray(t.phase_re).astype(np.float64)
         - 1j * np.asarray(t.phase_im).astype(np.float64))
    load = float(np.asarray(freq.init_precision(t).load))
    F, M = S.shape[1], S.shape[2]
    eyeM = np.broadcast_to(np.eye(M), (F, M, M))
    cov = eyeM.astype(np.complex128)          # init_covariance
    P = eyeM / (1.0 + load) + 0j
    beta = (1 - alpha) / alpha
    errs, n, r = [], 0, 0
    for tt in range(NB * B):
        s_t = S[tt]
        Ps = np.einsum("fmn,fn->fm", P, s_t)
        g = np.real(np.einsum("fm,fm->f", np.conj(s_t), Ps))
        kappa = beta / (1 + beta * g)
        P = (P - kappa[:, None, None] * Ps[:, :, None]
             * np.conj(Ps)[:, None, :]) / alpha
        outer = s_t[:, :, None] * np.conj(s_t)[:, None, :]
        cov = outer if tt == 0 else alpha * cov + (1 - alpha) * outer
        Pa = np.einsum("fmn,fnd->fmd", P, a)
        d = np.real(np.einsum("fmd,fmd->fd", np.conj(a), Pa))
        truth = (1.0 / np.maximum(d, 1e-12)).sum(axis=0)
        errs.append(np.max(np.abs(maps[tt] - truth)
                           / (np.abs(truth) + 1e-12)))
        n += 1
        if n % B == 0 and n - r >= every:     # same block-refresh points
            # trace-scaled loading, matching freq._loaded
            lf = load * np.real(np.einsum("fmm->f", cov)) / M + 1e-12
            P = np.linalg.inv(cov + lf[:, None, None] * eyeM)
            r = n
    # measured: ~1.9e-2 worst-direction at the end of a refresh
    # interval (63 frames of alpha^-1 amplification), argmax exact on
    # every frame; the broken 256-cadence NaNs out instead
    assert max(errs) < 0.05, (max(errs), int(np.argmax(errs)))


def test_refresh_interval_bounds_listening_drift(tiny_cfg, rng):
    """The adaptive-LISTENING path shares the drifting recursion: at the
    old fixed 256-frame cadence the beam weights overflow (measured
    |beam| ~1e11 then NaN — full-scale garbage into the audio sink); at
    the alpha-aware cadence 320 frames of steered listening stay finite,
    bounded, and correlated with the steered tone."""
    cfg = tiny_cfg
    alpha = 0.9
    t = freq.make_freq_tables(cfg, 100.0)
    NB, B = 20, 16
    tt = np.arange(cfg.n_samples) / cfg.sample_rate
    tone = np.sin(2 * np.pi * 2500.0 * tt).astype(np.float32)
    frames = np.stack([
        (np.tile(tone, (cfg.n_microphones, 1)) * 0.2
         + 0.02 * rng.standard_normal((cfg.n_microphones, cfg.n_samples))
         ).astype(np.float32) for _ in range(NB * B)])
    d_center = (t.res_x // 2) * t.res_y + t.res_y // 2

    def run(every):
        st = freq.init_precision(t)
        outs, n, r = [], 0, 0
        for b in range(NB):
            beams, st = freq.mvdr_listen_step(
                st, frames[b * B:(b + 1) * B], t, d_center, alpha=alpha)
            outs.append(np.asarray(beams))
            n += B
            if n - r >= every:
                st = freq.refresh_precision(st, t)
                r = n
        return np.concatenate(outs)

    bad = run(256)
    assert not np.isfinite(bad).all(), \
        "if this starts passing, revisit refresh_interval's rationale"

    beams = run(freq.refresh_interval(alpha))
    assert np.isfinite(beams).all()
    assert np.max(np.abs(beams)) < 10.0
    corr = np.corrcoef(beams[-16:].ravel(), np.tile(tone, 16))[0, 1]
    assert corr > 0.5, corr


def test_precision_refresh_bounds_drift(tiny_cfg, rng):
    """refresh_precision re-factorizes P from the co-tracked covariance."""
    cfg = tiny_cfg
    t = freq.make_freq_tables(cfg, 2000.0, 20000.0)
    st = freq.init_precision(t, load=1e-3)
    for seed in range(4):
        st = freq.update_precision(st, synth_frame(cfg, rng), t)
    st2 = freq.refresh_precision(st, t)
    # after refresh, P is the exact inverse of the loaded covariance
    # (residual measured as R @ P - I, the direction the solve minimizes;
    # P @ R amplifies f32 residuals by cond(R))
    R_re, R_im = freq._loaded(st.cov, 1e-3)
    R = np.asarray(R_re) + 1j * np.asarray(R_im)
    P = np.asarray(st2.P_re) + 1j * np.asarray(st2.P_im)
    eye = np.broadcast_to(np.eye(R.shape[1]), R.shape)
    np.testing.assert_allclose(R @ P, eye, atol=5e-3)
    # and it agrees with the float64 inverse where the inverse is stable
    np.testing.assert_allclose(P, np.linalg.inv(R.astype(np.complex128)),
                               rtol=0.05, atol=0.05)


def test_mvdr_power_precision_localizes(tiny_cfg):
    """The streaming-inverse Capon map localizes like the exact one."""
    cfg = tiny_cfg
    tx, ty = 6, 2
    t = freq.make_freq_tables(cfg, 2000.0, 20000.0)
    st = freq.init_precision(t)
    rng = np.random.default_rng(91)
    for seed in range(4):
        frame = _delayed_source_frame(cfg, tx, ty, seed=90 + seed)
        frame += 0.02 * rng.standard_normal(frame.shape).astype(np.float32)
        st = freq.update_precision(st, frame, t)
    img = np.asarray(freq.mvdr_power_precision(st, t))
    assert np.all(np.isfinite(img))
    x, y = np.unravel_index(img.argmax(), img.shape)
    assert abs(x - tx) <= 1 and abs(y - ty) <= 1


def test_mvdr_beam_precision_matches_covariance_beam(tiny_cfg, rng):
    """The live adaptive-listening beam (weights straight from the
    streaming inverse P) must agree with the offline covariance-based
    mvdr_beam after an exact refresh (P == (R + load I)^-1 there)."""
    from conftest import synth_frame

    cfg = tiny_cfg
    t = freq.make_freq_tables(cfg, 2000.0, 20000.0)
    st = freq.init_precision(t, load=1e-2)
    frames = np.stack([synth_frame(cfg, rng) for _ in range(5)])
    st = freq.update_precision_block(st, frames, t, alpha=0.9)
    st = freq.refresh_precision(st, t)

    d = 3 * cfg.max_res_y + 2
    test = np.stack([synth_frame(cfg, rng) for _ in range(3)])
    got = np.asarray(freq.mvdr_beam_precision(st, t, test, d))
    # ground truth: solve against the identically-loaded covariance the
    # refresh used (trace-scaled loading, freq._loaded)
    R_re, R_im = freq._loaded(st.cov, st.load)
    x_re, x_im = freq._solve_hermitian(
        R_re, R_im,
        np.asarray(t.phase_re[:, :, d])[..., None],
        -np.asarray(t.phase_im[:, :, d])[..., None])
    a_re = np.asarray(t.phase_re[:, :, d])
    a_im = -np.asarray(t.phase_im[:, :, d])
    x_re, x_im = np.asarray(x_re)[..., 0], np.asarray(x_im)[..., 0]
    denom = np.maximum((a_re * x_re + a_im * x_im).sum(1), 1e-12)[:, None]
    want = np.asarray(freq._apply_beam_weights(
        test, t, (x_re / denom).astype(np.float32),
        (x_im / denom).astype(np.float32)))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)


def test_mvdr_listen_step_is_update_then_beam(tiny_cfg, rng):
    """mvdr_listen_step == update_precision_block then
    mvdr_beam_precision with the refreshed weights (one fused program)."""
    from conftest import synth_frame

    cfg = tiny_cfg
    t = freq.make_freq_tables(cfg, 2000.0, 20000.0)
    st = freq.init_precision(t)
    frames = np.stack([synth_frame(cfg, rng) for _ in range(4)])
    d = 2 * cfg.max_res_y + 1
    beams, st2 = freq.mvdr_listen_step(st, frames, t, d, alpha=0.9)
    want_state = freq.update_precision_block(st, frames, t, alpha=0.9)
    want = freq.mvdr_beam_precision(want_state, t, frames, d)
    np.testing.assert_allclose(np.asarray(beams), np.asarray(want),
                               rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(np.asarray(st2.P_re),
                               np.asarray(want_state.P_re),
                               rtol=1e-5, atol=1e-8)
    assert beams.shape == (4, cfg.n_samples)


def test_mvdr_listen_step_recovers_steered_source(tiny_cfg):
    """End-to-end adaptive listening: the fused step's beam output
    correlates with the source a reference mic hears."""
    cfg = tiny_cfg
    tx, ty = 4, 3
    t = freq.make_freq_tables(cfg, 0.0, None)
    st = freq.init_precision(t)
    frames = np.stack([_delayed_source_frame(cfg, tx, ty, seed=s)
                       for s in range(3)])
    d = tx * cfg.max_res_y + ty
    beams, st = freq.mvdr_listen_step(st, frames, t, d)
    active, _ = geometry.active_microphones(cfg)
    for i in range(3):
        c = np.corrcoef(np.asarray(beams[i]), frames[i][active[0]])[0, 1]
        assert abs(c) > 0.6, f"frame {i}: corr {c:.3f}"


def test_invert_hermitian_unrolled_matches_embedding(rng):
    """The unrolled complex potri (round 5 — replaces the embedding
    path whose jnp.linalg.cholesky While loop was the refresh wall)
    must match the embedding inverse in the same cond*eps class and the
    float64 truth."""
    F, M = 3, 48                      # odd-split + leaf sizes exercised
    C = (rng.standard_normal((F, M, 2 * M))
         + 1j * rng.standard_normal((F, M, 2 * M)))
    R = np.einsum("fmk,fnk->fmn", C, C.conj()) / (2 * M)
    R += 0.05 * np.eye(M)
    Rr = np.ascontiguousarray(R.real).astype(np.float32)
    Ri = np.ascontiguousarray(R.imag).astype(np.float32)
    Pr, Pi = freq.invert_hermitian_unrolled(Rr, Ri, leaf=16)
    P = np.asarray(Pr) + 1j * np.asarray(Pi)
    truth = np.linalg.inv(R)
    scale = abs(truth).max()
    assert abs(P - truth).max() / scale < 5e-5
    P0r, P0i = freq.invert_hermitian(Rr, Ri)
    P0 = np.asarray(P0r) + 1j * np.asarray(P0i)
    assert abs(P - P0).max() / scale < 5e-5


def test_mvdr_maps_scan_refresh_negative_artifact(tiny_cfg, rng):
    """freq.mvdr_maps_scan_refresh is the MEASURED-NEGATIVE overlap
    experiment kept as an artifact (see its docstring): its maps must
    be bit-identical to mvdr_maps_scan and its refreshed state must
    agree with refresh(post-block state) to the one-Woodbury-hop f32
    class it documents."""
    cfg = tiny_cfg
    t = freq.make_freq_tables(cfg, 100.0)
    B, alpha = 16, 0.9
    st1 = freq.init_precision(t)
    for i in range(4):      # enough history that cov is full-rank
        blk = rng.standard_normal(
            (B, cfg.n_microphones, cfg.n_samples)).astype(np.float32) * 0.1
        if i < 3:
            _, st1 = freq.mvdr_maps_scan(st1, blk, t)
    m_ref, st2, _ = freq.mvdr_maps_scan(st1, blk, t, return_d=True)
    m_new, st3, _ = freq.mvdr_maps_scan_refresh(st1, blk, t)
    np.testing.assert_array_equal(np.asarray(m_new), np.asarray(m_ref))
    np.testing.assert_allclose(np.asarray(st3.cov.R_re),
                               np.asarray(st2.cov.R_re), rtol=1e-6,
                               atol=1e-7)
    # the refreshed+advanced P carries the PRE-block loading decayed by
    # alpha^B (the recursion decays loading by design; refresh
    # re-anchors it — see the Newton-Schulz negative result): gate
    # against the float64 model inv(R_post + alpha^B * load_pre * I)
    M = cfg.n_microphones
    R_pre = (np.asarray(st1.cov.R_re, np.float64)
             + 1j * np.asarray(st1.cov.R_im, np.float64))
    load_pre = (st1.load * np.einsum("fmm->f", R_pre.real) / M + 1e-12)
    R_post = (np.asarray(st3.cov.R_re, np.float64)
              + 1j * np.asarray(st3.cov.R_im, np.float64))
    eye = np.eye(M)
    truth = np.linalg.inv(
        R_post + (alpha ** B * load_pre)[:, None, None] * eye)
    got = (np.asarray(st3.P_re, np.float64)
           + 1j * np.asarray(st3.P_im, np.float64))
    scale = abs(truth).max()
    assert abs(got - truth).max() / scale < 2e-3
