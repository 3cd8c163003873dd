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
