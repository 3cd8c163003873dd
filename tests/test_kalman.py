"""KalmanFilter3D parity with the Eigen implementation's semantics
(kf.hpp DEBUG harness) + smoothing property."""

import numpy as np

from zybo_rt_sampler_image_detection_tpu.ops.kalman import KalmanFilter3D


def test_tracks_constant_velocity():
    kf = KalmanFilter3D()
    for i in range(30):
        kf.update([float(i), 2.0 * i, 0.0])
    x = kf.get_state()
    assert abs(x[0] - 29.0) < 1.0
    assert abs(x[1] - 58.0) < 2.0
    # kf.hpp:117-130 compounds the transition (An = An*A inside the loop),
    # so predict(N) applies A^(N(N+1)/2): predict(3) => x + 6*v = 35.
    p = kf.predict(3)
    assert abs(p[0] - 35.0) < 1.5


def test_smooths_noise():
    rng = np.random.default_rng(0)
    kf = KalmanFilter3D()
    errs, raw = [], []
    for i in range(100):
        noise = rng.normal(0, 1.0, 3)
        z = np.array([5.0, 7.0, 0.0]) + noise
        kf.update(z)
        if i > 20:
            errs.append(np.abs(kf.get_state() - [5.0, 7.0, 0.0]).max())
            raw.append(np.abs(noise).max())
    # the reference's Q=R=0.1 constants smooth only mildly; the filtered
    # estimate must still beat the raw measurements.
    assert np.mean(errs) < np.mean(raw)


def test_reference_debug_sequence():
    """The kf.hpp DEBUG harness sequence converges toward the measurements
    without diverging."""
    kf = KalmanFilter3D()
    meas = [(i + 1.0, 2.0 ** i, 0.0) for i in range(10)]
    for m in meas:
        kf.update(m)
    s = kf.get_state()
    assert 9.0 < s[0] < 11.0
    assert np.isfinite(kf.predict(5)).all()
