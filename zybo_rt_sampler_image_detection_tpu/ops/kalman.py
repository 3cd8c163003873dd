"""Small Kalman filters.

* :class:`KalmanFilter3D` — the 6-state constant-velocity position filter
  used to smooth the heatmap peak, numerically identical to the Eigen
  implementation in ``PC/src/kf.hpp:36-165`` (A/Q/H/R constants verbatim).
  The matrices are 6x6; NumPy is the right tool — no device round-trip for
  a per-frame 3-vector.  A jitted batched variant is provided for running
  many filters (e.g. per-track) on device.

* :class:`KalmanBoxTracker` state math lives in ``models/sort.py`` (the
  7-state bbox filter of the vendored SORT).
"""

from __future__ import annotations

import numpy as np


class KalmanFilter3D:
    """Linear 3-D constant-velocity filter (pos + vel)."""

    def __init__(self):
        A = np.eye(6, dtype=np.float32)
        A[0, 3] = A[1, 4] = A[2, 5] = 1.0
        self.A = A
        self.Q = np.eye(6, dtype=np.float32) * 0.1
        self.H = np.zeros((3, 6), dtype=np.float32)
        self.H[0, 0] = self.H[1, 1] = self.H[2, 2] = 1.0
        self.R = np.eye(3, dtype=np.float32) * 0.1
        self.P = np.eye(6, dtype=np.float32)
        self.x = np.zeros(6, dtype=np.float32)

    def update(self, measurement) -> None:
        """Predict + correct with a new (x, y, z) measurement
        (``kf.hpp:85-99``)."""
        z = np.asarray(measurement, dtype=np.float32)
        A, Q, H, R = self.A, self.Q, self.H, self.R
        self.x = A @ self.x
        self.P = A @ self.P @ A.T + Q
        S = H @ self.P @ H.T + R
        K = self.P @ H.T @ np.linalg.inv(S)
        y = z - H @ self.x
        self.x = self.x + K @ y
        self.P = (np.eye(6, dtype=np.float32) - K @ H) @ self.P

    def get_state(self) -> np.ndarray:
        """Current position estimate (``kf.hpp:106-109``)."""
        return self.x[:3].copy()

    def predict(self, n: int) -> np.ndarray:
        """Position n steps ahead (``kf.hpp:117-130``; useful horizon <= ~5
        steps per the reference's own note, ``kf.hpp:17-19``)."""
        An = self.A.copy()
        xn = self.x.copy()
        for _ in range(n):
            xn = An @ xn
            An = An @ self.A
        return xn[:3]


def batched_kf3d_update(x, P, z):
    """Vectorized update for (..., 6) states / (..., 6, 6) covariances /
    (..., 3) measurements — drop-in for running a filter bank under jit."""
    import jax
    import jax.numpy as jnp

    A = jnp.eye(6).at[0, 3].set(1.0).at[1, 4].set(1.0).at[2, 5].set(1.0)
    Q = jnp.eye(6) * 0.1
    H = jnp.zeros((3, 6)).at[0, 0].set(1.0).at[1, 1].set(1.0).at[2, 2].set(1.0)
    R = jnp.eye(3) * 0.1

    # explicit HIGHEST precision: the default truncates einsum operands
    # to bf16 (even on CPU), and covariance drift compounds every frame
    hp = jax.lax.Precision.HIGHEST
    x = jnp.einsum("ij,...j->...i", A, x, precision=hp)
    P = jnp.einsum("ij,...jk,lk->...il", A, P, A, precision=hp) + Q
    S = jnp.einsum("ij,...jk,lk->...il", H, P, H, precision=hp) + R
    K = jnp.einsum("...ij,kj,...kl->...il", P, H, jnp.linalg.inv(S),
                   precision=hp)
    y = z - jnp.einsum("ij,...j->...i", H, x, precision=hp)
    x = x + jnp.einsum("...ij,...j->...i", K, y, precision=hp)
    P = jnp.einsum(
        "...ij,...jk->...ik",
        jnp.eye(6) - jnp.einsum("...ij,jk->...ik", K, H, precision=hp),
        P, precision=hp)
    return x, P
