from . import geometry, oracle, beamform, freq, kalman, pallas_kernels

__all__ = ["geometry", "oracle", "beamform", "freq", "kalman",
           "pallas_kernels"]
