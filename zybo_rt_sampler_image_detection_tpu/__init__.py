"""zybo_rt_sampler_image_detection_tpu — a TPU-native acoustic camera.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
``acoustic-warfare/zybo-rt-sampler-image-detection``: real-time delay-and-sum
/ FFT-domain / MVDR beamforming over a microphone-array UDP stream, steered
audio playback, YOLO detection + SORT tracking, sensor fusion, and live
heatmap/web visualization — with the per-frame compute expressed as a small
number of jit-compiled device programs instead of forked C processes.

Quick start::

    import zybo_rt_sampler_image_detection_tpu as zrt
    cfg = zrt.Config()
    tables = zrt.ops.beamform.make_lerp_tables(cfg)
    heatmap = zrt.ops.beamform.steered_power(frame, tables)   # (X, Y)
"""

from . import config as _config
from .config import Config, REFERENCE_DEAD_MICS
from . import ops
from . import ingest
from . import parallel
from . import utils
from . import models

__version__ = "0.1.0"
__all__ = ["Config", "REFERENCE_DEAD_MICS", "ops", "ingest", "parallel",
           "utils"]
