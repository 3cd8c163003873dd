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

import os as _os

# Persistent XLA compilation cache: compiles through the tunneled TPU are
# slow (30 s - minutes) and every CLI invocation is a fresh process.  Opt
# out with ZRT_NO_COMPILE_CACHE=1.
if not _os.environ.get("ZRT_NO_COMPILE_CACHE"):
    try:
        import jax as _jax

        # Only for TPU sessions: CPU test runs don't need it, and sharing
        # AOT'd CPU executables across runs triggers machine-feature
        # mismatch warnings.
        if (_jax.config.jax_platforms or "").lower() not in ("cpu",):
            _cache = _os.environ.get(
                "ZRT_COMPILE_CACHE_DIR",
                _os.path.expanduser("~/.cache/zrt_jax_cache"))
            _os.makedirs(_cache, exist_ok=True)
            _jax.config.update("jax_compilation_cache_dir", _cache)
            _jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 0.0)
            _jax.config.update(
                "jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass

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
