#!/usr/bin/env python
"""Headline benchmark: steered-power heatmaps/second, 64 ch x 65x65 grid.

This is the BASELINE.json north-star metric (>= 1000 heatmaps/s on one
v5e chip).  It measures the sustained throughput of the flagship fused
steered-power path (lerp delay-and-sum — the reference's default
quality/speed point) with device-resident frame batches, i.e. the
steady-state the double-buffered ingest feeds.

Prints exactly one JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N/1000}
"""

import json
import sys
import time

import numpy as np


def main() -> None:
    import jax

    import zybo_rt_sampler_image_detection_tpu as zrt
    from zybo_rt_sampler_image_detection_tpu.ops import beamform
    from zybo_rt_sampler_image_detection_tpu.ops.pallas_kernels import (
        FusedBeamformer,
    )

    cfg = zrt.Config.northstar()
    tables = beamform.make_lerp_tables(cfg)
    fused = FusedBeamformer(tables)

    B = 512
    rng = np.random.default_rng(0)
    frames = rng.standard_normal(
        (B, cfg.n_microphones, cfg.n_samples)
    ).astype(np.float32)
    frames_dev = jax.device_put(frames)

    xla_fn = jax.jit(lambda f: beamform.steered_power(f, tables))

    def timed(fn, n_iter=8):
        fn(frames_dev).block_until_ready()          # compile + warm
        t0 = time.perf_counter()
        out = None
        for _ in range(n_iter):
            out = fn(frames_dev)
        out.block_until_ready()
        dt = time.perf_counter() - t0
        return (B * n_iter) / dt

    candidates = {"xla": timed(xla_fn)}
    if fused.fits_vmem:
        candidates["pallas"] = timed(fused._call)
    value = max(candidates.values())

    print(json.dumps({
        "metric": "steered_power_heatmaps_per_sec_64ch_65x65",
        "value": round(value, 1),
        "unit": "heatmaps/s",
        "vs_baseline": round(value / 1000.0, 3),
    }))
    print(f"# paths: { {k: round(v,1) for k, v in candidates.items()} } "
          f"backend={jax.default_backend()}", file=sys.stderr)


if __name__ == "__main__":
    main()
