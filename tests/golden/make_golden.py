"""Regenerate the golden heatmap fixtures.

Run on CPU at 'highest' matmul precision (bit-stable across rounds there):

    python tests/golden/make_golden.py

Two fixtures:
* tiny_heatmaps.npz       — Config.tiny(), all 6 algorithms (round 1)
* reference_heatmaps.npz  — the full reference shape (57x32 grid, 256
  mics) for every algorithm + the FFT-reference backend (round 2)
"""

import os
import sys

import numpy as np


def main():
    force = "--force" in sys.argv
    import jax
    jax.config.update("jax_platforms", "cpu")
    import zybo_rt_sampler_image_detection_tpu as zrt
    from zybo_rt_sampler_image_detection_tpu.ops import beamform, freq

    out_dir = os.path.dirname(os.path.abspath(__file__))

    def fresh(name):
        path = os.path.join(out_dir, name)
        if os.path.exists(path) and not force:
            # goldens exist to pin history — never regenerate silently
            print(f"{name} exists; skipping (use --force to overwrite)")
            return None
        return path

    # WARNING (learned round 3): --force regenerates BOTH fixtures, and
    # this script does NOT bit-reproduce the round-1 tiny fixture (its
    # frame recipe drifted) — after a forced regeneration, diff every
    # entry against `git show HEAD:tests/golden/<name>` and restore any
    # fixture whose change you cannot attribute to the code change that
    # motivated the regeneration.

    def build(cfg, frame, fft_band):
        res = {"frame": frame}
        for algo in ("pad", "lerp", "convolve", "hybrid", "truncated"):
            tables = beamform.make_tables(cfg, algo, cache=False)
            res[algo] = np.asarray(beamform.steered_power(frame, tables))
        ft = freq.make_freq_tables(cfg, *fft_band)
        res["fft"] = np.asarray(freq.fft_steered_power(frame, ft))
        return res

    path = fresh("tiny_heatmaps.npz")
    if path:
        rng = np.random.default_rng(1234)
        tiny = zrt.Config.tiny()
        frame = (rng.standard_normal(
            (tiny.n_microphones, tiny.n_samples)) * 0.1).astype(np.float32)
        np.savez(path, **build(tiny, frame, (100.0, 20000.0)))

    path = fresh("reference_heatmaps.npz")
    if path:
        ref = zrt.Config()
        rng = np.random.default_rng(4321)
        frame = (rng.standard_normal(
            (ref.n_microphones, ref.n_samples)) * 0.1).astype(np.float32)
        res = build(ref, frame, (100.0, 20000.0))
        # the shipped FFT-backend profile (13x13, c=343, camera offset)
        fcfg = zrt.Config.fft_reference()
        ftr = freq.make_freq_tables(fcfg)
        res["fft_reference_profile"] = np.asarray(
            freq.fft_steered_power(frame, ftr))
        np.savez(path, **res)
    print("done")


if __name__ == "__main__":
    main()
