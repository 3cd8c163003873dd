"""Device-mesh scaling for the acoustic pipeline.

The reference's only parallelism is process-level (fork'd receiver, AVX2
lanes, serial 1824-direction loop — SURVEY.md §2.4).  Here the two natural
compute axes shard over a ``jax.sharding.Mesh``:

* ``data``  — the frame batch (pure DP; frames are independent);
* ``model`` — the steering-direction axis of the delay-line weight matrix
  (the tensor-parallel analog: W's D rows split across chips, each chip
  produces its slice of the heatmap, and XLA inserts the all-gather that
  assembles the full image at the output sharding boundary).

Both shardings ride ICI via collectives the SPMD partitioner inserts; DCN
is never needed for a single-host array.  The same mesh carries the YOLO
training step (DP over images + grad psum) in ``models/train.py``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import beamform
from ..ops.beamform import SteeringTables


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """A (data, model) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    dev = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(dev, axis_names=("data", "model"))


def shard_tables(t: SteeringTables, mesh: Mesh) -> SteeringTables:
    """Lay out steering tables for the mesh: the direction axis of W (and
    of the correction tensors) splits over ``model`` (zero-padded to a
    multiple); small per-mic arrays replicate."""
    d_model = mesh.shape["model"]
    D = t.W.shape[0]
    if D % d_model:
        pad = d_model - D % d_model
        Wc = t.Wc
        if Wc is not None:
            Wc = jnp.concatenate(
                [Wc, jnp.zeros((Wc.shape[0], pad) + Wc.shape[2:],
                               Wc.dtype)], axis=1)
        t = dataclasses.replace(
            t,
            W=jnp.concatenate(
                [t.W, jnp.zeros((pad,) + t.W.shape[1:], t.W.dtype)], axis=0),
            Wc=Wc)

    def put(x, spec):
        return None if x is None else jax.device_put(
            x, NamedSharding(mesh, spec))

    return dataclasses.replace(
        t,
        W=put(t.W, P("model", None, None)),
        Wc=put(t.Wc, P(None, "model", None, None)),
        adaptive=put(t.adaptive, P()),
    )


def sharded_steered_power(mesh: Mesh, t: SteeringTables):
    """pjit'd heatmap: frames shard over ``data``, the direction axis of
    the contraction over ``model`` (driven by W's committed sharding).

    Returns ``fn(frames (B, channels, N)) -> (B, X, Y)``; B must divide by
    the data-axis size.  Corrections are position-local per direction, so
    the scatter partitions with W and no cross-shard traffic occurs before
    the output all-gather.
    """
    D = t.res_x * t.res_y      # true direction count (W may be padded)

    def fn(frames):
        beams = beamform.steered_beams(frames, t)          # (B, Dp, N)
        beams = beams / jnp.asarray(t.n_mics, beams.dtype)
        p = jnp.mean(beams * beams, axis=-1)[:, :D]
        return p.reshape(frames.shape[0], t.res_x, t.res_y)

    return jax.jit(
        fn,
        in_shardings=NamedSharding(mesh, P("data", None, None)),
        out_shardings=NamedSharding(mesh, P("data", None, None)),
    )


def sharded_fused_power(mesh: Mesh, t: SteeringTables, tile_d: int = 256,
                        chunk_b: Optional[int] = None,
                        interpret: Optional[bool] = None):
    """Multi-chip fused path: each device runs the Pallas steered-power
    kernel on its (data shard of frames) x (model shard of directions);
    XLA gathers the (B, X, Y) map at the output boundary.

    ``t`` must come from :func:`shard_tables` (direction axis padded to a
    model-axis multiple).  Returns ``fn(frames) -> (B, X, Y)``.
    """
    from jax import shard_map

    from ..ops import pallas_kernels as pk

    n_model = mesh.shape["model"]
    DP_total, T, M = t.W.shape
    assert DP_total % n_model == 0
    D_loc = DP_total // n_model
    D_true = t.res_x * t.res_y
    if interpret is None:
        # decide by the MESH's devices: a CPU mesh under a TPU-default
        # backend (the dryrun case) must interpret, and vice versa
        interpret = mesh.devices.flat[0].platform != "tpu"

    # Per-shard variant selection (full / tchunk) via FusedBeamformer on a
    # local-shape slice of the tables — a reference-shape shard would blow
    # VMEM in the full variant just like on one chip.
    t_loc = dataclasses.replace(
        t,
        W=jax.device_put(np.asarray(t.W)[:D_loc], jax.devices()[0]),
        Wc=None if t.Wc is None else jax.device_put(
            np.asarray(t.Wc)[:, :D_loc], jax.devices()[0]))
    selector = pk.FusedBeamformer(
        t_loc, tile_d=min(tile_d, D_loc), chunk_b=chunk_b,
        interpret=interpret)
    meta = selector.meta
    fwd = {"tchunk": pk._fused_forward_tchunk}.get(
        selector.variant, pk._fused_forward)

    has_wc = t.Wc is not None

    def local(frames, W, Wc, adaptive):
        return fwd(frames, W, Wc if has_wc else None, adaptive, meta)

    wc_arg = t.Wc if has_wc else jnp.zeros((1,), t.W.dtype)
    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P("data", None, None), P("model", None, None),
                  P(None, "model", None, None) if has_wc else P(None),
                  P(None)),
        out_specs=P("data", "model"),
        check_vma=False,
    )

    @jax.jit
    def run(frames):
        flat = fn(frames, t.W, wc_arg, t.adaptive)     # (B, DP_total)
        return flat[:, :D_true].reshape(frames.shape[0], t.res_x, t.res_y)

    return run
