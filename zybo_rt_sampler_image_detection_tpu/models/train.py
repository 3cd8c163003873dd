"""YOLO detector training (optax), data-parallel over the device mesh.

Replaces the reference's Ultralytics ``model.train`` wrapper
(``image-detection/src/run_object_oriented.py:13-19``) with an explicit
JAX training loop: anchor/cell target assignment on the host, a jitted
loss/step on device, and DP sharding over the ``data`` mesh axis — the
SPMD partitioner turns the batch-mean loss into a gradient all-reduce over
ICI, no hand-written collectives.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .yolo import TinyYolo, YoloConfig, init_params


@dataclasses.dataclass
class TrainState:
    variables: dict
    opt_state: optax.OptState
    step: int = 0


def build_targets(cfg: YoloConfig, boxes: Sequence[np.ndarray]):
    """Host-side target assignment: each gt box -> (head, cell, best anchor
    by wh-IoU).  boxes: per-image (n, 5) [x1,y1,x2,y2,cls] in input pixels.
    Returns per-head (target (B,H,W,A,5+C), mask (B,H,W,A))."""
    B = len(boxes)
    out = []
    for anchors, stride in zip(cfg.anchors, cfg.strides):
        g = cfg.input_size // stride
        A = len(anchors)
        t = np.zeros((B, g, g, A, 5 + cfg.num_classes), np.float32)
        m = np.zeros((B, g, g, A), np.float32)
        out.append((t, m))
    aw = [np.array([a[0] for a in h], np.float64) for h in cfg.anchors]
    ah = [np.array([a[1] for a in h], np.float64) for h in cfg.anchors]

    for b, bx in enumerate(boxes):
        for row in np.asarray(bx, np.float64).reshape(-1, 5):
            x1, y1, x2, y2, cls_id = row
            w, h = max(x2 - x1, 1.0), max(y2 - y1, 1.0)
            cx, cy = x1 + w / 2, y1 + h / 2
            # best (head, anchor) by wh IoU
            best = (-1.0, 0, 0)
            for hi in range(len(cfg.anchors)):
                inter = np.minimum(w, aw[hi]) * np.minimum(h, ah[hi])
                union = w * h + aw[hi] * ah[hi] - inter
                iou = inter / union
                ai = int(iou.argmax())
                if iou[ai] > best[0]:
                    best = (float(iou[ai]), hi, ai)
            _, hi, ai = best
            stride = cfg.strides[hi]
            g = cfg.input_size // stride
            gx, gy = min(int(cx / stride), g - 1), min(int(cy / stride), g - 1)
            t, m = out[hi]
            t[b, gy, gx, ai, 0] = cx / stride - gx              # tx target
            t[b, gy, gx, ai, 1] = cy / stride - gy              # ty target
            t[b, gy, gx, ai, 2] = np.log(max(w / aw[hi][ai], 1e-6))
            t[b, gy, gx, ai, 3] = np.log(max(h / ah[hi][ai], 1e-6))
            t[b, gy, gx, ai, 4] = 1.0                           # objectness
            t[b, gy, gx, ai, 5 + int(cls_id)] = 1.0
            m[b, gy, gx, ai] = 1.0
    return out


def yolo_loss(cfg: YoloConfig, heads, targets, masks,
              box_w: float = 5.0, obj_w: float = 1.0, cls_w: float = 1.0):
    """Per-head BCE(objectness) + masked MSE(box params) + BCE(class)."""
    total = 0.0
    for raw, tgt, msk in zip(heads, targets, masks):
        B, H, W, _ = raw.shape
        A = len(cfg.anchors[0])
        raw = raw.reshape(B, H, W, A, 5 + cfg.num_classes).astype(jnp.float32)
        pxy = jax.nn.sigmoid(raw[..., 0:2])
        pwh = raw[..., 2:4]
        pobj = raw[..., 4]
        pcls = raw[..., 5:]
        m = msk
        npos = jnp.maximum(m.sum(), 1.0)
        nneg = jnp.maximum((1.0 - m).sum(), 1.0)
        box_loss = (jnp.sum(m[..., None] * (pxy - tgt[..., 0:2]) ** 2)
                    + jnp.sum(m[..., None] * (pwh - tgt[..., 2:4]) ** 2)) / npos
        # Objectness is ~60:1 imbalanced (one assigned anchor per target):
        # normalize positives and negatives separately, else the optimum is
        # "predict the base rate" and nothing ever clears the conf threshold.
        obj_bce = optax.sigmoid_binary_cross_entropy(raw[..., 4], tgt[..., 4])
        obj_loss = (jnp.sum(m * obj_bce) / npos
                    + 0.5 * jnp.sum((1.0 - m) * obj_bce) / nneg)
        cls_loss = jnp.sum(m[..., None] * optax.sigmoid_binary_cross_entropy(
            raw[..., 5:], tgt[..., 5:])) / npos
        total = total + box_w * box_loss + obj_w * obj_loss + cls_w * cls_loss
    return total


class Trainer:
    def __init__(self, cfg: Optional[YoloConfig] = None,
                 learning_rate: float = 1e-3, seed: int = 0,
                 mesh: Optional[Mesh] = None):
        self.cfg = cfg or YoloConfig()
        self.model = TinyYolo(self.cfg)
        _, variables = init_params(self.cfg, jax.random.PRNGKey(seed))
        self.tx = optax.adamw(learning_rate)
        params = variables["params"]
        self.state = TrainState(variables=variables,
                                opt_state=self.tx.init(params))
        self.mesh = mesh
        self._step = self._make_step()

    def _make_step(self):
        model, cfg, tx = self.model, self.cfg, self.tx

        def loss_fn(params, batch_stats, images, targets, masks):
            variables = {"params": params, "batch_stats": batch_stats}
            heads, updates = model.apply(
                variables, images, train=True, mutable=["batch_stats"])
            return (yolo_loss(cfg, heads, targets, masks),
                    updates["batch_stats"])

        def step(state_vars, opt_state, images, targets, masks):
            params = state_vars["params"]
            bs = state_vars.get("batch_stats", {})
            (loss, new_bs), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, bs, images, targets, masks)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return {"params": params, "batch_stats": new_bs}, opt_state, loss

        if self.mesh is not None:
            dp = NamedSharding(self.mesh, P("data"))
            rep = NamedSharding(self.mesh, P())
            n_heads = len(self.cfg.anchors)
            return jax.jit(step, in_shardings=(
                rep, rep, NamedSharding(self.mesh, P("data", None, None, None)),
                (dp,) * n_heads, (dp,) * n_heads),
                out_shardings=(rep, rep, rep))
        return jax.jit(step)

    def train_step(self, images: np.ndarray, boxes: Sequence[np.ndarray]):
        """images: (B, S, S, 3) float32 in [0,1]; boxes: per-image (n, 5)."""
        tm = build_targets(self.cfg, boxes)
        targets = tuple(jnp.asarray(t) for t, _ in tm)
        masks = tuple(jnp.asarray(m) for _, m in tm)
        self.state.variables, self.state.opt_state, loss = self._step(
            self.state.variables, self.state.opt_state,
            jnp.asarray(images), targets, masks)
        self.state.step += 1
        return float(loss)

    def fit(self, dataset, epochs: int = 1, log_every: int = 10):
        """dataset: iterable of (images, boxes) batches."""
        losses = []
        for _ in range(epochs):
            for i, (images, boxes) in enumerate(dataset):
                loss = self.train_step(images, boxes)
                losses.append(loss)
                if log_every and i % log_every == 0:
                    print(f"step {self.state.step}: loss {loss:.4f}")
        return losses


def save_checkpoint(path: str, trainer: "Trainer") -> None:
    """Orbax checkpoint of params/batch-stats/optimizer/step — the
    checkpoint/resume capability the reference lacks entirely (SURVEY §5:
    coefficients and weights were recomputed or reloaded ad hoc)."""
    import os

    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, {
        "variables": jax.tree.map(np.asarray, trainer.state.variables),
        "opt_state": jax.tree.map(np.asarray, trainer.state.opt_state),
        "step": trainer.state.step,
    })


def restore_checkpoint(path: str, trainer: "Trainer") -> "Trainer":
    import os

    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    # restore into the trainer's own pytree structure (optax states are
    # NamedTuples which orbax would otherwise return as plain containers)
    template = {
        "variables": jax.tree.map(np.asarray, trainer.state.variables),
        "opt_state": jax.tree.map(np.asarray, trainer.state.opt_state),
        "step": trainer.state.step,
    }
    restored = ckptr.restore(path, item=template)
    trainer.state = TrainState(
        variables=restored["variables"],
        opt_state=restored["opt_state"],
        step=int(restored["step"]))
    return trainer


def pretrained_demo_detector(cache_path: Optional[str] = None,
                             steps: int = 700, size: int = 64,
                             width: float = 0.25, num_classes: int = 1,
                             seed: int = 0):
    """A tiny-YOLO that actually detects the synthetic task — for the
    live demos (the reference's deployed weights blob is missing
    upstream, ``image-detection/model/.MISSING_LARGE_BLOBS``, so the
    demos train their own in ~25 s CPU / ~2 s TPU and cache the pickle).

    Returns a ready ``detect.YoloDetector``.  ``steps=700`` is the CI
    recipe (mAP 0.887 measured); delete the cache to retrain."""
    import os
    import pickle

    from . import data
    from .detect import YoloDetector, load_weights

    cache = cache_path or os.path.expanduser(
        "~/.cache/zrt_demo_detector.pkl")
    cfg = YoloConfig(input_size=size, width_mult=width,
                     num_classes=num_classes)
    det = YoloDetector(cfg=cfg)
    if os.path.exists(cache):
        try:
            det.variables = load_weights(cache)
            return det
        except Exception:                 # corrupt cache: retrain
            pass
    trainer = Trainer(cfg, learning_rate=3e-3)
    trainer.fit(data.synthetic_dataset(seed, steps, batch_size=8,
                                       size=size,
                                       num_classes=num_classes),
                log_every=0)
    det.variables = trainer.state.variables
    cache_dir = os.path.dirname(cache)
    if cache_dir:                 # a bare filename has no dir to create
        os.makedirs(cache_dir, exist_ok=True)
    tmp = cache + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(jax.tree.map(np.asarray, det.variables), f)
    os.replace(tmp, cache)
    return det


def dryrun_train_step(mesh: Mesh) -> float:
    """One DP-sharded training step on tiny shapes (used by
    ``__graft_entry__.dryrun_multichip``)."""
    cfg = YoloConfig(input_size=64, width_mult=0.25)
    trainer = Trainer(cfg, mesh=mesh)
    B = max(2, mesh.shape["data"]) * 2
    rng = np.random.default_rng(0)
    images = rng.random((B, 64, 64, 3), np.float32)
    boxes = [np.array([[8.0, 8.0, 40.0, 40.0, 0.0]]) for _ in range(B)]
    loss = trainer.train_step(images, boxes)
    assert np.isfinite(loss)
    return loss
