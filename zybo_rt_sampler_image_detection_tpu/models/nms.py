"""On-device non-maximum suppression.

Greedy NMS with fixed output size, jit/grid friendly (static shapes, no
data-dependent control flow): K iterations of argmax-select + IoU-suppress
over the score vector.  Replaces the host-side NMS hidden inside the
reference's Ultralytics ``model.predict`` call.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def iou_matrix(a: jax.Array, b: jax.Array) -> jax.Array:
    """Pairwise IoU, a: (N, 4), b: (M, 4) xyxy -> (N, M).  Same math as the
    reference's ``compute_iou`` / ``iou_batch`` (sort.py:47-63)."""
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    union = area_a[:, None] + area_b[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


@partial(jax.jit, static_argnames=("max_det",))
def nms(boxes: jax.Array, scores: jax.Array, iou_threshold: float = 0.45,
        score_threshold: float = 0.0, max_det: int = 32):
    """(N, 4) boxes + (N,) scores -> (max_det, 5) [x1,y1,x2,y2,score],
    zero-padded; a (max_det,) validity mask; and the (max_det,) int32
    source indices of the kept boxes (for gathering per-anchor side data
    like the argmax class — zero where invalid)."""
    scores = jnp.where(scores >= score_threshold, scores, -1.0)

    def body(i, carry):
        scores_live, out, mask, idx = carry
        j = jnp.argmax(scores_live)
        best = scores_live[j]
        valid = best > 0.0
        box = boxes[j].astype(jnp.float32)
        out = out.at[i].set(jnp.where(valid,
                                      jnp.concatenate([box, best[None]]),
                                      jnp.zeros(5, jnp.float32)))
        mask = mask.at[i].set(valid)
        idx = idx.at[i].set(jnp.where(valid, j.astype(jnp.int32), 0))
        ious = iou_matrix(box[None], boxes)[0]
        suppress = (ious > iou_threshold) | \
            (jnp.arange(scores_live.shape[0]) == j)
        scores_live = jnp.where(valid & suppress, -1.0, scores_live)
        return scores_live, out, mask, idx

    out0 = jnp.zeros((max_det, 5), jnp.float32)
    mask0 = jnp.zeros((max_det,), bool)
    idx0 = jnp.zeros((max_det,), jnp.int32)
    _, out, mask, idx = jax.lax.fori_loop(
        0, max_det, body, (scores.astype(jnp.float32), out0, mask0, idx0))
    return out, mask, idx


@partial(jax.jit, static_argnames=("max_det",))
def batched_nms(boxes: jax.Array, scores: jax.Array,
                iou_threshold: float = 0.45, score_threshold: float = 0.0,
                max_det: int = 32):
    """vmapped :func:`nms` over a leading batch axis."""
    fn = lambda b, s: nms(b, s, iou_threshold, score_threshold, max_det)
    return jax.vmap(fn)(boxes, scores)
