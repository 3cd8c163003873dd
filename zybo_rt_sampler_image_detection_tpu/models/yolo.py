"""Tiny-YOLO detector in Flax — the TPU-native replacement for the
reference's Ultralytics dependency (``image-detection/src/
yolo_smooth_tracking.py:9-23`` wraps ``YOLO(model.pt)``; the custom weights
blob is absent from the repo, ``.MISSING_LARGE_BLOBS``).

Architecture: a YOLOv3-tiny-shaped anchor-based single-stage detector —
conv/BN/leaky backbone to /32 with a /16 skip, two detection heads with 3
anchors each.  Everything (backbone, box decode, NMS) runs on device in one
jit; the host only sees the final (max_det, 6) table.

bfloat16-friendly: convs run in the param dtype, losses/decodes in f32.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# (w, h) anchor priors in pixels of the input resolution, per head
# (coarse /32 head first), COCO-ish tiny-yolo priors.
DEFAULT_ANCHORS = (
    ((81, 82), (135, 169), (344, 319)),     # stride 32
    ((10, 14), (23, 27), (37, 58)),         # stride 16
)


@dataclasses.dataclass(frozen=True)
class YoloConfig:
    num_classes: int = 1                    # the reference tracks one class
    input_size: int = 416                   # square input
    width_mult: float = 1.0
    anchors: Tuple[Tuple[Tuple[int, int], ...], ...] = DEFAULT_ANCHORS
    dtype: Any = jnp.float32

    @property
    def strides(self) -> Tuple[int, ...]:
        return (32, 16)

    @property
    def out_per_anchor(self) -> int:
        return 5 + self.num_classes


class ConvBlock(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding="SAME",
                    use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.97,
                         dtype=jnp.float32)(x)
        return nn.leaky_relu(x, 0.1)


class TinyYolo(nn.Module):
    """Backbone + 2-scale detection heads.

    Returns raw head outputs: list of (B, H, W, A*(5+C)).
    """

    cfg: YoloConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.cfg
        w = lambda f: max(8, int(f * c.width_mult))
        # /1 -> /32 backbone (maxpool downsampling like yolov3-tiny)
        x = ConvBlock(w(16), dtype=c.dtype)(x, train)
        x = nn.max_pool(x, (2, 2), (2, 2))                        # /2
        x = ConvBlock(w(32), dtype=c.dtype)(x, train)
        x = nn.max_pool(x, (2, 2), (2, 2))                        # /4
        x = ConvBlock(w(64), dtype=c.dtype)(x, train)
        x = nn.max_pool(x, (2, 2), (2, 2))                        # /8
        x = ConvBlock(w(128), dtype=c.dtype)(x, train)
        x = nn.max_pool(x, (2, 2), (2, 2))                        # /16
        x16 = ConvBlock(w(256), dtype=c.dtype)(x, train)
        x = nn.max_pool(x16, (2, 2), (2, 2))                      # /32
        x = ConvBlock(w(512), dtype=c.dtype)(x, train)
        x = ConvBlock(w(256), kernel=1, dtype=c.dtype)(x, train)

        n_anchor = len(c.anchors[0])
        out32 = ConvBlock(w(512), dtype=c.dtype)(x, train)
        out32 = nn.Conv(n_anchor * c.out_per_anchor, (1, 1),
                        dtype=c.dtype)(out32)

        up = ConvBlock(w(128), kernel=1, dtype=c.dtype)(x, train)
        up = jax.image.resize(up, (up.shape[0], up.shape[1] * 2,
                                   up.shape[2] * 2, up.shape[3]), "nearest")
        x16 = jnp.concatenate([up, x16], axis=-1)
        out16 = ConvBlock(w(256), dtype=c.dtype)(x16, train)
        out16 = nn.Conv(n_anchor * c.out_per_anchor, (1, 1),
                        dtype=c.dtype)(out16)
        return [out32, out16]


def decode_head(raw: jax.Array, anchors, stride: int,
                num_classes: int) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Raw head (B, H, W, A*(5+C)) -> (boxes_xyxy (B, HWA, 4),
    obj (B, HWA), cls (B, HWA, C)), in input-image pixels."""
    B, H, W, _ = raw.shape
    A = len(anchors)
    raw = raw.reshape(B, H, W, A, 5 + num_classes).astype(jnp.float32)
    gy = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    gx = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    xy = jax.nn.sigmoid(raw[..., 0:2])
    cx = (xy[..., 0] + gx[None, :, :, None]) * stride
    cy = (xy[..., 1] + gy[None, :, :, None]) * stride
    anchor_w = jnp.asarray([a[0] for a in anchors], jnp.float32)
    anchor_h = jnp.asarray([a[1] for a in anchors], jnp.float32)
    bw = jnp.exp(jnp.clip(raw[..., 2], -8, 8)) * anchor_w
    bh = jnp.exp(jnp.clip(raw[..., 3], -8, 8)) * anchor_h
    boxes = jnp.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2],
                      axis=-1)
    obj = jax.nn.sigmoid(raw[..., 4])
    cls = jax.nn.sigmoid(raw[..., 5:])
    return (boxes.reshape(B, -1, 4), obj.reshape(B, -1),
            cls.reshape(B, -1, num_classes))


def decode_all(cfg: YoloConfig, heads: Sequence[jax.Array]):
    """All heads concatenated: (B, N, 4), (B, N), (B, N, C)."""
    bs, os_, cs = [], [], []
    for raw, anchors, stride in zip(heads, cfg.anchors, cfg.strides):
        b, o, c = decode_head(raw, anchors, stride, cfg.num_classes)
        bs.append(b)
        os_.append(o)
        cs.append(c)
    return (jnp.concatenate(bs, 1), jnp.concatenate(os_, 1),
            jnp.concatenate(cs, 1))


def init_params(cfg: YoloConfig, rng: jax.Array):
    model = TinyYolo(cfg)
    x = jnp.zeros((1, cfg.input_size, cfg.input_size, 3), jnp.float32)
    variables = model.init(rng, x, train=False)
    return model, variables
