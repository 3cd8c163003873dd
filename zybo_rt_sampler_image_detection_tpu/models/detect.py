"""Detector wrapper with the reference's ``yolo_model`` API.

``get_detections(frame, conf_threshold)`` returns ``[[x1,y1,x2,y2,conf],
...]`` in source-image pixels, exactly like
``yolo_smooth_tracking.py:13-23`` — but preprocess, backbone, decode and
NMS are one jitted device program; the host sees a fixed-size table.
"""

from __future__ import annotations

import pickle
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import nms as nms_mod
from .yolo import TinyYolo, YoloConfig, decode_all, init_params


class YoloDetector:
    def __init__(self, model_path: Optional[str] = None,
                 cfg: Optional[YoloConfig] = None, max_det: int = 32,
                 iou_threshold: float = 0.45, seed: int = 0):
        self.cfg = cfg or YoloConfig()
        self.max_det = max_det
        self.iou_threshold = iou_threshold
        self.model = TinyYolo(self.cfg)
        if model_path:
            self.variables = load_weights(model_path)
        else:
            _, self.variables = init_params(self.cfg,
                                            jax.random.PRNGKey(seed))
        self._infer = jax.jit(self._forward)
        self._infer_batch = jax.jit(self._forward_batch)

    # -- device program -------------------------------------------------------

    def _forward(self, variables, img_u8):
        """(H, W, 3) uint8 (any size, host-resized) -> (max_det, 5),
        mask, per-detection argmax class ids."""
        c = self.cfg
        x = img_u8.astype(jnp.float32) / 255.0
        heads = self.model.apply(variables, x[None], train=False)
        boxes, obj, cls = decode_all(c, heads)
        score = obj * jnp.max(cls, axis=-1)
        out, mask, idx = nms_mod.nms(boxes[0], score[0],
                                     iou_threshold=self.iou_threshold,
                                     max_det=self.max_det)
        cls_ids = jnp.argmax(cls[0], axis=-1).astype(jnp.int32)[idx]
        return out, mask, cls_ids

    def _forward_batch(self, variables, imgs_u8):
        """(K, H, W, 3) uint8 -> ((K, max_det, 5), (K, max_det) mask) —
        ONE device launch for the whole frame batch (backbone + decode are
        natively batched; NMS is vmapped).  This is the detector twin of
        the batched heatmap stage: K camera frames amortize the dispatch
        latency the per-frame loop pays per frame."""
        c = self.cfg
        x = imgs_u8.astype(jnp.float32) / 255.0
        heads = self.model.apply(variables, x, train=False)
        boxes, obj, cls = decode_all(c, heads)
        score = obj * jnp.max(cls, axis=-1)
        out, mask, idx = jax.vmap(
            lambda b, s: nms_mod.nms(b, s,
                                     iou_threshold=self.iou_threshold,
                                     max_det=self.max_det))(boxes, score)
        cls_ids = jnp.take_along_axis(
            jnp.argmax(cls, axis=-1).astype(jnp.int32), idx, axis=1)
        return out, mask, cls_ids

    # -- host API (reference parity) ------------------------------------------

    def get_detections_batch(self, frames: List[np.ndarray],
                             conf_threshold: float = 0.0,
                             pad_to: int = 0,
                             include_class: bool = False
                             ) -> List[List[list]]:
        """Batched ``get_detections``: one device launch for ``frames``.

        ``pad_to`` > len(frames) pads the batch with zero images so the
        jitted program keeps ONE static batch shape (padded outputs are
        discarded) — partial camera batches don't trigger recompiles.
        Returns per-frame detection lists in source-image pixels;
        ``include_class`` appends the argmax class id as a 6th column.
        """
        if not frames:
            return []
        c = self.cfg
        K = max(pad_to, len(frames))
        imgs = np.zeros((K, c.input_size, c.input_size, 3), np.uint8)
        scales = []
        for i, f in enumerate(frames):
            h, w = f.shape[:2]
            imgs[i] = _resize_u8(f, (c.input_size, c.input_size))
            scales.append((w / c.input_size, h / c.input_size))
        out, mask, cls_ids = self._infer_batch(self.variables, imgs)
        out = np.asarray(out)
        mask = np.asarray(mask)
        cls_ids = np.asarray(cls_ids)
        results = []
        for i, (sx, sy) in enumerate(scales):
            results.append(self._rows_to_dets(
                out[i], mask[i], cls_ids[i], sx, sy, conf_threshold,
                include_class))
        return results

    @staticmethod
    def _rows_to_dets(out, mask, cls_ids, sx, sy, conf_threshold,
                      include_class):
        dets = []
        for row, ok, ci in zip(out, mask, cls_ids):
            if not ok or row[4] < conf_threshold:
                continue
            x1, y1, x2, y2, conf = row
            d = [float(x1 * sx), float(y1 * sy),
                 float(x2 * sx), float(y2 * sy), float(conf)]
            if include_class:
                d.append(int(ci))
            dets.append(d)
        return dets

    def get_detections(self, frame: np.ndarray,
                       conf_threshold: float = 0.0,
                       include_class: bool = False) -> List[list]:
        """``yolo_model.get_detections`` (yolo_smooth_tracking.py:13-23);
        ``include_class`` appends the argmax class id as a 6th column."""
        c = self.cfg
        h, w = frame.shape[:2]
        img = _resize_u8(frame, (c.input_size, c.input_size))
        out, mask, cls_ids = self._infer(self.variables, img)
        return self._rows_to_dets(
            np.asarray(out), np.asarray(mask), np.asarray(cls_ids),
            w / c.input_size, h / c.input_size, conf_threshold,
            include_class)


def _resize_u8(frame: np.ndarray, size) -> np.ndarray:
    """Nearest/linear resize to (H, W); cv2 when present, NumPy otherwise."""
    if frame.ndim == 2:
        frame = np.repeat(frame[..., None], 3, axis=-1)
    try:
        import cv2
        return cv2.resize(frame, (size[1], size[0]),
                          interpolation=cv2.INTER_LINEAR)
    except ImportError:
        ys = np.linspace(0, frame.shape[0] - 1, size[0]).round().astype(int)
        xs = np.linspace(0, frame.shape[1] - 1, size[1]).round().astype(int)
        return frame[ys][:, xs]


def save_weights(path: str, variables) -> None:
    with open(path, "wb") as f:
        pickle.dump(jax.tree.map(np.asarray, variables), f)


def load_weights(path: str):
    with open(path, "rb") as f:
        return pickle.load(f)
