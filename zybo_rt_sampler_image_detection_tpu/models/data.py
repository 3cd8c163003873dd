"""Synthetic detection dataset for training/evaluating the tiny-YOLO.

The reference trained its detector offline with Ultralytics on private
data whose weights blob is missing upstream
(``image-detection/model/.MISSING_LARGE_BLOBS``), so exact weight parity
is impossible; this generator provides a reproducible task with exact
ground truth instead, used both by the training demo and by the AP gate
in ``tests/test_vision.py``.

Images are textured-noise backgrounds with 1..max_objects bright filled
rectangles (one class, like the reference's person-centric deployment);
boxes are exact, so AP measures the detector, not the labels.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np


def synthetic_detection_batch(
    rng: np.random.Generator, n: int, size: int = 64,
    max_objects: int = 2, min_frac: float = 0.25, max_frac: float = 0.6,
) -> Tuple[np.ndarray, List[np.ndarray]]:
    """(images (n, size, size, 3) float32 in [0,1], boxes per image
    (k, 5) [x1, y1, x2, y2, class=0])."""
    images = np.empty((n, size, size, 3), np.float32)
    boxes: List[np.ndarray] = []
    for i in range(n):
        # smooth noise background: low-res noise upsampled
        low = rng.random((8, 8, 3)).astype(np.float32) * 0.4
        img = np.kron(low, np.ones((size // 8, size // 8, 1),
                                   np.float32))
        img += rng.random((size, size, 3)).astype(np.float32) * 0.1
        k = int(rng.integers(1, max_objects + 1))
        bs = []
        for _ in range(k):
            w = int(rng.uniform(min_frac, max_frac) * size)
            h = int(rng.uniform(min_frac, max_frac) * size)
            x1 = int(rng.integers(0, size - w))
            y1 = int(rng.integers(0, size - h))
            color = rng.uniform(0.7, 1.0, 3).astype(np.float32)
            img[y1:y1 + h, x1:x1 + w] = (
                0.2 * img[y1:y1 + h, x1:x1 + w] + 0.8 * color)
            bs.append([x1, y1, x1 + w, y1 + h, 0.0])
        images[i] = np.clip(img, 0.0, 1.0)
        boxes.append(np.asarray(bs, np.float64))
    return images, boxes


def synthetic_dataset(seed: int, n_batches: int, batch_size: int = 8,
                      size: int = 64, **kw):
    """Iterable of (images, boxes) batches for ``Trainer.fit``."""
    rng = np.random.default_rng(seed)
    for _ in range(n_batches):
        yield synthetic_detection_batch(rng, batch_size, size, **kw)
