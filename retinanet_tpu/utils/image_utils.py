"""Host-side image utilities: IO, preprocessing mirror, visualization.

Capability parity with reference retinanet/image_utils.py:1-215 —
cv2/numpy mirrors of the serving preprocessing (for calibration streams and
notebooks), matplotlib/cv2 detection visualizers, and a batched image
generator for folders.
"""

from __future__ import annotations

import os
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


def read_image(path: str) -> np.ndarray:
    """RGB uint8 image from disk (reference image_utils.py:8-16)."""
    if cv2 is not None:
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is None:
            raise FileNotFoundError(path)
        return img[:, :, ::-1]
    from PIL import Image
    return np.asarray(Image.open(path).convert("RGB"))


def prepare_image(image: np.ndarray,
                  input_shape: Sequence[int],
                  mean=(127.0, 127.0, 127.0),
                  stddev=(128.0, 128.0, 128.0),
                  pixel_scale: float = 1.0
                  ) -> Tuple[np.ndarray, np.ndarray]:
    """Raw-domain resize-with-pad matching the serving path
    (reference prepare_image_cv2, image_utils.py:54-66). Returns
    (batched image (1, H, W, 3) float32 raw pixels, resize_scale (2,)).
    Normalization happens on device inside the serving fn."""
    image = np.asarray(image, np.float32)
    th, tw = int(input_shape[0]), int(input_shape[1])
    h, w = image.shape[:2]
    scale = min(th / h, tw / w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    if cv2 is not None:
        resized = cv2.resize(image, (nw, nh), interpolation=cv2.INTER_LINEAR)
    else:
        ys = np.minimum(((np.arange(nh) + 0.5) * h / nh).astype(int), h - 1)
        xs = np.minimum(((np.arange(nw) + 0.5) * w / nw).astype(int), w - 1)
        resized = image[ys][:, xs]
    out = np.empty((th, tw, 3), np.float32)
    out[:] = np.asarray(mean, np.float32)
    out[:nh, :nw] = resized
    return out[None], np.array([nh / h, nw / w], np.float32)


def rescale_boxes(boxes_norm: np.ndarray, input_shape, resize_scale,
                  clip_hw: Optional[Tuple[int, int]] = None) -> np.ndarray:
    """Normalized corners -> original-image pixel corners."""
    h, w = float(input_shape[0]), float(input_shape[1])
    sy, sx = float(resize_scale[0]), float(resize_scale[1])
    boxes = np.asarray(boxes_norm, np.float64) * np.array(
        [w, h, w, h]) / np.array([sx, sy, sx, sy])
    if clip_hw is not None:
        boxes[:, [0, 2]] = boxes[:, [0, 2]].clip(0, clip_hw[1])
        boxes[:, [1, 3]] = boxes[:, [1, 3]].clip(0, clip_hw[0])
    return boxes


def draw_detections(image: np.ndarray,
                    boxes: np.ndarray,
                    scores: np.ndarray,
                    classes: np.ndarray,
                    class_names: Optional[Sequence[str]] = None,
                    score_threshold: float = 0.0) -> np.ndarray:
    """cv2 box/label renderer (reference visualize_detections_cv2)."""
    if cv2 is None:
        raise RuntimeError("cv2 is required for visualization")
    out = np.ascontiguousarray(np.asarray(image, np.uint8)[:, :, ::-1])
    rng = np.random.default_rng(7)
    colors = rng.integers(64, 255, (max(int(np.max(classes, initial=0)) + 1,
                                        1), 3))
    for box, score, cid in zip(boxes, scores, classes):
        if score < score_threshold or cid < 0:
            continue
        x1, y1, x2, y2 = (int(v) for v in box)
        color = tuple(int(c) for c in colors[int(cid)])
        cv2.rectangle(out, (x1, y1), (x2, y2), color, 2)
        label = (class_names[int(cid)] if class_names else str(int(cid)))
        cv2.putText(out, f"{label}:{score:.2f}", (x1, max(y1 - 4, 10)),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.5, color, 1)
    return out[:, :, ::-1]


class ImageGenerator:
    """Batched folder streamer for calibration / bulk inference
    (reference image_utils.py:167-215)."""

    _EXTS = (".jpg", ".jpeg", ".png", ".bmp")

    def __init__(self, image_dir: str, input_shape, batch_size: int = 8,
                 mean=(127.0, 127.0, 127.0), stddev=(128.0, 128.0, 128.0),
                 pixel_scale: float = 1.0, limit: Optional[int] = None):
        self.paths: List[str] = sorted(
            os.path.join(image_dir, f) for f in os.listdir(image_dir)
            if f.lower().endswith(self._EXTS))
        if limit:
            self.paths = self.paths[:limit]
        self.input_shape = input_shape
        self.batch_size = batch_size
        self.mean, self.stddev, self.pixel_scale = mean, stddev, pixel_scale

    def __len__(self):
        return (len(self.paths) + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[np.ndarray]:
        batch = []
        for path in self.paths:
            img, _ = prepare_image(read_image(path), self.input_shape,
                                   self.mean, self.stddev, self.pixel_scale)
            batch.append(img[0])
            if len(batch) == self.batch_size:
                yield np.stack(batch)
                batch = []
        if batch:
            yield np.stack(batch)
