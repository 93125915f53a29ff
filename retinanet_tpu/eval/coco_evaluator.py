"""COCO evaluation callback.

Capability parity with reference retinanet/eval/coco_evaluator.py:23-161:
  * accumulate_results slices valid detections, rescales boxes from
    normalized model space back to original image pixels via resize_scale,
    converts corners -> int xywh, and collects COCO-format prediction dicts;
  * evaluate() dumps predictions json and runs bbox COCOeval (our native
    numpy implementation — pycocotools parity, see eval/coco.py) returning
    the same 5 headline metrics;
  * optional remap of contiguous training class ids back to original COCO
    category ids via alphabetically-sorted class names
    (reference coco_evaluator.py:39-52, 89-93).

Deviation (documented): the reference divides x-coords by the y resize
scale and vice versa (coco_evaluator.py:121-126 combined with the swapped
normalization in postprocessing_ops.py:111-117) — the two swaps cancel only
for square inputs. We rescale each axis correctly, which is identical for
every shipped (square) config and also correct for non-square inputs.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import numpy as np

from retinanet_tpu.eval.coco import COCOEval, COCOIndex


class COCOEvaluator:
    def __init__(self,
                 input_shape,
                 annotation_file_path: str,
                 prediction_file_path: str = "predictions.json",
                 remap_class_ids: bool = False):
        self._input_shape = np.asarray(input_shape, np.float32)  # (h, w)
        self.annotation_file_path = annotation_file_path
        self.prediction_file_path = os.path.normpath(prediction_file_path)
        self._remap_class_ids = remap_class_ids

        self._coco = COCOIndex(annotation_file_path)

        sorted_classes = sorted(
            info["name"] for info in self._coco.cats.values())
        self._class_name_to_orig_id = {
            info["name"]: info["id"] for info in self._coco.cats.values()}
        self._sorted_id_to_name = dict(enumerate(sorted_classes))

        self._processed_detections: List[dict] = []
        self._image_ids: List[int] = []

    @property
    def processed_detections(self) -> List[dict]:
        """COCO-result dicts accumulated so far (what evaluate() scores and
        writes to prediction_file_path)."""
        return self._processed_detections

    def _maybe_remap(self, class_id: int) -> int:
        if self._remap_class_ids:
            return self._class_name_to_orig_id[
                self._sorted_id_to_name[class_id]]
        return class_id

    def accumulate_results(self, results: Dict,
                           rescale_detections: bool = True) -> None:
        """results: {image_id (B,), detections dict, resize_scale (B, 2)}.
        Padded eval samples carry image_id == -1 and are skipped."""
        image_ids = np.asarray(results["image_id"])
        det = {k: np.asarray(v) for k, v in results["detections"].items()}
        resize_scales = np.asarray(results["resize_scale"])

        for i in range(len(image_ids)):
            if int(image_ids[i]) < 0:
                continue  # padded slot from the static-shape val batch
            n = int(det["valid_detections"][i])
            boxes = det["boxes"][i][:n].astype(np.float64)
            classes = det["classes"][i][:n]
            scores = det["scores"][i][:n]

            if rescale_detections:
                # normalized (x1,y1,x2,y2) -> original-image pixels
                h, w = self._input_shape
                sy, sx = resize_scales[i]
                boxes = boxes * np.array([w, h, w, h]) / np.array(
                    [sx, sy, sx, sy])

            boxes = boxes.astype(np.int32)  # reference truncates to int
            boxes[:, 2:] = boxes[:, 2:] - boxes[:, :2]  # corners -> xywh
            self._image_ids.append(int(image_ids[i]))
            for box, cid, score in zip(boxes, classes, scores):
                self._processed_detections.append({
                    "image_id": int(image_ids[i]),
                    "category_id": self._maybe_remap(int(cid)),
                    "bbox": [int(v) for v in box],
                    "score": float(score),
                })

    def evaluate(self) -> Dict[str, float]:
        with open(self.prediction_file_path, "w") as f:
            json.dump(self._processed_detections, f)

        evaluator = COCOEval(self._coco, self._processed_detections)
        evaluator.evaluate()
        evaluator.accumulate()
        summary = evaluator.summarize()
        # NOTE: "AR-(all)" here is AR@maxDets=100 (the pycocotools stats[8]
        # convention for recall over all areas). The reference's
        # coco_evaluator.py:149 labeled stats[6] (AR@maxDets=1) as its
        # recall scalar — we intentionally report the more informative
        # AR@100 instead of replicating that quirk.
        return {
            "AP-IoU=0.50:0.95": summary["AP-IoU=0.50:0.95"],
            "AP-IoU=0.50": summary["AP-IoU=0.50"],
            "AP-IoU=0.75": summary["AP-IoU=0.75"],
            "AR-(all)-IoU=0.50:0.95": summary["AR-(all)-IoU=0.50:0.95"],
            "AR-(L)-IoU=0.50:0.95": summary["AR-(L)-IoU=0.50:0.95"],
        }

    def reset(self) -> None:
        self._processed_detections = []
        self._image_ids = []

    @property
    def processed_detections(self) -> List[dict]:
        return self._processed_detections
