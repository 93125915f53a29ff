"""Native COCO dataset index + bbox mAP evaluation (numpy).

pycocotools replacement: the reference delegates to COCO/COCOeval
(reference retinanet/eval/coco_evaluator.py:7-8, 136-157); this module
implements the same bbox evaluation protocol — greedy per-image matching in
score order at IoU thresholds 0.50:0.05:0.95, crowd handling, area ranges,
101-point interpolated AP — so results match pycocotools' COCOeval for bbox.
"""

from __future__ import annotations

import json
from collections import defaultdict
from typing import Dict, List, Optional, Sequence

import numpy as np

IOU_THRS = np.linspace(0.5, 0.95, 10)
REC_THRS = np.linspace(0.0, 1.0, 101)
MAX_DETS = (1, 10, 100)
AREA_RNG = {
    "all": (0.0, 1e10),
    "small": (0.0, 32.0 ** 2),
    "medium": (32.0 ** 2, 96.0 ** 2),
    "large": (96.0 ** 2, 1e10),
}


class COCOIndex:
    """Minimal COCO annotation index (the parts COCOeval needs)."""

    def __init__(self, annotation_path_or_dict):
        if isinstance(annotation_path_or_dict, (str,)):
            path = annotation_path_or_dict
            if "://" in path:  # gs:// etc — reference downloaded via gfile
                from etils import epath
                data = json.loads(epath.Path(path).read_text())
            else:
                with open(path) as f:
                    data = json.load(f)
        else:
            data = annotation_path_or_dict
        self.dataset = data
        self.imgs = {img["id"]: img for img in data.get("images", [])}
        self.cats = {c["id"]: c for c in data.get("categories", [])}
        self.img_to_anns: Dict[int, List[dict]] = defaultdict(list)
        for ann in data.get("annotations", []):
            if "area" not in ann:
                ann["area"] = float(ann["bbox"][2] * ann["bbox"][3])
            ann.setdefault("iscrowd", 0)
            ann.setdefault("ignore", 0)
            self.img_to_anns[ann["image_id"]].append(ann)

    @property
    def image_ids(self) -> List[int]:
        return list(self.imgs.keys())

    @property
    def category_ids(self) -> List[int]:
        return sorted(self.cats.keys())


def box_iou_xywh(dts: np.ndarray, gts: np.ndarray,
                 iscrowd: np.ndarray) -> np.ndarray:
    """IoU between [x,y,w,h] boxes; crowd GT uses IoA (dt area) like
    pycocotools' maskUtils.iou."""
    if len(dts) == 0 or len(gts) == 0:
        return np.zeros((len(dts), len(gts)))
    dx1, dy1 = dts[:, 0], dts[:, 1]
    dx2, dy2 = dts[:, 0] + dts[:, 2], dts[:, 1] + dts[:, 3]
    gx1, gy1 = gts[:, 0], gts[:, 1]
    gx2, gy2 = gts[:, 0] + gts[:, 2], gts[:, 1] + gts[:, 3]
    ix = (np.minimum(dx2[:, None], gx2[None]) -
          np.maximum(dx1[:, None], gx1[None])).clip(min=0)
    iy = (np.minimum(dy2[:, None], gy2[None]) -
          np.maximum(dy1[:, None], gy1[None])).clip(min=0)
    inter = ix * iy
    d_area = (dts[:, 2] * dts[:, 3])[:, None]
    g_area = (gts[:, 2] * gts[:, 3])[None]
    union = np.where(iscrowd[None].astype(bool), d_area,
                     d_area + g_area - inter)
    return np.where(union > 0, inter / np.maximum(union, 1e-10), 0.0)


class COCOEval:
    """Bbox COCOeval. Usage: evaluate() -> accumulate() -> stats."""

    def __init__(self, gt: COCOIndex, detections: Sequence[dict],
                 image_ids: Optional[Sequence[int]] = None):
        self.gt = gt
        self.image_ids = sorted(image_ids if image_ids is not None
                                else gt.image_ids)
        self.cat_ids = gt.category_ids
        self.dts: Dict[tuple, List[dict]] = defaultdict(list)
        for i, dt in enumerate(detections):
            dt = dict(dt)
            dt["id"] = i + 1
            if "area" not in dt:
                dt["area"] = float(dt["bbox"][2] * dt["bbox"][3])
            self.dts[(dt["image_id"], dt["category_id"])].append(dt)
        self.gts: Dict[tuple, List[dict]] = defaultdict(list)
        for img_id in self.image_ids:
            for ann in gt.img_to_anns.get(img_id, []):
                self.gts[(img_id, ann["category_id"])].append(ann)
        self.eval: Dict = {}
        self.stats: np.ndarray = np.zeros(12)

    # -- per image x category ------------------------------------------------

    def _evaluate_img(self, img_id: int, cat_id: int, area_rng,
                      max_det: int) -> Optional[dict]:
        gts = self.gts.get((img_id, cat_id), [])
        dts = self.dts.get((img_id, cat_id), [])
        if not gts and not dts:
            return None

        gt_ignore_base = np.array([
            1 if (g["iscrowd"] or g.get("ignore", 0)
                  or g["area"] < area_rng[0] or g["area"] > area_rng[1])
            else 0 for g in gts], dtype=np.float64)
        # sort gts: non-ignored first (stable)
        g_order = np.argsort(gt_ignore_base, kind="mergesort")
        gts = [gts[i] for i in g_order]
        gt_ignore = gt_ignore_base[g_order]
        iscrowd = np.array([g["iscrowd"] for g in gts], dtype=np.int64)

        d_order = np.argsort([-d["score"] for d in dts], kind="mergesort")
        dts = [dts[i] for i in d_order][:max_det]

        ious = box_iou_xywh(
            np.array([d["bbox"] for d in dts], np.float64).reshape(-1, 4),
            np.array([g["bbox"] for g in gts], np.float64).reshape(-1, 4),
            iscrowd)

        T, G, D = len(IOU_THRS), len(gts), len(dts)
        gtm = np.zeros((T, G))
        dtm = np.zeros((T, D))
        dt_ignore = np.zeros((T, D))

        for t, thr in enumerate(IOU_THRS):
            for d in range(D):
                iou = min(thr, 1 - 1e-10)
                m = -1
                for g in range(G):
                    if gtm[t, g] > 0 and not iscrowd[g]:
                        continue
                    if m > -1 and gt_ignore[m] == 0 and gt_ignore[g] == 1:
                        break  # past all non-ignored gts
                    if ious[d, g] < iou:
                        continue
                    iou = ious[d, g]
                    m = g
                if m == -1:
                    continue
                # store local index + 1 (0 means unmatched; raw annotation
                # ids may legitimately be 0)
                dt_ignore[t, d] = gt_ignore[m]
                dtm[t, d] = m + 1
                gtm[t, m] = d + 1

        # unmatched dts outside the area range are ignored
        a = np.array([d["area"] < area_rng[0] or d["area"] > area_rng[1]
                      for d in dts]).reshape(1, -1)
        dt_ignore = np.logical_or(
            dt_ignore, np.logical_and(dtm == 0, np.repeat(a, T, axis=0)))

        return {
            "dt_matches": dtm,
            "dt_scores": np.array([d["score"] for d in dts]),
            "dt_ignore": dt_ignore,
            "gt_ignore": gt_ignore,
            "num_gt": int(np.count_nonzero(gt_ignore == 0)),
        }

    # -- accumulate -----------------------------------------------------------

    def evaluate(self) -> None:
        max_det = max(MAX_DETS)
        self._img_evals = {}
        for cat_id in self.cat_ids:
            for area_name, rng in AREA_RNG.items():
                for img_id in self.image_ids:
                    self._img_evals[(cat_id, area_name, img_id)] = \
                        self._evaluate_img(img_id, cat_id, rng, max_det)

    def accumulate(self) -> None:
        T = len(IOU_THRS)
        R = len(REC_THRS)
        K = len(self.cat_ids)
        A = len(AREA_RNG)
        M = len(MAX_DETS)
        precision = -np.ones((T, R, K, A, M))
        recall = -np.ones((T, K, A, M))
        scores = -np.ones((T, R, K, A, M))

        for k, cat_id in enumerate(self.cat_ids):
            for a, area_name in enumerate(AREA_RNG):
                evals = [self._img_evals[(cat_id, area_name, img_id)]
                         for img_id in self.image_ids]
                evals = [e for e in evals if e is not None]
                if not evals:
                    continue
                for m, max_det in enumerate(MAX_DETS):
                    dt_scores = np.concatenate(
                        [e["dt_scores"][:max_det] for e in evals])
                    order = np.argsort(-dt_scores, kind="mergesort")
                    dt_scores_sorted = dt_scores[order]
                    dtm = np.concatenate(
                        [e["dt_matches"][:, :max_det] for e in evals],
                        axis=1)[:, order]
                    dt_ig = np.concatenate(
                        [e["dt_ignore"][:, :max_det] for e in evals],
                        axis=1)[:, order]
                    num_gt = sum(e["num_gt"] for e in evals)
                    if num_gt == 0:
                        continue
                    tps = np.logical_and(dtm, np.logical_not(dt_ig))
                    fps = np.logical_and(
                        np.logical_not(dtm), np.logical_not(dt_ig))
                    tp_sum = np.cumsum(tps, axis=1).astype(np.float64)
                    fp_sum = np.cumsum(fps, axis=1).astype(np.float64)
                    for t in range(T):
                        tp = tp_sum[t]
                        fp = fp_sum[t]
                        nd = len(tp)
                        rc = tp / num_gt
                        pr = tp / np.maximum(fp + tp, np.finfo(float).eps)
                        recall[t, k, a, m] = rc[-1] if nd else 0.0
                        # make precision monotonically decreasing
                        pr = pr.tolist()
                        for i in range(nd - 1, 0, -1):
                            if pr[i] > pr[i - 1]:
                                pr[i - 1] = pr[i]
                        inds = np.searchsorted(rc, REC_THRS, side="left")
                        q = np.zeros(R)
                        ss = np.zeros(R)
                        for ri, pi in enumerate(inds):
                            if pi < nd:
                                q[ri] = pr[pi]
                                ss[ri] = dt_scores_sorted[pi]
                        precision[t, :, k, a, m] = q
                        scores[t, :, k, a, m] = ss

        self.eval = {"precision": precision, "recall": recall,
                     "scores": scores}
        self._summarize()

    def _summarize(self) -> None:
        def _ap(iou_thr=None, area="all", max_det=100):
            p = self.eval["precision"]
            a = list(AREA_RNG).index(area)
            m = MAX_DETS.index(max_det)
            if iou_thr is not None:
                t = np.where(np.isclose(IOU_THRS, iou_thr))[0]
                p = p[t]
            p = p[:, :, :, a, m]
            valid = p[p > -1]
            return float(np.mean(valid)) if valid.size else -1.0

        def _ar(iou_thr=None, area="all", max_det=100):
            r = self.eval["recall"]
            a = list(AREA_RNG).index(area)
            m = MAX_DETS.index(max_det)
            if iou_thr is not None:
                t = np.where(np.isclose(IOU_THRS, iou_thr))[0]
                r = r[t]
            r = r[:, :, a, m]
            valid = r[r > -1]
            return float(np.mean(valid)) if valid.size else -1.0

        self.stats = np.array([
            _ap(),                               # AP .50:.95
            _ap(iou_thr=0.5),                    # AP .50
            _ap(iou_thr=0.75),                   # AP .75
            _ap(area="small"),
            _ap(area="medium"),
            _ap(area="large"),
            _ar(max_det=1),
            _ar(max_det=10),
            _ar(max_det=100),
            _ar(area="small"),
            _ar(area="medium"),
            _ar(area="large"),
        ])

    def summarize(self) -> Dict[str, float]:
        names = [
            "AP-IoU=0.50:0.95", "AP-IoU=0.50", "AP-IoU=0.75",
            "AP-(S)", "AP-(M)", "AP-(L)",
            "AR-maxDets=1", "AR-maxDets=10", "AR-(all)-IoU=0.50:0.95",
            "AR-(S)", "AR-(M)", "AR-(L)-IoU=0.50:0.95",
        ]
        return dict(zip(names, self.stats.tolist()))
