"""Differential verification of eval/coco.py (the pycocotools bbox-protocol
reimplementation).

pycocotools cannot be installed in this sandbox (no egress), so the
strongest available check is implementation diversity: an INDEPENDENT
from-the-published-spec evaluator below, written with a deliberately
different structure (pure-python per-image loops, fraction-free greedy
matcher, direct 101-point envelope integration — no code or helpers shared
with eval/coco.py), cross-checked on randomized adversarial scenarios that
exercise every protocol branch: crowd IoA matching, ignore ordering,
score ties, maxDets truncation, area-range ignores, images with only
crowds, detections on empty images.

Any divergence between two independent implementations of the same spec
localizes a bug in one of them; agreement across hundreds of randomized
scenarios pins the vectorized implementation to the protocol.
"""

import numpy as np
import pytest

from retinanet_tpu.eval.coco import (AREA_RNG, COCOEval, COCOIndex,
                                     IOU_THRS, MAX_DETS, REC_THRS)


# --------------------------------------------------------------------------
# Independent reference implementation (per the published COCO protocol)
# --------------------------------------------------------------------------

def _iou_single(d, g, crowd):
    dx, dy, dw, dh = d
    gx, gy, gw, gh = g
    ix = max(0.0, min(dx + dw, gx + gw) - max(dx, gx))
    iy = max(0.0, min(dy + dh, gy + gh) - max(dy, gy))
    inter = ix * iy
    denom = dw * dh if crowd else dw * dh + gw * gh - inter
    return inter / denom if denom > 0 else 0.0


def _match_image(dts, gts, thr, area_rng):
    """Greedy match for one (image, category, threshold, area range).

    Returns (dt_matched, dt_ignored, num_nonignored_gt) aligned with dts
    (already score-sorted + truncated)."""
    def gt_ig(g):
        return bool(g.get("iscrowd", 0) or g.get("ignore", 0)
                    or g["area"] < area_rng[0] or g["area"] > area_rng[1])

    order = sorted(range(len(gts)), key=lambda i: gt_ig(gts[i]))
    gts = [gts[i] for i in order]
    ignored = [gt_ig(g) for g in gts]
    crowd = [bool(g.get("iscrowd", 0)) for g in gts]
    taken = [False] * len(gts)

    dt_match, dt_ignore = [], []
    for d in dts:
        best, best_iou = None, min(thr, 1 - 1e-10)
        for gi, g in enumerate(gts):
            if taken[gi] and not crowd[gi]:
                continue
            if best is not None and not ignored[best] and ignored[gi]:
                break
            iou = _iou_single(d["bbox"], g["bbox"], crowd[gi])
            if iou < best_iou:
                continue
            best, best_iou = gi, iou
        if best is None:
            d_area = d["bbox"][2] * d["bbox"][3]
            out_of_range = (d_area < area_rng[0] or d_area > area_rng[1])
            dt_match.append(False)
            dt_ignore.append(out_of_range)
        else:
            taken[best] = True
            dt_match.append(True)
            dt_ignore.append(ignored[best])
    return dt_match, dt_ignore, sum(1 for ig in ignored if not ig)


def _ap_from_pr(rc, pr, scores):
    """101-point interpolated AP: precision envelope sampled at REC_THRS."""
    # envelope: precision at recall >= r
    n = len(pr)
    env = list(pr)
    for i in range(n - 2, -1, -1):
        env[i] = max(env[i], env[i + 1])
    q = []
    for r in REC_THRS:
        idx = None
        for i in range(n):
            if rc[i] >= r:
                idx = i
                break
        q.append(env[idx] if idx is not None else 0.0)
    return q


def reference_eval(gt_dict, detections):
    """Full independent evaluation -> stats vector (pycocotools layout)."""
    cats = sorted(c["id"] for c in gt_dict["categories"])
    img_ids = sorted(i["id"] for i in gt_dict["images"])
    anns_by = {}
    for a in gt_dict["annotations"]:
        a = dict(a)
        a.setdefault("area", a["bbox"][2] * a["bbox"][3])
        anns_by.setdefault((a["image_id"], a["category_id"]), []).append(a)
    dts_by = {}
    for d in detections:
        dts_by.setdefault((d["image_id"], d["category_id"]), []).append(d)

    T = len(IOU_THRS)
    area_names = list(AREA_RNG)
    precision = np.full((T, 101, len(cats), len(area_names), len(MAX_DETS)),
                        -1.0)
    recall = np.full((T, len(cats), len(area_names), len(MAX_DETS)), -1.0)

    for ki, cat in enumerate(cats):
        for ai, aname in enumerate(area_names):
            rng = AREA_RNG[aname]
            for mi, max_det in enumerate(MAX_DETS):
                # per-image match results, then global score-ordered merge
                records = []   # (score, image_order, idx, matched, ignored)
                num_gt = 0
                any_pair = False
                for img in img_ids:
                    gts = anns_by.get((img, cat), [])
                    dts = dts_by.get((img, cat), [])
                    if not gts and not dts:
                        continue
                    any_pair = True
                    dts = sorted(dts, key=lambda d: -d["score"])[
                        :max(MAX_DETS)]
                    # NOTE: pycocotools truncates to maxDets[-1] first
                    # (computeIoU / evaluateImg), then to `max_det` in
                    # accumulate
                    dts_m = dts[:max_det]
                    per_thr = []
                    for thr in IOU_THRS:
                        m, ig, n_gt = _match_image(dts_m, gts, thr, rng)
                        per_thr.append((m, ig))
                    num_gt += _match_image(dts_m, gts, 0.5, rng)[2]
                    for di, d in enumerate(dts_m):
                        records.append((d["score"], img, di, [
                            per_thr[t][0][di] for t in range(T)], [
                            per_thr[t][1][di] for t in range(T)]))
                if not any_pair or num_gt == 0:
                    continue
                records.sort(key=lambda r: -r[0])
                for t in range(T):
                    tp = fp = 0
                    rc, pr, sc = [], [], []
                    for score, _img, _di, matched, ignored in records:
                        if ignored[t]:
                            continue
                        if matched[t]:
                            tp += 1
                        else:
                            fp += 1
                        rc.append(tp / num_gt)
                        pr.append(tp / max(tp + fp, 1e-300))
                        sc.append(score)
                    recall[t, ki, ai, mi] = rc[-1] if rc else 0.0
                    precision[t, :, ki, ai, mi] = _ap_from_pr(rc, pr, sc)

    def mean_valid(x):
        v = x[x > -1]
        return float(v.mean()) if v.size else -1.0

    stats = [
        mean_valid(precision[:, :, :, 0, MAX_DETS.index(100)]),
        mean_valid(precision[IOU_THRS == 0.5][:, :, :, 0,
                                              MAX_DETS.index(100)]),
        mean_valid(precision[np.isclose(IOU_THRS, 0.75)][:, :, :, 0,
                                                         MAX_DETS.index(100)]),
        mean_valid(precision[:, :, :, 1, MAX_DETS.index(100)]),
        mean_valid(precision[:, :, :, 2, MAX_DETS.index(100)]),
        mean_valid(precision[:, :, :, 3, MAX_DETS.index(100)]),
        mean_valid(recall[:, :, 0, MAX_DETS.index(1)]),
        mean_valid(recall[:, :, 0, MAX_DETS.index(10)]),
        mean_valid(recall[:, :, 0, MAX_DETS.index(100)]),
        mean_valid(recall[:, :, 1, MAX_DETS.index(100)]),
        mean_valid(recall[:, :, 2, MAX_DETS.index(100)]),
        mean_valid(recall[:, :, 3, MAX_DETS.index(100)]),
    ]
    return np.array(stats)


# --------------------------------------------------------------------------
# Randomized adversarial scenario generator
# --------------------------------------------------------------------------

def random_scenario(rng, n_images=4, n_cats=3, crowd_prob=0.25,
                    ignore_prob=0.15, tie_prob=0.3):
    images, annotations, detections = [], [], []
    ann_id = 1
    for img_id in range(1, n_images + 1):
        images.append({"id": img_id, "height": 400, "width": 400})
        for cat in range(1, n_cats + 1):
            for _ in range(rng.integers(0, 4)):
                # areas straddle the 32^2 / 96^2 boundaries on purpose
                w = float(rng.choice([8, 31, 32, 33, 95, 96, 97, 150])
                          + rng.uniform(0, 2))
                h = float(rng.choice([8, 32, 96, 120]) + rng.uniform(0, 2))
                x = float(rng.uniform(0, 300))
                y = float(rng.uniform(0, 300))
                annotations.append({
                    "id": ann_id, "image_id": img_id, "category_id": cat,
                    "bbox": [x, y, w, h], "area": w * h,
                    "iscrowd": int(rng.uniform() < crowd_prob),
                    "ignore": int(rng.uniform() < ignore_prob)})
                ann_id += 1
            n_dt = int(rng.integers(0, 6))
            base_score = rng.uniform(0.1, 0.9)
            for j in range(n_dt):
                # half the detections jitter around a GT box (matchable),
                # half are random (FPs); scores tie frequently
                if annotations and rng.uniform() < 0.7:
                    # jitter tightly enough that IoU spans ~0.4-0.95, i.e.
                    # matches flip across the 0.5:0.95 threshold ladder
                    src = annotations[int(rng.integers(0, len(annotations)))]
                    bx = [src["bbox"][0] + rng.uniform(-3, 3),
                          src["bbox"][1] + rng.uniform(-3, 3),
                          max(2.0, src["bbox"][2] * rng.uniform(0.9, 1.1)),
                          max(2.0, src["bbox"][3] * rng.uniform(0.9, 1.1))]
                else:
                    bx = [float(rng.uniform(0, 300)),
                          float(rng.uniform(0, 300)),
                          float(rng.uniform(4, 120)),
                          float(rng.uniform(4, 120))]
                score = (base_score if rng.uniform() < tie_prob
                         else float(rng.uniform(0.01, 0.99)))
                detections.append({
                    "image_id": img_id, "category_id": cat,
                    "bbox": [float(v) for v in bx], "score": float(score)})
    gt = {"images": images, "annotations": annotations,
          "categories": [{"id": c, "name": str(c)}
                         for c in range(1, n_cats + 1)]}
    return gt, detections


def run_native(gt_dict, detections):
    ev = COCOEval(COCOIndex(gt_dict), detections)
    ev.evaluate()
    ev.accumulate()
    return ev.stats


@pytest.mark.parametrize("seed", range(25))
def test_randomized_differential(seed):
    rng = np.random.default_rng(seed)
    gt, dts = random_scenario(rng)
    native = run_native(gt, dts)
    ref = reference_eval(gt, dts)
    np.testing.assert_allclose(native, ref, atol=1e-9,
                               err_msg=f"seed={seed}")


def test_many_detections_maxdets_truncation():
    """>100 detections on one image exercises the maxDets path end to end."""
    rng = np.random.default_rng(99)
    gt, dts = random_scenario(rng, n_images=1, n_cats=1, crowd_prob=0.0)
    # inflate detections well past 100
    base = dict(dts[0]) if dts else {
        "image_id": 1, "category_id": 1, "bbox": [10, 10, 20, 20],
        "score": 0.5}
    for i in range(130):
        d = dict(base)
        d["bbox"] = [float(10 + i % 7), float(10 + i % 5), 20.0, 20.0]
        d["score"] = float(0.99 - 0.005 * i)
        dts.append(d)
    np.testing.assert_allclose(run_native(gt, dts), reference_eval(gt, dts),
                               atol=1e-9)


def test_crowd_absorbs_multiple_detections():
    """A crowd GT may match many detections; all become ignored, none FP."""
    gt = {"images": [{"id": 1, "height": 100, "width": 100}],
          "categories": [{"id": 1, "name": "c"}],
          "annotations": [
              {"id": 1, "image_id": 1, "category_id": 1,
               "bbox": [0, 0, 80, 80], "area": 6400, "iscrowd": 1},
              {"id": 2, "image_id": 1, "category_id": 1,
               "bbox": [85, 85, 10, 10], "area": 100, "iscrowd": 0}]}
    dts = [{"image_id": 1, "category_id": 1, "score": 0.9,
            "bbox": [5, 5, 20, 20]},
           {"image_id": 1, "category_id": 1, "score": 0.8,
            "bbox": [40, 40, 20, 20]},
           {"image_id": 1, "category_id": 1, "score": 0.7,
            "bbox": [85, 85, 10, 10]}]
    native = run_native(gt, dts)
    ref = reference_eval(gt, dts)
    np.testing.assert_allclose(native, ref, atol=1e-9)
    # the non-crowd GT is found at every threshold: AR@100(all) == 1
    assert native[8] == 1.0


def test_empty_detections_and_empty_images():
    gt = {"images": [{"id": 1, "height": 10, "width": 10},
                     {"id": 2, "height": 10, "width": 10}],
          "categories": [{"id": 1, "name": "c"}],
          "annotations": [
              {"id": 1, "image_id": 1, "category_id": 1,
               "bbox": [1, 1, 5, 5], "area": 25, "iscrowd": 0}]}
    dts = [{"image_id": 2, "category_id": 1, "score": 0.9,
            "bbox": [1, 1, 5, 5]}]  # detection only on the empty image
    np.testing.assert_allclose(run_native(gt, dts), reference_eval(gt, dts),
                               atol=1e-9)
