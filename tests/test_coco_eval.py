"""Native COCO bbox evaluation tests (eval/coco.py, eval/coco_evaluator.py)."""

import numpy as np
import pytest

from retinanet_tpu.eval.coco import COCOEval, COCOIndex, box_iou_xywh


def _dataset(num_images=4, num_classes=3, seed=0):
    rng = np.random.default_rng(seed)
    images, annotations = [], []
    ann_id = 0
    for img_id in range(num_images):
        images.append({"id": img_id, "height": 480, "width": 640,
                       "file_name": f"{img_id}.jpg"})
        for _ in range(int(rng.integers(1, 6))):
            x, y = rng.uniform(0, 400), rng.uniform(0, 300)
            w, h = rng.uniform(20, 200), rng.uniform(20, 150)
            annotations.append({
                "id": ann_id, "image_id": img_id,
                "category_id": int(rng.integers(0, num_classes)),
                "bbox": [x, y, w, h], "area": w * h, "iscrowd": 0})
            ann_id += 1
    cats = [{"id": i, "name": f"c{i}"} for i in range(num_classes)]
    return {"images": images, "annotations": annotations,
            "categories": cats}


def test_perfect_detections_give_ap_one():
    data = _dataset()
    gt = COCOIndex(data)
    dts = [{"image_id": a["image_id"], "category_id": a["category_id"],
            "bbox": list(a["bbox"]), "score": 0.9}
           for a in data["annotations"]]
    ev = COCOEval(gt, dts)
    ev.evaluate()
    ev.accumulate()
    assert ev.stats[0] == pytest.approx(1.0)
    assert ev.stats[1] == pytest.approx(1.0)
    assert ev.stats[8] == pytest.approx(1.0)  # AR@100


def test_no_detections_give_ap_zero():
    data = _dataset()
    ev = COCOEval(COCOIndex(data), [])
    ev.evaluate()
    ev.accumulate()
    assert ev.stats[0] == pytest.approx(0.0)


def test_half_detections():
    """Detect every other GT perfectly -> AP ~= recall-limited value."""
    data = _dataset(num_images=8, num_classes=1, seed=1)
    anns = data["annotations"]
    dts = [{"image_id": a["image_id"], "category_id": a["category_id"],
            "bbox": list(a["bbox"]), "score": 0.9}
           for a in anns[::2]]
    ev = COCOEval(COCOIndex(data), dts)
    ev.evaluate()
    ev.accumulate()
    n_detected = len(anns[::2])
    expected_recall = n_detected / len(anns)
    assert ev.stats[8] == pytest.approx(expected_recall, abs=1e-6)
    # precision is 1 up to that recall: AP = fraction of recall thresholds
    # (101-pt interpolation) covered
    covered = np.mean(np.linspace(0, 1, 101) <= expected_recall + 1e-9)
    assert ev.stats[0] == pytest.approx(covered, abs=0.02)


def test_false_positives_lower_precision():
    data = _dataset(num_images=4, num_classes=1, seed=2)
    dts = [{"image_id": a["image_id"], "category_id": 0,
            "bbox": list(a["bbox"]), "score": 0.9}
           for a in data["annotations"]]
    # add high-scoring junk
    junk = [{"image_id": 0, "category_id": 0,
             "bbox": [600, 400, 30, 30], "score": 0.95}]
    ev_clean = COCOEval(COCOIndex(data), dts)
    ev_clean.evaluate(); ev_clean.accumulate()
    ev_junk = COCOEval(COCOIndex(data), dts + junk)
    ev_junk.evaluate(); ev_junk.accumulate()
    assert ev_junk.stats[0] < ev_clean.stats[0]


def test_crowd_gt_not_counted():
    data = _dataset(num_images=2, num_classes=1, seed=3)
    for a in data["annotations"]:
        a["iscrowd"] = 1
    ev = COCOEval(COCOIndex(data), [])
    ev.evaluate()
    ev.accumulate()
    # no non-crowd GT => all categories absent => stats stay -1
    assert ev.stats[0] == pytest.approx(-1.0)


def test_iou_crowd_uses_detection_area():
    dts = np.array([[0, 0, 10, 10]], np.float64)
    gts = np.array([[0, 0, 100, 100]], np.float64)
    iou = box_iou_xywh(dts, gts, np.array([0]))
    assert iou[0, 0] == pytest.approx(100.0 / 10000.0)
    ioa = box_iou_xywh(dts, gts, np.array([1]))
    assert ioa[0, 0] == pytest.approx(1.0)  # fully inside crowd


def test_evaluator_accumulate_and_rescale(tmp_path):
    import json
    data = _dataset(num_images=1, num_classes=2, seed=4)
    ann_path = tmp_path / "ann.json"
    ann_path.write_text(json.dumps(data))

    from retinanet_tpu.eval.coco_evaluator import COCOEvaluator
    ev = COCOEvaluator(
        input_shape=[64, 64], annotation_file_path=str(ann_path),
        prediction_file_path=str(tmp_path / "pred.json"))
    # one detection: normalized corners in the 64x64 model frame, image
    # resized by scale 0.5 -> original pixels = norm * 64 / 0.5
    results = {
        "image_id": np.array([0, -1]),  # second is a padded slot
        "resize_scale": np.array([[0.5, 0.5], [1.0, 1.0]], np.float32),
        "detections": {
            "boxes": np.array([[[0.1, 0.2, 0.5, 0.6]],
                               [[0.0, 0.0, 0.1, 0.1]]], np.float32),
            "scores": np.array([[0.8], [0.9]], np.float32),
            "classes": np.array([[1], [0]], np.int32),
            "valid_detections": np.array([1, 1], np.int32),
        },
    }
    ev.accumulate_results(results)
    assert len(ev.processed_detections) == 1  # padded slot skipped
    det = ev.processed_detections[0]
    assert det["image_id"] == 0
    assert det["category_id"] == 1
    # (0.1*128, 0.2*128, (0.5-0.1)*128, (0.6-0.2)*128) int-truncated
    np.testing.assert_array_equal(det["bbox"], [12, 25, 52, 51])
