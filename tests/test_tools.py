"""Dataset tools tests: COCO parser, sharded writer, COCO converter."""

import json
import os

import numpy as np
import pytest

from retinanet_tpu.data import tfrecord
from retinanet_tpu.tools.coco_converter import COCOConverter
from retinanet_tpu.tools.coco_parser import CocoParser
from retinanet_tpu.tools.tfrecord_writer import TFrecordWriter


@pytest.fixture()
def coco_root(tmp_path):
    root = tmp_path / "coco"
    (root / "annotations").mkdir(parents=True)
    (root / "val2017").mkdir()
    ann = {
        "images": [
            {"id": 10, "height": 100, "width": 200, "file_name": "a.jpg"},
            {"id": 11, "height": 50, "width": 50, "file_name": "b.jpg"},
            {"id": 12, "height": 10, "width": 10, "file_name": "c.jpg"},
        ],
        "annotations": [
            {"id": 1, "image_id": 10, "category_id": 18,
             "bbox": [10, 20, 50, 40], "iscrowd": 0, "area": 2000},
            {"id": 2, "image_id": 10, "category_id": 2,
             "bbox": [0, 0, 300, 10], "iscrowd": 0, "area": 3000},  # invalid
            {"id": 3, "image_id": 11, "category_id": 2,
             "bbox": [5, 5, 10, 10], "iscrowd": 1, "area": 100},  # crowd
            {"id": 4, "image_id": 12, "category_id": 18,
             "bbox": [1, 1, 5, 5], "iscrowd": 0, "area": 25},
        ],
        "categories": [{"id": 18, "name": "dog"}, {"id": 2, "name": "cat"}],
    }
    with open(root / "annotations" / "instances_val2017.json", "w") as f:
        json.dump(ann, f)
    return str(root)


def test_coco_parser_filters(coco_root):
    parser = CocoParser(coco_root, only_val=True)
    samples = parser.dataset["val"]
    # image 11 dropped (only crowd ann), image 10 keeps 1 of 2 anns
    assert {s["image_id"] for s in samples} == {10, 12}
    s10 = next(s for s in samples if s["image_id"] == 10)
    assert len(s10["label"]["classes"]) == 1
    np.testing.assert_allclose(s10["label"]["boxes"][0], [10, 20, 60, 60])
    assert s10["label"]["classes"] == [18]


def test_coco_parser_remap(coco_root):
    parser = CocoParser(coco_root, only_val=True, remap_class_ids=True)
    # alphabetical: cat -> 0, dog -> 1
    assert parser.get_class_id("cat") == 0
    assert parser.get_class_id("dog") == 1
    s10 = next(s for s in parser.dataset["val"] if s["image_id"] == 10)
    assert s10["label"]["classes"] == [1]
    info = parser._remapping_info
    assert info["orig_class_id_to_remapped_class_id"] == {18: 1, 2: 0}


def test_sharded_writer(tmp_path):
    writer = TFrecordWriter(n_samples=7, n_shards=3,
                            output_dir=str(tmp_path), prefix="val")
    boxes = np.array([[0.1, 0.1, 0.5, 0.5]], np.float32)
    for i in range(7):
        writer.push(b"img%d" % i, boxes, np.array([i]), i)
    writer.flush_last()
    files = sorted(os.listdir(tmp_path))
    assert files == ["val-0001.tfrecord", "val-0002.tfrecord",
                     "val-0003.tfrecord"]
    # 2 + 2 + 3 split (remainder goes to the last shard)
    counts = [len(list(tfrecord.read_records(str(tmp_path / f))))
              for f in files]
    assert counts == [2, 2, 3]
    parsed = tfrecord.parse_detection_example(
        next(tfrecord.read_records(str(tmp_path / files[0]))))
    assert parsed["image"] == b"img0"


def test_coco_converter(tmp_path):
    parsed = {
        "name": "custom",
        "dataset": {
            "train": [],
            "val": [{
                "image": "/x/img1.jpg", "image_id": 7,
                "image_height": 100, "image_width": 200,
                "label": {"boxes": [[0.1, 0.2, 0.5, 0.6]], "classes": [1]},
            }],
        },
    }
    pj = tmp_path / "parsed.json"
    pj.write_text(json.dumps(parsed))
    lm = tmp_path / "label_map.json"
    lm.write_text(json.dumps({"1": "traffic_sign"}))
    out_dir = tmp_path / "out"
    COCOConverter(str(pj), str(lm), str(out_dir), only_val=True).convert()
    with open(out_dir / "instances_val.json") as f:
        coco = json.load(f)
    assert coco["categories"] == [
        {"supercategory": 1, "id": 1, "name": "traffic_sign"}]
    ann = coco["annotations"][0]
    np.testing.assert_allclose(ann["bbox"], [20, 20, 80, 40])
    assert ann["area"] == pytest.approx(3200.0)
    # output must load in our evaluator
    from retinanet_tpu.eval.coco import COCOIndex
    idx = COCOIndex(str(out_dir / "instances_val.json"))
    assert idx.image_ids == [7]
