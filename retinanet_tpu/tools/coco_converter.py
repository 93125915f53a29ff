"""Parsed-dataset json -> COCO-format annotations (for eval on custom
datasets).

Capability parity with reference
retinanet/dataset_utils/coco_converter.py:9-170 + the
convert_dataset_to_coco_format.py CLI: boxes arrive normalized [0,1],
optionally rescaled to a max-side-resized image, emitted as COCO xywh.

CLI: python -m retinanet_tpu.tools.coco_converter \
       --parsed_dataset_json ... --label_map ... --output_dir ...
"""

from __future__ import annotations

import json
import os
from typing import Dict

from absl import app, flags, logging


class COCOConverter:
    def __init__(self,
                 parsed_dataset_json: str,
                 label_map: str,
                 output_dir: str = "./dataset",
                 resize_max_side: int = 0,
                 only_val: bool = True):
        with open(parsed_dataset_json) as f:
            self.parsed_dataset = json.load(f)
        with open(label_map) as f:
            self.label_map: Dict[str, str] = json.load(f)
        self.output_dir = output_dir
        self.resize_max_side = resize_max_side
        self._only_val = only_val

    def _convert_split(self, split: str, categories) -> None:
        out = {"info": {}, "licenses": [{"id": 1, "name": "", "url": ""}],
               "categories": categories, "images": [], "annotations": []}
        for sample in self.parsed_dataset["dataset"][split]:
            out["images"].append({
                "id": int(sample["image_id"]),
                "license": 1,
                "width": sample["image_width"],
                "height": sample["image_height"],
                "file_name": os.path.basename(sample["image"]),
            })
            labels = sample["label"]
            for box, class_id in zip(labels["boxes"], labels["classes"]):
                for coordinate in box:
                    if coordinate < 0 or coordinate > 1:
                        raise AssertionError(f"Invalid box {box}")
                x1, y1, x2, y2 = box
                h, w = sample["image_height"], sample["image_width"]
                if self.resize_max_side and max(h, w) > self.resize_max_side:
                    scale = self.resize_max_side / max(h, w)
                    h, w = int(h * scale), int(w * scale)
                x1, y1, x2, y2 = x1 * w, y1 * h, x2 * w, y2 * h
                out["annotations"].append({
                    "id": len(out["annotations"]),
                    "image_id": int(sample["image_id"]),
                    "iscrowd": 0,
                    "category_id": class_id,
                    "segmentation": [1],
                    "area": float((x2 - x1) * (y2 - y1)),
                    "bbox": [float(x1), float(y1),
                             float(x2 - x1), float(y2 - y1)],
                })
        path = os.path.join(self.output_dir, f"instances_{split}.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=4)
        logging.info("Converted %d samples / %d annotations from %s -> %s",
                     len(self.parsed_dataset["dataset"][split]),
                     len(out["annotations"]), split, path)

    def convert(self) -> None:
        os.makedirs(self.output_dir, exist_ok=True)
        categories = [
            {"supercategory": int(cid), "id": int(cid), "name": name}
            for cid, name in self.label_map.items()]
        if not self._only_val:
            self._convert_split("train", categories)
        self._convert_split("val", categories)


FLAGS = flags.FLAGS
flags.DEFINE_string("parsed_dataset_json", None,
                    "Path to the parsed dataset json")
flags.DEFINE_string("label_map", None, "Path to the parsed label map")
flags.DEFINE_string("output_dir", "./converted_dataset", "Output directory")
flags.DEFINE_integer("resize_max_side", 0, "Resize max side to this value")
flags.DEFINE_boolean("only_val", False, "Only convert the val split")


def main(_):
    COCOConverter(FLAGS.parsed_dataset_json, FLAGS.label_map,
                  FLAGS.output_dir, FLAGS.resize_max_side,
                  FLAGS.only_val).convert()


if __name__ == "__main__":
    flags.mark_flag_as_required("parsed_dataset_json")
    flags.mark_flag_as_required("label_map")
    app.run(main)
