"""CLI: COCO download dir -> sharded tfrecords.

Capability parity with reference
retinanet/dataset_utils/create_coco_tfrecords.py:41-86 (boxes normalized by
image size, default 256 train / 32 val shards).

Usage:
  python -m retinanet_tpu.tools.create_coco_tfrecords \
      --download_path /data/coco --output_dir /data/coco_tfrecords
"""

from __future__ import annotations

import os

import numpy as np
from absl import app, flags, logging

FLAGS = flags.FLAGS

flags.DEFINE_string("download_path", None, "COCO root directory")
flags.DEFINE_string("output_dir", "coco_tfrecords", "Output directory")
flags.DEFINE_integer("num_shards", 256, "Train shards (val is fixed at 32)")
flags.DEFINE_boolean("remap_class_ids", False,
                     "Remap category ids to contiguous [0, N)")
flags.DEFINE_boolean("only_dump_parsed_dataset", False,
                     "Only write label map / remapping info")
flags.DEFINE_boolean("only_val", False, "Only process the val split")


def _image_dims(image_bytes: bytes):
    import cv2
    img = cv2.imdecode(np.frombuffer(image_bytes, np.uint8),
                       cv2.IMREAD_COLOR)
    if img is None:
        raise ValueError("failed to decode")
    return img.shape[0], img.shape[1]


def write_tfrecords(data, num_shards, output_dir, split_name):
    from retinanet_tpu.tools.tfrecord_writer import TFrecordWriter
    writer = TFrecordWriter(n_samples=len(data), n_shards=num_shards,
                            output_dir=output_dir, prefix=split_name)
    bad = 0
    for sample in data:
        try:
            with open(sample["image"], "rb") as f:
                image = f.read()
            h, w = _image_dims(image)
        except Exception:
            bad += 1
            continue
        boxes = (np.asarray(sample["label"]["boxes"], np.float32)
                 / np.array([w, h, w, h], np.float32))
        writer.push(image, boxes,
                    np.asarray(sample["label"]["classes"], np.int32),
                    sample["image_id"])
    writer.flush_last()
    if bad:
        logging.warning("Skipped %d corrupted samples from %s", bad,
                        split_name)


def main(_):
    from retinanet_tpu.tools.coco_parser import CocoParser

    os.makedirs(FLAGS.output_dir, exist_ok=True)
    parser = CocoParser(FLAGS.download_path,
                        remap_class_ids=FLAGS.remap_class_ids,
                        only_val=FLAGS.only_val)
    parser.dump_parsed_dataset()
    if FLAGS.only_dump_parsed_dataset:
        return
    if not FLAGS.only_val:
        write_tfrecords(parser.dataset["train"], FLAGS.num_shards,
                        FLAGS.output_dir, "train")
    write_tfrecords(parser.dataset["val"], 32, FLAGS.output_dir, "val")


if __name__ == "__main__":
    flags.mark_flag_as_required("download_path")
    app.run(main)
