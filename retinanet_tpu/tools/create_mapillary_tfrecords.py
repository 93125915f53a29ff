"""CLI: Mapillary Traffic Sign dataset -> sharded tfrecords.

Capability parity with reference
retinanet/dataset_utils/create_mapillary_tfrecords.py (boxes are already
normalized in the parsed samples; optional single-class collapse).

Usage:
  python -m retinanet_tpu.tools.create_mapillary_tfrecords \
      --download_path /data/mapillary --output_dir /data/mtsd_tfrecords
"""

from __future__ import annotations

import os

import numpy as np
from absl import app, flags, logging

FLAGS = flags.FLAGS

flags.DEFINE_string("download_path", None, "Mapillary dataset root")
flags.DEFINE_string("output_dir", "mtsd_tfrecords", "Output directory")
flags.DEFINE_integer("num_shards", 64, "Train shards (val fixed at 16)")
flags.DEFINE_boolean("discard_classes", False,
                     "Collapse every class to `traffic_sign`")
flags.DEFINE_boolean("skip_ambiguous", False, "Skip ambiguous instances")
flags.DEFINE_boolean("only_val", False, "Only process the val split")


def write_tfrecords(data, num_shards, output_dir, split_name):
    from retinanet_tpu.tools.tfrecord_writer import TFrecordWriter
    writer = TFrecordWriter(n_samples=len(data), n_shards=num_shards,
                            output_dir=output_dir, prefix=split_name)
    bad = 0
    for sample in data:
        try:
            with open(sample["image"], "rb") as f:
                image = f.read()
        except Exception:
            bad += 1
            continue
        writer.push(image,
                    np.asarray(sample["label"]["boxes"], np.float32),
                    np.asarray(sample["label"]["classes"], np.int32),
                    sample["image_id"])
    writer.flush_last()
    if bad:
        logging.warning("Skipped %d unreadable images from %s", bad,
                        split_name)


def main(_):
    from retinanet_tpu.tools.mapillary_parser import MapillaryParser

    os.makedirs(FLAGS.output_dir, exist_ok=True)
    parser = MapillaryParser(
        FLAGS.download_path,
        discard_classes=FLAGS.discard_classes,
        skip_ambiguous=FLAGS.skip_ambiguous,
        only_val=FLAGS.only_val)
    parser.dump_parsed_dataset()
    if not FLAGS.only_val:
        write_tfrecords(parser.dataset["train"], FLAGS.num_shards,
                        FLAGS.output_dir, "train")
    write_tfrecords(parser.dataset["val"], 16, FLAGS.output_dir, "val")


if __name__ == "__main__":
    flags.mark_flag_as_required("download_path")
    app.run(main)
