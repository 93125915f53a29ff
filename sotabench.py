"""Benchmark-harness entry point (sotabench-style).

Capability parity with the reference's repo-root sotabench.py:55-97: a
model-zoo table mapping released configurations to serving artifacts, each
evaluated on COCO val2017 and reported. The reference downloaded
SavedModels from GitHub releases and uploaded results to sotabench.com;
here the zoo points at local/exported artifact dirs (populate after
training runs) and results print as JSON.

Usage: python sotabench.py [--image_dir ...] [--annotation_file ...]
"""

from __future__ import annotations

import json
import os

from absl import app, flags, logging

FLAGS = flags.FLAGS
flags.DEFINE_string("image_dir", "datasets/coco/val2017", "val2017 images")
flags.DEFINE_string("annotation_file",
                    "datasets/coco/annotations/instances_val2017.json",
                    "COCO val2017 annotations")
flags.DEFINE_integer("limit", None, "Max images per model")

# name -> exported artifact directory (see python -m retinanet_tpu.export)
_MODEL_ZOO = {
    "mscoco-retinanet-resnet50-640x640-30x-256": "export/resnet50-640",
}


def main(argv):
    del argv
    from retinanet_tpu.export.evaluate_artifact import evaluate

    results = {}
    for name, artifact_dir in _MODEL_ZOO.items():
        if not os.path.isdir(artifact_dir):
            logging.warning("Skipping %s: artifact %s not found", name,
                            artifact_dir)
            continue
        logging.info("Evaluating %s", name)
        results[name] = evaluate(
            artifact_dir, FLAGS.image_dir, FLAGS.annotation_file,
            limit=FLAGS.limit)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    app.run(main)
