"""Evaluate an exported serving artifact against COCO annotations.

Capability parity with reference retinanet/evaluate_saved_model.py:46-150:
loads the artifact, runs a per-image loop through the prepare_image +
serving signatures with a timing breakdown (read / preprocess / forward),
rescales boxes to original image pixels and runs COCO bbox evaluation.

CLI: python -m retinanet_tpu.export.evaluate_artifact \
       --artifact_dir ... --image_dir ... --annotation_file ...
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import numpy as np
from absl import app, flags, logging

FLAGS = flags.FLAGS

flags.DEFINE_string("artifact_dir", None, "Exported artifact directory")
flags.DEFINE_string("image_dir", None, "Directory of evaluation images")
flags.DEFINE_string("annotation_file", None, "COCO annotations json")
flags.DEFINE_integer("limit", None, "Max images to evaluate")
flags.DEFINE_boolean("remap_class_ids", True,
                     "Map contiguous ids back to COCO category ids")
flags.DEFINE_boolean("use_int8_activations", False,
                     "Serve through the artifact's int8-activation path")
flags.DEFINE_boolean("use_stablehlo", False,
                     "Run through the frozen StableHLO graph")


def evaluate(artifact_dir: str,
             image_dir: str,
             annotation_file: str,
             limit: Optional[int] = None,
             remap_class_ids: bool = True,
             use_stablehlo: bool = False,
             use_int8_activations: bool = False) -> Dict[str, float]:
    from retinanet_tpu.eval.coco import COCOIndex
    from retinanet_tpu.eval.coco_evaluator import COCOEvaluator
    from retinanet_tpu.export.serving import load_artifact
    from retinanet_tpu.utils.image_utils import read_image

    module = load_artifact(artifact_dir, use_stablehlo=use_stablehlo,
                           use_int8_activations=use_int8_activations)
    params = module.params
    evaluator = COCOEvaluator(
        input_shape=params.input.input_shape,
        annotation_file_path=annotation_file,
        prediction_file_path=os.path.join(artifact_dir, "predictions.json"),
        remap_class_ids=remap_class_ids)

    index = COCOIndex(annotation_file)
    items = list(index.imgs.values())
    if limit:
        items = items[:limit]

    timings = {"read": 0.0, "preprocess": 0.0, "forward": 0.0}
    run = module.run_exported if use_stablehlo else module.run_inference
    n = 0
    first_forward = None
    for info in items:
        path = os.path.join(image_dir, info["file_name"])
        if not os.path.exists(path):
            continue
        t0 = time.perf_counter()
        image = read_image(path)
        t1 = time.perf_counter()
        batched, resize_scale = module.prepare_image(image)
        t2 = time.perf_counter()
        det = run(batched)
        t3 = time.perf_counter()
        timings["read"] += t1 - t0
        timings["preprocess"] += t2 - t1
        if first_forward is None:
            # the first call pays compilation — report it separately so
            # the per-image forward number reflects steady state
            # (reference evaluate_saved_model reported warm latencies)
            first_forward = t3 - t2
        else:
            timings["forward"] += t3 - t2
        n += 1
        evaluator.accumulate_results({
            "image_id": np.asarray([info["id"]]),
            "detections": det,
            "resize_scale": resize_scale[None],
        })
    if n:
        logging.info("compile+first forward: %.2f ms", first_forward * 1000)
        for k, v in timings.items():
            warm_n = n - 1 if k == "forward" else n
            if warm_n == 0:
                logging.info("%s: n/a (single image — warm timing needs "
                             ">=2)", k)
            else:
                logging.info("%s: %.2f ms/image", k, v / warm_n * 1000)
    scores = evaluator.evaluate()
    logging.info("Evaluation: %s", scores)
    return scores


def main(argv):
    del argv
    evaluate(FLAGS.artifact_dir, FLAGS.image_dir, FLAGS.annotation_file,
             FLAGS.limit, FLAGS.remap_class_ids, FLAGS.use_stablehlo,
             FLAGS.use_int8_activations)


if __name__ == "__main__":
    flags.mark_flag_as_required("artifact_dir")
    flags.mark_flag_as_required("image_dir")
    flags.mark_flag_as_required("annotation_file")
    app.run(main)
