"""True int8 quality delta on a TRAINED model: fp vs int8-activation mAP.

Runs on the artifact of tools/overfit_check.py (a model trained to
AP@0.5 ~0.99 on learnable synthetic scenes): calibrates activation scales
on the real data stream, then evaluates BOTH the fp and the int8-activation
serving paths against the ground-truth annotations with the full COCO
protocol — the mAP-delta report the reference's TRT int8 path never
quantified (reference tensorrt/calibrator.py only calibrated; quality was
eyeballed).

Usage:
  python tools/overfit_check.py --steps 300 --workdir /tmp/overfit_keep
  python tools/int8_quality_check.py --workdir /tmp/overfit_keep
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from absl import app, flags, logging

FLAGS = flags.FLAGS
# tools.overfit_check (imported for make_params) already defines --workdir
flags.DEFINE_string("int8_workdir", None, "overfit_check workdir")
flags.DEFINE_string("mode", "entropy", "minmax | percentile | entropy")

# geometry flags (--input_size/--resnet_depth/--fpn_filters/--head_convs)
# are shared with tools.overfit_check — import it at module scope so they
# are registered before absl parses argv; pass the same values used for
# the overfit run.
from tools import overfit_check as _overfit_check  # noqa: E402
flags.mark_flag_as_required("int8_workdir")


def main(argv):
    del argv
    import retinanet_tpu.core.cache  # noqa: F401
    import jax
    import jax.numpy as jnp
    from retinanet_tpu.data.pipeline import InputPipeline
    from retinanet_tpu.eval.coco_evaluator import COCOEvaluator
    from retinanet_tpu.export.calibration import calibrate_activations
    from retinanet_tpu.export.quantize import Int8Model
    from retinanet_tpu.ops.postprocess import make_inference_fn
    from retinanet_tpu.train.executor import Executor
    make_params = _overfit_check.make_params

    workdir = FLAGS.int8_workdir
    pattern = os.path.join(workdir, "data", "train-*")
    ann = glob.glob(os.path.join(workdir, "data", "annotations_*.json"))[0]
    params = make_params(workdir, pattern, ann, steps=300,
                         input_size=FLAGS.input_size,
                         depth=FLAGS.resnet_depth,
                         filters=FLAGS.fpn_filters,
                         head_convs=FLAGS.head_convs)

    ex = Executor(params, run_mode="val",
                  val_input_fn=lambda: InputPipeline("val", params),
                  enable_tensorboard=False)
    assert ex.latest_checkpoint_step() is not None, "train first"

    fp_scores = ex.evaluate()
    logging.info("fp scores: %s", fp_scores)

    # calibrate on the real data stream; at production resolution feed
    # single-image batches — the histogram pass materializes per-conv
    # stats over every intermediate and a bs=8 640x640 pass overflows
    # this chip during calibration (stats merge across batches anyway)
    batches = []
    for i, batch in enumerate(ex.val_input_fn()):
        img = batch["image"]
        if FLAGS.input_size >= 512:
            batches.extend(np.asarray(img[j:j + 1])
                           for j in range(img.shape[0]))
        else:
            batches.append(img)
        if i >= 1:
            break
    variables = {"params": jax.device_get(ex.state.params),
                 "batch_stats": jax.device_get(ex.state.batch_stats)}
    scales = calibrate_activations(
        ex.model, variables, batches, mode=FLAGS.mode,
        preprocess=lambda im: ex.normalizer(im).astype(ex.compute_dtype))
    logging.info("calibrated %d convs (%s)", len(scales), FLAGS.mode)

    q_infer = jax.jit(make_inference_fn(
        Int8Model(ex.model, scales), params, ex.anchors, ex.normalizer,
        compute_dtype=ex.compute_dtype))
    evaluator = COCOEvaluator(
        input_shape=params.input.input_shape,
        annotation_file_path=ann,
        prediction_file_path=os.path.join(workdir, "predictions_int8.json"),
        remap_class_ids=False)
    for batch in ex.val_input_fn():
        det = jax.device_get(q_infer(
            ex.state.params, ex.state.batch_stats,
            jnp.asarray(batch["image"])))
        evaluator.accumulate_results({
            "image_id": batch["image_id"], "detections": det,
            "resize_scale": batch["resize_scale"]})
    q_scores = evaluator.evaluate()
    logging.info("int8 scores: %s", q_scores)

    report = {
        "calibration_mode": FLAGS.mode,
        "num_calibrated_convs": len(scales),
        "fp": {k: round(v, 4) for k, v in fp_scores.items()},
        "int8": {k: round(v, 4) for k, v in q_scores.items()},
        "ap_delta": round(
            fp_scores["AP-IoU=0.50:0.95"] - q_scores["AP-IoU=0.50:0.95"], 4),
        "ap50_delta": round(
            fp_scores["AP-IoU=0.50"] - q_scores["AP-IoU=0.50"], 4),
    }
    out = os.path.join(workdir, "int8_quality_report.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    app.run(main)
