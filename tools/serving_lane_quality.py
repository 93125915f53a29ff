"""Trained-model mAP delta for the DEFAULT serving lane (and compositions).

The shipped serving defaults deviate from the reference's exact pipeline
in three deliberate ways (ops/postprocess.py:make_inference_fn):
approx top-k candidate selection (recall target 0.95), bf16 logit
selection, and nms_top_k=256. The int8 lane got a trained-model mAP
delta in round 3 (minmax 0.0035); this tool gives the DEFAULT lane — the
one every user actually serves — the same treatment, against the exact
reference semantics (f32 end-to-end `top_k`, nms_top_k=pre_nms_top_k,
reference model/layers/postprocessing_ops.py:120-173).

Runs on the artifact of tools/overfit_check.py (a model trained on
learnable synthetic scenes with COCO annotations):

  python tools/overfit_check.py --steps 300 --workdir /tmp/overfit_keep \
      --input_size 640 --resnet_depth 50 --fpn_filters 256 --head_convs 4
  python tools/serving_lane_quality.py --lane_workdir /tmp/overfit_keep \
      --input_size 640 --resnet_depth 50 --fpn_filters 256 --head_convs 4

Lanes evaluated:
  exact        f32 exact top-k, nms_top_k = pre_nms_top_k  (reference)
  default      shipped defaults (approx top-k + bf16 + nms_top_k=256)
  default+int8 the fastest composition users will pick (default lane on
               int8-activation convs, minmax calibration)

Writes serving_lane_report.json into the workdir and asserts
|mAP(default) - mAP(exact)| <= --max_default_delta (0.002).
"""

from __future__ import annotations

import copy
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from absl import app, flags, logging

FLAGS = flags.FLAGS
flags.DEFINE_string("lane_workdir", None, "overfit_check workdir")
flags.DEFINE_float("max_default_delta", 0.002,
                   "max |mAP(default)-mAP(exact)| before the default lane "
                   "is declared mis-set")

from tools import overfit_check as _overfit_check  # noqa: E402

flags.mark_flag_as_required("lane_workdir")


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

    workdir = FLAGS.lane_workdir
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

    def lane_params(**inference_overrides):
        p = copy.deepcopy(params)
        p.inference.update(inference_overrides)
        return p

    lanes = {
        "exact": dict(
            model=ex.model,
            params=lane_params(
                use_approx_top_k=False,
                nms_top_k=int(params.inference.pre_nms_top_k))),
        "default": dict(model=ex.model, params=lane_params()),
    }

    # int8 composition: default lane on s8xs8->s32 convs
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
        ex.model, variables, batches, mode="minmax",
        preprocess=lambda im: ex.normalizer(im).astype(ex.compute_dtype))
    lanes["default+int8"] = dict(model=Int8Model(ex.model, scales),
                                 params=lane_params())

    scores = {}
    for name, spec in lanes.items():
        infer = jax.jit(make_inference_fn(
            spec["model"], spec["params"], ex.anchors, ex.normalizer,
            compute_dtype=ex.compute_dtype))
        evaluator = COCOEvaluator(
            input_shape=params.input.input_shape,
            annotation_file_path=ann,
            prediction_file_path=os.path.join(
                workdir, f"predictions_lane_{name.replace('+', '_')}.json"),
            remap_class_ids=False)
        for batch in ex.val_input_fn():
            det = jax.device_get(infer(
                ex.state.params, ex.state.batch_stats,
                jnp.asarray(batch["image"])))
            evaluator.accumulate_results({
                "image_id": batch["image_id"], "detections": det,
                "resize_scale": batch["resize_scale"]})
        scores[name] = evaluator.evaluate()
        logging.info("lane %s: %s", name, scores[name])

    ap = {k: v["AP-IoU=0.50:0.95"] for k, v in scores.items()}
    ap50 = {k: v["AP-IoU=0.50"] for k, v in scores.items()}
    report = {
        "lanes": {k: {m: round(x, 4) for m, x in v.items()}
                  for k, v in scores.items()},
        "map_exact": round(ap["exact"], 4),
        "map_default": round(ap["default"], 4),
        "map_default_int8": round(ap["default+int8"], 4),
        "default_delta": round(ap["exact"] - ap["default"], 4),
        "default_ap50_delta": round(ap50["exact"] - ap50["default"], 4),
        "default_int8_delta": round(ap["exact"] - ap["default+int8"], 4),
    }
    out = os.path.join(workdir, "serving_lane_report.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))
    if abs(report["default_delta"]) > FLAGS.max_default_delta:
        raise SystemExit(
            f"FAIL: default-lane mAP delta {report['default_delta']} "
            f"exceeds {FLAGS.max_default_delta} — the shipped default is "
            "mis-set")
    print(f"DEFAULT LANE OK: mAP delta {report['default_delta']} <= "
          f"{FLAGS.max_default_delta}")


if __name__ == "__main__":
    app.run(main)
