"""Export CLI: `python -m retinanet_tpu.export --config_path ... --export_dir ...`

Flag parity with reference retinanet/export.py:15-106 where meaningful on
TPU: config_path, export_dir, mode (tf | tf_tensorrt | onnx |
onnx_tensorrt — the last three map to the skip-NMS / skip-decode serving
graphs the reference produced for TRT/ONNX consumers), checkpoint
selection, EMA weight swap, int8 PTQ (replacing TRT INT8 calibration).
"""

from __future__ import annotations

import os

from absl import app, flags, logging

FLAGS = flags.FLAGS

flags.DEFINE_string("config_path", None, "Experiment config JSON")
flags.DEFINE_string("export_dir", "export", "Output artifact directory")
flags.DEFINE_string("mode", "tf",
                    "tf | tf_tensorrt | onnx | onnx_tensorrt")
flags.DEFINE_string("checkpoint_step", None,
                    "Checkpoint step to export (default: latest)")
flags.DEFINE_string("model_dir", None, "Model dir holding checkpoints")
flags.DEFINE_boolean("use_moving_average", False,
                     "Export EMA weights (reference export.py:167-172)")
flags.DEFINE_boolean("int8", False, "Also write int8-quantized weights")
flags.DEFINE_boolean("int8_activations", False,
                     "Calibrate per-tensor activation scales and report "
                     "int8-activation serving quality (TRT INT8 parity)")
flags.DEFINE_string("calibration_mode", "minmax",
                    "minmax | percentile | entropy. Default minmax: on a "
                    "trained ResNet50-640 the measured mAP deltas were "
                    "minmax 0.0035, percentile 0.0053, entropy 0.1413 — "
                    "the TRT-style KL sweep over-clips deep detection "
                    "models (tools/int8_quality_check.py)")
flags.DEFINE_boolean("require_real_calibration", False,
                     "Hard-fail int8 activation calibration if the real "
                     "val data stream is unavailable (instead of falling "
                     "back to synthetic scenes)")
flags.DEFINE_integer("calibration_batches", 4,
                     "Calibration stream length (synthetic scenes)")
flags.DEFINE_boolean("stablehlo", True,
                     "Serialize the frozen StableHLO serving graph")

flags.mark_flag_as_required("config_path")


def main(argv):
    del argv
    from retinanet_tpu.core.config import Config
    from retinanet_tpu.export import serving as serving_lib
    from retinanet_tpu.train.executor import Executor

    params = Config(FLAGS.config_path).params
    executor = Executor(
        params, run_mode="export", model_dir=FLAGS.model_dir,
        resume_from=FLAGS.checkpoint_step, enable_tensorboard=False)

    if executor.latest_checkpoint_step() is None:
        logging.warning(
            "No checkpoint found in %s — exporting randomly initialized "
            "weights", executor.model_dir)

    model_params = executor.state.params
    if FLAGS.use_moving_average and executor.state.ema_params is not None:
        logging.info("Exporting EMA weights")
        model_params = executor.state.ema_params

    written = serving_lib.export_artifact(
        params, model_params, executor.state.batch_stats,
        FLAGS.export_dir, mode=FLAGS.mode,
        serialize_stablehlo=FLAGS.stablehlo)
    for k, v in written.items():
        logging.info("Wrote %s: %s", k, v)

    if FLAGS.int8:
        import flax.serialization
        import jax
        from retinanet_tpu.export.quantize import quantize_params
        qparams, stats = quantize_params(jax.device_get(model_params))
        path = os.path.join(FLAGS.export_dir, "params_int8.msgpack")
        with open(path, "wb") as f:
            f.write(flax.serialization.to_bytes(qparams))
        logging.info("Wrote int8 weights: %s (compression %.2fx)",
                     path, stats["bytes_fp32"] / max(stats["bytes_q"], 1))

    if FLAGS.int8_activations:
        import json
        import numpy as np
        from retinanet_tpu.data.synthetic import synthetic_train_batch
        from retinanet_tpu.export.calibration import calibrate_activations
        from retinanet_tpu.export.quantize import int8_activation_report

        h, w = (int(params.input.input_shape[0]),
                int(params.input.input_shape[1]))
        # Calibrate on the REAL data stream when the config points at
        # tfrecords (the reference's TRT calibrator read training data,
        # tensorrt/calibrator.py); synthetic scenes only as fallback.
        batches = []
        # provenance travels into activation_scales.json so a degraded
        # calibration is visible in the artifact, not just in a log line
        provenance = {"source": "real",
                      "requested_batches": int(FLAGS.calibration_batches)}
        try:
            from retinanet_tpu.data.pipeline import InputPipeline
            pipe = iter(InputPipeline("val", params, batch_size=2))
            for _ in range(FLAGS.calibration_batches):
                batches.append(next(pipe)["image"])
            del pipe
        except Exception as e:  # noqa: BLE001 - missing/unreadable data
            if FLAGS.require_real_calibration:
                raise RuntimeError(
                    "int8 activation calibration requires the real val "
                    f"stream (--require_real_calibration) but it failed "
                    f"after {len(batches)} batches: "
                    f"{type(e).__name__}: {e}") from e
            provenance["error"] = f"{type(e).__name__}: {e}"
            if batches:
                # keep whatever real batches were read before the error —
                # partial real data beats synthetic scenes
                provenance["source"] = "partial_real"
                logging.warning(
                    "val stream failed after %d batches (%s: %s); "
                    "calibrating on the real batches read so far",
                    len(batches), type(e).__name__, e)
            else:
                provenance["source"] = "synthetic"
                logging.warning(
                    "val tfrecords unavailable (%s: %s); calibrating on "
                    "synthetic scenes", type(e).__name__, e)
                batches = [
                    synthetic_train_batch(
                        2, (h, w), 20,
                        int(params.architecture.head.num_classes),
                        seed=i)["image"]
                    for i in range(FLAGS.calibration_batches)]
        else:
            logging.info("calibrating on %d real val batches", len(batches))
        provenance["used_batches"] = len(batches)
        variables = {"params": model_params,
                     "batch_stats": executor.state.batch_stats}
        scales = calibrate_activations(
            executor.model, variables, batches,
            mode=FLAGS.calibration_mode,
            preprocess=lambda im: executor.normalizer(im).astype(
                executor.compute_dtype))
        spath = os.path.join(FLAGS.export_dir, "activation_scales.json")
        with open(spath, "w") as f:
            json.dump({"mode": FLAGS.calibration_mode,
                       "calibration": provenance, "scales": scales}, f,
                      indent=1)
        report = int8_activation_report(
            executor.model, params, executor.anchors, executor.normalizer,
            variables, scales, [np.asarray(b) for b in batches],
            compute_dtype=executor.compute_dtype)
        rpath = os.path.join(FLAGS.export_dir, "int8_activation_report.json")
        with open(rpath, "w") as f:
            json.dump(report, f, indent=1)
        logging.info("int8 activation calibration (%s): %s -> %s",
                     FLAGS.calibration_mode, report, rpath)

        if FLAGS.stablehlo:
            import jax
            # self-contained quantized serving program (the TRT-engine
            # analog) — evaluate_artifact --use_stablehlo
            # --use_int8_activations runs this blob
            hlo_path = serving_lib.serialize_serving_stablehlo(
                params,
                {"params": jax.device_get(model_params),
                 "batch_stats": jax.device_get(executor.state.batch_stats)},
                FLAGS.export_dir, mode=FLAGS.mode, int8_scales=scales)
            logging.info("Wrote int8 StableHLO: %s", hlo_path)


if __name__ == "__main__":
    app.run(main)
