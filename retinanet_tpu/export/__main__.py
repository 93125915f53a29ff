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


if __name__ == "__main__":
    app.run(main)
