"""Trainer CLI: `python -m retinanet_tpu --config_path ...`.

Flag parity with reference retinanet/__main__.py:15-171 (config_path,
model_dir, resume_from, run_evaluation, run_continuous_evaluation, xla,
is_multi_host, debug, global_seed, log_dir). TPU-native notes:
  * XLA JIT toggle is meaningless here (everything is jit-compiled);
    the --xla flag is accepted and ignored for compatibility.
  * precision policy comes from floatx.precision (bf16 compute / fp32
    params) — no Keras policy object needed.
"""

from __future__ import annotations

import os
import random

import numpy as np
from absl import app, flags, logging

FLAGS = flags.FLAGS

flags.DEFINE_string("config_path", None, "Path to the experiment config")
flags.DEFINE_string("model_dir", None,
                    "Override experiment.model_dir from the config")
# --log_dir comes from absl.logging's built-in flag
flags.DEFINE_string("resume_from", None,
                    "Checkpoint step to resume from (default: latest)")
flags.DEFINE_boolean("run_evaluation", False,
                     "Run evaluation instead of training")
flags.DEFINE_boolean("run_continuous_evaluation", False,
                     "Continuously evaluate new checkpoints")
flags.DEFINE_boolean("xla", True, "(compat) ignored — always XLA")
flags.DEFINE_boolean("is_multi_host", False,
                     "Shard input files across hosts (TPU pods)")
flags.DEFINE_boolean("debug", False, "Verbose logging")
flags.DEFINE_integer("global_seed", 1337, "Global RNG seed")
flags.DEFINE_boolean("enable_weights_info", False,
                     "Log per-weight norms every 50 outer steps")

flags.mark_flag_as_required("config_path")


def main(argv):
    del argv
    from retinanet_tpu.core.config import Config
    from retinanet_tpu.data.pipeline import InputPipeline
    from retinanet_tpu.parallel import mesh as mesh_lib
    from retinanet_tpu.train.executor import Executor

    if FLAGS.debug:
        logging.set_verbosity(logging.DEBUG)
    if FLAGS.log_dir:
        os.makedirs(FLAGS.log_dir, exist_ok=True)
        logging.get_absl_handler().use_absl_log_file(
            "retinanet_tpu", FLAGS.log_dir)

    random.seed(FLAGS.global_seed)
    np.random.seed(FLAGS.global_seed)

    params = Config(FLAGS.config_path).params
    run_mode = params.experiment.get("run_mode", "train")
    if FLAGS.run_evaluation:
        run_mode = "val"
    if FLAGS.run_continuous_evaluation:
        run_mode = "continuous_eval"

    if FLAGS.is_multi_host:
        mesh_lib.initialize_distributed()

    import jax
    logging.info("JAX devices: %s (process %d/%d)", jax.devices(),
                 jax.process_index(), jax.process_count())

    def train_input_fn():
        return InputPipeline(
            "train", params, is_multi_host=FLAGS.is_multi_host,
            process_index=jax.process_index(),
            process_count=jax.process_count(),
            seed=FLAGS.global_seed)

    def val_input_fn():
        # every host walks the FULL val record stream in the same
        # deterministic order but only DECODES its contiguous 1/P slice of
        # each global batch (val_shard_*): P x less host decode work, each
        # image still enters the global batch exactly once, and only
        # process 0 accumulates results (metadata rides the detection
        # gather — Executor.evaluate). Matches reference executor.py:178-202
        # sharding one val dataset across hosts.
        count = jax.process_count() if FLAGS.is_multi_host else 1
        # loud error on indivisible val batch / process count — floor
        # division would silently shrink validation coverage
        local_bs = (mesh_lib.local_batch_size(
            int(params.training.batch_size.val)) if count > 1
            else int(params.training.batch_size.val))
        return InputPipeline(
            "val", params, is_multi_host=False,
            batch_size=local_bs,
            seed=FLAGS.global_seed,
            val_shard_index=jax.process_index() if count > 1 else 0,
            val_shard_count=count)

    executor = Executor(
        params,
        run_mode=run_mode,
        model_dir=FLAGS.model_dir,
        resume_from=FLAGS.resume_from,
        is_multi_host=FLAGS.is_multi_host,
        train_input_fn=train_input_fn if "train" in run_mode else None,
        val_input_fn=val_input_fn if run_mode != "train" else None,
        enable_weights_info=FLAGS.enable_weights_info,
    )
    executor.run()


if __name__ == "__main__":
    app.run(main)
