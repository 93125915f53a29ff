"""Multi-device batched inference.

Equivalent of the reference's notebooks/multi_gpu_inference.ipynb
(MirroredStrategy + per-device value placement) done the JAX way: shard the
image batch over a 1-D device mesh; one jitted call fans out across all
chips. Works on any device count — emulate N devices on CPU with
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu

Usage:
  python examples/multi_device_inference.py --artifact_dir export/ \
      --image_dir images/ --batch_size 16
"""

from __future__ import annotations

import time

import jax
import numpy as np
from absl import app, flags, logging

FLAGS = flags.FLAGS
flags.DEFINE_string("artifact_dir", None, "Exported serving artifact")
flags.DEFINE_string("image_dir", None, "Directory of images")
flags.DEFINE_integer("batch_size", 16, "Global batch (split across devices)")


def main(argv):
    del argv
    from retinanet_tpu.export.serving import load_artifact
    from retinanet_tpu.parallel import mesh as mesh_lib
    from retinanet_tpu.utils.image_utils import ImageGenerator

    module = load_artifact(FLAGS.artifact_dir)
    params = module.params
    mesh = mesh_lib.create_mesh()
    logging.info("Running on %d devices", jax.device_count())

    infer = jax.jit(module._fn)
    state = module._state
    gen = ImageGenerator(FLAGS.image_dir, params.input.input_shape,
                         batch_size=FLAGS.batch_size)
    total, t0 = 0, time.perf_counter()
    for batch in gen:
        if batch.shape[0] < FLAGS.batch_size:  # pad final batch
            pad = np.zeros((FLAGS.batch_size - batch.shape[0],) +
                           batch.shape[1:], batch.dtype)
            batch = np.concatenate([batch, pad])
        sharded = mesh_lib.shard_batch({"image": batch}, mesh)["image"]
        det = jax.device_get(infer(state["params"], state["batch_stats"],
                                   sharded))
        total += batch.shape[0]
        logging.info("batch done; first-image detections: %d",
                     int(det["valid_detections"][0]))
    dt = time.perf_counter() - t0
    logging.info("%d images in %.2fs (%.1f imgs/s across %d devices)",
                 total, dt, total / dt, jax.device_count())


if __name__ == "__main__":
    flags.mark_flag_as_required("artifact_dir")
    flags.mark_flag_as_required("image_dir")
    app.run(main)
