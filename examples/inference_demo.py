"""Single-image / folder inference demo.

Script equivalent of the reference's notebooks/inference_demo.ipynb:
loads an exported artifact (or builds from a config + checkpoint), runs
prepare_image -> serving on each input, draws detections.

Usage:
  python examples/inference_demo.py --artifact_dir export/ \
      --input image.jpg --output out.jpg
"""

from __future__ import annotations

import os

import numpy as np
from absl import app, flags, logging

FLAGS = flags.FLAGS
flags.DEFINE_string("artifact_dir", None, "Exported serving artifact")
flags.DEFINE_string("input", None, "Image file or directory")
flags.DEFINE_string("output", "detections", "Output file or directory")
flags.DEFINE_float("score_threshold", 0.3, "Visualization threshold")


def main(argv):
    del argv
    from retinanet_tpu.export.serving import load_artifact
    from retinanet_tpu.utils.image_utils import (draw_detections, read_image,
                                                 rescale_boxes)

    module = load_artifact(FLAGS.artifact_dir)
    params = module.params

    paths = ([os.path.join(FLAGS.input, f) for f in os.listdir(FLAGS.input)]
             if os.path.isdir(FLAGS.input) else [FLAGS.input])
    out_is_dir = len(paths) > 1
    if out_is_dir:
        os.makedirs(FLAGS.output, exist_ok=True)

    for path in paths:
        image = read_image(path)
        batched, resize_scale = module.prepare_image(image)
        det = module.run_inference(batched)
        n = int(det["valid_detections"][0])
        boxes = rescale_boxes(det["boxes"][0][:n], params.input.input_shape,
                              resize_scale, clip_hw=image.shape[:2])
        rendered = draw_detections(
            image, boxes, det["scores"][0][:n], det["classes"][0][:n],
            score_threshold=FLAGS.score_threshold)
        out_path = (os.path.join(FLAGS.output, os.path.basename(path))
                    if out_is_dir else FLAGS.output)
        import cv2
        cv2.imwrite(out_path, rendered[:, :, ::-1])
        logging.info("%s: %d detections -> %s", path, n, out_path)


if __name__ == "__main__":
    flags.mark_flag_as_required("artifact_dir")
    flags.mark_flag_as_required("input")
    app.run(main)
