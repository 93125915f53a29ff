"""End-to-end learning sanity check: overfit a tiny synthetic dataset and
verify COCO mAP climbs well above zero.

This exercises the full loop — tfrecord reading, host preprocessing,
on-device label encoding, training, checkpointing, inference with NMS, box
rescaling and the native COCO evaluation — the strongest single signal
that the numerics line up end to end (the reference validated with full
COCO runs; this is the 2-minute analog).

Usage: python tools/overfit_check.py [--steps 300] [--use_tpu]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from absl import app, flags, logging

FLAGS = flags.FLAGS
flags.DEFINE_integer("steps", 300, "Train steps")
flags.DEFINE_integer("num_images", 16, "Synthetic dataset size")
flags.DEFINE_float("target_ap", 0.3, "Required AP@0.5 after overfitting")
flags.DEFINE_string("workdir", None, "Working directory (default: temp)")
flags.DEFINE_integer("input_size", 128, "Square input resolution")
flags.DEFINE_integer("resnet_depth", 18, "ResNet depth")
flags.DEFINE_integer("fpn_filters", 64, "FPN filters")
flags.DEFINE_integer("head_convs", 2, "Head conv count")


def make_params(workdir, pattern, ann, steps, input_size=128, depth=18,
                filters=64, head_convs=2):
    """The overfit experiment config — shared with tools/int8_quality_check.py
    so the int8 evaluation runs on the exact trained model. Geometry kwargs
    scale it up to flagship shape (640 / resnet50 / 256 filters / 4 convs)
    for production-resolution quality evidence; precision switches to
    mixed_bfloat16 at >=640 to match the flagship configs."""
    from retinanet_tpu.core import config as cfg
    return cfg.from_dict({
        "experiment": {"name": "overfit",
                       "model_dir": os.path.join(workdir, "models")},
        "input": {"input_shape": [input_size, input_size], "channels": 3},
        "floatx": {"precision":
                   "mixed_bfloat16" if input_size >= 640 else "float32"},
        "architecture": {
            "backbone": {"type": "resnet", "depth": depth},
            "feature_fusion": {"type": "fpn", "filters": filters,
                               "min_level": 3,
                               "max_level": 6, "backbone_max_level": 5},
            "head": {"num_convs": head_convs, "filters": filters,
                     "num_classes": 6,
                     "num_anchors": 9},
        },
        "anchor_params": {
            "areas": [1024.0, 4096.0, 16384.0, 65536.0],
            "aspect_ratios": [0.5, 1.0, 2.0],
            "scales": [1.0, 2 ** (1 / 3), 2 ** (2 / 3)]},
        "loss": {"box_loss_weight": 50.0},
        "training": {
            "train_steps": steps, "save_every": max(steps, 100),
            "steps_per_execution": 50,
            "batch_size": {"train": 8, "val": 8},
            "annotation_file_path": ann,
            "remap_class_ids": False,
            "use_weight_decay": True, "weight_decay_alpha": 1e-4,
            "optimizer": {
                "name": "sgd", "momentum": 0.9, "clipnorm": 10.0,
                "lr_params": {"schedule_type": "cosine_decay",
                              "initial_learning_rate": 0.08,
                              "warmup_learning_rate": 0.004,
                              "warmup_steps": 30}},
        },
        "dataloader_params": {
            "tfrecords": {"train": pattern, "val": pattern},
            "augmentations": {"use_augmentation": False,
                              "horizontal_flip": False},
            "shuffle_buffer_size": 16},
        "inference": {"mode": "PerClassHardNMS", "score_threshold": 0.3,
                      "pre_nms_top_k": 1000, "max_detections": 25},
    })


def main(argv):
    del argv
    import retinanet_tpu.core.cache  # noqa: F401
    from retinanet_tpu.data.pipeline import InputPipeline
    from retinanet_tpu.data.synthetic import write_synthetic_tfrecords
    from retinanet_tpu.train.executor import Executor

    workdir = FLAGS.workdir or tempfile.mkdtemp(prefix="overfit_")
    pattern, ann = write_synthetic_tfrecords(
        os.path.join(workdir, "data"), "train", num_shards=1,
        samples_per_shard=FLAGS.num_images, num_classes=6,
        write_annotations=True, seed=11)

    params = make_params(workdir, pattern, ann, FLAGS.steps,
                         input_size=FLAGS.input_size,
                         depth=FLAGS.resnet_depth,
                         filters=FLAGS.fpn_filters,
                         head_convs=FLAGS.head_convs)

    ex = Executor(
        params, run_mode="train_val",
        train_input_fn=lambda: InputPipeline("train", params, max_boxes=20),
        val_input_fn=lambda: InputPipeline("val", params),
        enable_tensorboard=False)
    ex.train()
    scores = ex.evaluate()
    ap50 = scores["AP-IoU=0.50"]
    logging.info("Overfit AP@0.5 after %d steps: %.3f", FLAGS.steps, ap50)
    if ap50 < FLAGS.target_ap:
        raise SystemExit(
            f"FAIL: AP@0.5 {ap50:.3f} < target {FLAGS.target_ap}")
    print(f"OVERFIT CHECK PASS: AP@0.5 = {ap50:.3f}")


if __name__ == "__main__":
    app.run(main)
