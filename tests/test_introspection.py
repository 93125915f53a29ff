"""Executor introspection: FLOPs counting and HLO dump."""

import os

from retinanet_tpu.core import config as cfg
from retinanet_tpu.train.executor import Executor


def _params(tmp_path):
    return cfg.from_dict({
        "experiment": {"name": "intro", "model_dir": str(tmp_path / "m")},
        "input": {"input_shape": [64, 64], "channels": 3},
        "floatx": {"precision": "float32"},
        "architecture": {
            "backbone": {"type": "resnet", "depth": 10},
            "feature_fusion": {"type": "fpn", "filters": 16, "min_level": 3,
                               "max_level": 5, "backbone_max_level": 5},
            "head": {"num_convs": 1, "filters": 16, "num_classes": 4,
                     "num_anchors": 9},
        },
        "anchor_params": {"areas": [1024.0, 4096.0, 16384.0],
                          "aspect_ratios": [0.5, 1.0, 2.0],
                          "scales": [1.0, 2 ** (1 / 3), 2 ** (2 / 3)]},
        "training": {
            "train_steps": 2, "save_every": 2, "restore_checkpoint": False,
            "batch_size": {"train": 2, "val": 2},
            "optimizer": {
                "name": "sgd",
                "lr_params": {"schedule_type": "piecewise_constant_decay",
                              "warmup_learning_rate": 0.001,
                              "warmup_steps": 1, "values": [0.01],
                              "boundaries": []}},
        },
    })


def test_get_flops(tmp_path):
    ex = Executor(_params(tmp_path), run_mode="export",
                  enable_tensorboard=False)
    flops = ex.get_flops(batch_size=1)
    # resnet10@64x64 fwd: order 10^8-10^9 FLOPs
    assert flops > 1e7, flops


def test_dump_forward_hlo(tmp_path):
    ex = Executor(_params(tmp_path), run_mode="export",
                  enable_tensorboard=False)
    path = ex.dump_forward_hlo()
    assert os.path.exists(path)
    text = open(path).read()
    assert "convolution" in text or "conv" in text
