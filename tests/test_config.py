"""Config loading/validation tests (reference cfg/config.py parity +
the validation the reference lacks)."""

import json

import pytest

from retinanet_tpu.core import config as cfg


def _base():
    return {
        "experiment": {"name": "exp1"},
        "input": {"input_shape": [640, 640], "channels": 3},
        "architecture": {
            "backbone": {"type": "resnet", "depth": 50},
            "feature_fusion": {"type": "fpn", "filters": 256, "min_level": 3,
                               "max_level": 7, "backbone_max_level": 5},
            "head": {"num_convs": 4, "filters": 256, "num_classes": 80,
                     "num_anchors": 9},
        },
    }


def test_load_json_file(tmp_path):
    path = tmp_path / "c.json"
    path.write_text(json.dumps(_base()))
    params = cfg.Config(str(path)).params
    assert params.experiment.name == "exp1"
    assert params.architecture.backbone.depth == 50


def test_defaults_filled():
    params = cfg.from_dict(_base())
    assert params.floatx.precision == "mixed_bfloat16"
    assert params.loss.box_loss_weight == 50.0
    assert params.inference.mode == "PerClassHardNMS"
    assert params.anchor_params.aspect_ratios == [0.5, 1.0, 2.0]


def test_user_overrides_defaults():
    base = _base()
    base["loss"] = {"box_loss_weight": 25.0}
    params = cfg.from_dict(base)
    assert params.loss.box_loss_weight == 25.0
    assert params.loss.class_loss_weight == 1.0  # untouched default


def test_missing_required_raises():
    base = _base()
    del base["architecture"]["head"]
    with pytest.raises(cfg.ConfigError, match="head.num_classes"):
        cfg.from_dict(base)


def test_bad_anchor_count_raises():
    base = _base()
    base["architecture"]["head"]["num_anchors"] = 6
    with pytest.raises(cfg.ConfigError, match="num_anchors"):
        cfg.from_dict(base)


def test_bad_input_shape_raises():
    base = _base()
    base["input"]["input_shape"] = [636, 636]
    with pytest.raises(cfg.ConfigError, match="divisible"):
        cfg.from_dict(base)


def test_attribute_error_message():
    params = cfg.from_dict(_base())
    with pytest.raises(AttributeError, match="no key 'nope'"):
        _ = params.experiment.nope


def test_reference_config_schema_loads():
    """The shipped reference-schema configs must load unchanged."""
    with open("/root/reference/configs/v3-32/"
              "mscoco-retinanet-resnet50-640x640-30x-256.json") as f:
        tree = json.load(f)
    params = cfg.from_dict(tree)
    assert params.training.batch_size.train == 256
    assert params.training.optimizer.lr_params.boundaries == [154286, 163928]
