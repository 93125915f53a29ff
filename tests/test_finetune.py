"""Fine-tuning / pretrained-weight loading tests."""

import os

import jax
import numpy as np
import pytest

from retinanet_tpu.core import config as cfg
from retinanet_tpu.export import serving as serving_lib
from retinanet_tpu.train.executor import Executor


def _params(tmp_path, num_classes=6, **overrides):
    tree = {
        "experiment": {"name": "ft_test",
                       "model_dir": str(tmp_path / "models")},
        "input": {"input_shape": [64, 64], "channels": 3},
        "floatx": {"precision": "float32"},
        "architecture": {
            "backbone": {"type": "resnet", "depth": 10},
            "feature_fusion": {"type": "fpn", "filters": 16, "min_level": 3,
                               "max_level": 5, "backbone_max_level": 5},
            "head": {"num_convs": 1, "filters": 16,
                     "num_classes": num_classes, "num_anchors": 9},
        },
        "anchor_params": {"areas": [1024.0, 4096.0, 16384.0],
                          "aspect_ratios": [0.5, 1.0, 2.0],
                          "scales": [1.0, 2 ** (1 / 3), 2 ** (2 / 3)]},
        "training": {
            "train_steps": 4, "save_every": 2, "restore_checkpoint": False,
            "batch_size": {"train": 4, "val": 4},
            "optimizer": {
                "name": "sgd",
                "lr_params": {"schedule_type": "piecewise_constant_decay",
                              "warmup_learning_rate": 0.001,
                              "warmup_steps": 1, "values": [0.01],
                              "boundaries": []}},
        },
    }
    tree = cfg.deep_merge(tree, overrides)
    return cfg.from_dict(tree)


def _export_artifact(tmp_path, params, seed=7):
    """Save an artifact with recognizable weights."""
    from retinanet_tpu.models.retinanet import build_model
    import jax.numpy as jnp
    model = build_model(params)
    variables = model.init(jax.random.PRNGKey(seed),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    out_dir = str(tmp_path / "pretrained")
    serving_lib.export_artifact(
        params, variables["params"], variables["batch_stats"], out_dir,
        serialize_stablehlo=False)
    return out_dir, variables


def test_backbone_checkpoint_init(tmp_path):
    src_params = _params(tmp_path)
    artifact, variables = _export_artifact(tmp_path, src_params)

    params = _params(tmp_path, architecture={
        "backbone": {"type": "resnet", "depth": 10,
                     "checkpoint": artifact}})
    ex = Executor(params, run_mode="export", enable_tensorboard=False)
    got = jax.device_get(
        ex.state.params["backbone"]["stem"]["conv"]["kernel"])
    want = np.asarray(variables["params"]["backbone"]["stem"]["conv"]["kernel"])
    np.testing.assert_allclose(got, want)
    # heads stay randomly initialized (different from source)
    got_head = jax.device_get(
        ex.state.params["class_head"]["prediction"]["conv"]["kernel"])
    src_head = np.asarray(
        variables["params"]["class_head"]["prediction"]["conv"]["kernel"])
    assert not np.allclose(got_head, src_head)


def test_fine_tune_skip_mismatch(tmp_path):
    """Pretrained model has a different class count: matching tensors load,
    the class-prediction conv is skipped (reference skip_mismatch)."""
    src_params = _params(tmp_path, num_classes=11)
    artifact, variables = _export_artifact(tmp_path, src_params)

    params = _params(tmp_path, num_classes=6, fine_tuning={
        "fine_tune": True, "pretrained_checkpoint": artifact})
    ex = Executor(params, run_mode="export", enable_tensorboard=False)
    got = jax.device_get(
        ex.state.params["backbone"]["stem"]["conv"]["kernel"])
    np.testing.assert_allclose(
        got, np.asarray(variables["params"]["backbone"]["stem"]["conv"]["kernel"]))
    # box head matches shape -> loaded
    got_box = jax.device_get(
        ex.state.params["box_head"]["prediction"]["conv"]["kernel"])
    np.testing.assert_allclose(
        got_box,
        np.asarray(variables["params"]["box_head"]["prediction"]["conv"]["kernel"]))
    # class head mismatched (11 vs 6 classes) -> stays random, right shape
    got_cls = jax.device_get(
        ex.state.params["class_head"]["prediction"]["conv"]["kernel"])
    assert got_cls.shape[-1] == 9 * 6


def test_missing_pretrained_raises(tmp_path):
    params = _params(tmp_path, fine_tuning={
        "fine_tune": True,
        "pretrained_checkpoint": str(tmp_path / "nope")})
    with pytest.raises(FileNotFoundError):
        Executor(params, run_mode="export", enable_tensorboard=False)
