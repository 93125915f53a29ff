"""Consumed-knob audit: no config key may be silently ignored.

Round-3 VERDICT found `conv_2d.use_bias_before_bn` was accepted by the
validating config system but never wired into `build_neck` — inert for
every shipped config, invisible to every test. This file kills that
failure class two ways:

1. READ-TRACING (round 5, replacing the round-4 name-grep): every leaf
   key in the union of the validated defaults (core/config._DEFAULTS)
   and all shipped configs must actually be READ while driving the
   framework end-to-end — Executor train steps, evaluation, export,
   plus an alternate-path drive (cosine schedule, fine-tuning,
   SoftNMS) — over a `trace_reads`-instrumented config. A key that is
   merely *mentioned* in source no longer passes; it must be consumed.
   Keys that are deliberately inert are declared below with a reason.
2. Structural knobs (the ones whose job is to change the parameter
   tree) must actually change it: build the model with the knob at its
   default and flipped, and assert the param-tree shapes differ.
"""

import glob
import json
import os

import flax.serialization
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from retinanet_tpu.core import config as cfg
from retinanet_tpu.core.config import _DEFAULTS
from retinanet_tpu.models.retinanet import build_model

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Keys that are deliberately not consumed by this framework, with the
# reason. Adding a key here is a public, reviewable statement — the
# opposite of silently dropping it.
INTENTIONALLY_INERT = {
    # Dead in the REFERENCE too: no reference code reads it — MobileDet
    # residual connections are hard-coded architecture literals there
    # (reference model/backbone/mobiledet.py:192-344). Kept loadable for
    # byte-compatibility with the shipped config corpus.
    "architecture.feature_fusion.use_residual_connections":
        "inert in the reference as well (no consumer; mobiledet residuals "
        "are hard-coded)",
}

# Keys consumed outside what the drives below exercise, with the exact
# consumption site (kept to an absolute minimum — everything else must
# show up in the traced reads).
CONSUMED_OUTSIDE_DRIVES = {
    # the CLI maps it to Executor(run_mode=...) before the Executor ever
    # sees params; the drives construct Executors directly
    "experiment.run_mode": "retinanet_tpu/__main__.py:61",
}


def _leaf_paths(tree, prefix=""):
    for k, v in tree.items():
        p = f"{prefix}.{k}" if prefix else str(k)
        if isinstance(v, dict):
            yield from _leaf_paths(v, p)
        else:
            yield p


def _schema_paths():
    paths = set(_leaf_paths(_DEFAULTS))
    corpus = glob.glob(os.path.join(REPO, "configs", "**", "*.json"),
                       recursive=True)
    assert len(corpus) >= 15, "shipped config corpus missing?"
    for config_path in corpus:
        with open(config_path) as f:
            paths.update(_leaf_paths(json.load(f)))
    return paths


def _drive_tree(tmp, pattern, ann):
    """A maximal 64x64 resnet10 config touching as many subsystems as a
    single coherent run can: EMA + weight decay + clipnorm + nesterov +
    grad accumulation + inflection recovery + freeze + augmentations +
    tensorboard_dir + backbone checkpoint hook."""
    return {
        "experiment": {"name": "audit_drive",
                       "model_dir": os.path.join(tmp, "models"),
                       "run_mode": "train",
                       "tensorboard_dir": os.path.join(tmp, "tb")},
        "input": {"input_shape": [64, 64], "channels": 3},
        "floatx": {"precision": "float32"},
        "architecture": {
            "backbone": {"type": "resnet", "depth": 10, "checkpoint": ""},
            "conv_2d": {"use_seperable_conv": False,
                        "use_bias_before_bn": False},
            "batch_norm": {"use_sync": True, "momentum": 0.99,
                           "epsilon": 1e-3},
            "activation": {"type": "relu"},
            "feature_fusion": {"type": "fpn", "filters": 16,
                               "fusion_mode": "sum",
                               "use_balanced_features": True,
                               "use_residual_connections": False,
                               "min_level": 3, "max_level": 5,
                               "backbone_max_level": 5},
            "auxillary_head": {"use_auxillary_head": False,
                               "num_convs": 1, "filters": 16},
            "head": {"num_convs": 1, "filters": 16, "num_classes": 6,
                     "num_anchors": 9},
        },
        "anchor_params": {"areas": [1024.0, 4096.0, 16384.0],
                          "aspect_ratios": [0.5, 1.0, 2.0],
                          "scales": [1.0, 2 ** (1 / 3), 2 ** (2 / 3)]},
        "encoder_params": {"match_iou": 0.5, "ignore_iou": 0.5,
                           "box_variance": [0.1, 0.1, 0.2, 0.2],
                           "scale_box_targets": False, "max_boxes": 20},
        "loss": {
            "focal_loss": {"alpha": 0.25, "gamma": 1.5,
                           "label_smoothing": 0.01},
            "smooth_l1_loss": {"delta": 0.1},
            "normalizer": {"use_moving_average": True, "momentum": 0.99},
            "class_loss_weight": 1.0, "box_loss_weight": 50.0,
            "auxillary_loss_weight": 0.0,
        },
        "training": {
            "train_steps": 2, "save_every": 2, "log_every": 1,
            "steps_per_execution": 1, "grad_accum_steps": 2,
            "device_prefetch": 1, "spatial_partition": 1,
            "use_weight_decay": True, "weight_decay_alpha": 1e-4,
            "strategy": {"type": "tpu", "name": "local"},
            "restore_checkpoint": True,
            "freeze_variables": [],
            "validation_freq": -1, "validation_samples": 8,
            "remap_class_ids": True,
            "annotation_file_path": ann,
            # train 16 so the grad-accum micro-batch (16/2=8) still splits
            # over the 8-device virtual mesh
            "batch_size": {"train": 16, "val": 8},
            "recovery": {"use_inflection_detector": True,
                         "metric_key": "total-loss",
                         "threshold": 1e9, "max_trials": 2},
            "optimizer": {
                "name": "sgd", "momentum": 0.9, "nesterov": True,
                "clipnorm": 10.0,
                "use_moving_average": True, "moving_average_decay": 0.99,
                "lr_params": {"schedule_type": "piecewise_constant_decay",
                              "warmup_learning_rate": 0.001,
                              "warmup_steps": 1,
                              "values": [0.01], "boundaries": []}},
        },
        "fine_tuning": {"fine_tune": False, "pretrained_checkpoint": ""},
        "dataloader_params": {
            "tfrecords": {"train": pattern, "val": pattern},
            "augmentations": {"use_augmentation": True,
                              "horizontal_flip": True,
                              "scale_jitter": {"min_scale": 0.5,
                                               "max_scale": 2.0}},
            "preprocessing": {"mean": [127.0, 127.0, 127.0],
                              "stddev": [128.0, 128.0, 128.0],
                              "pixel_scale": 1.0},
            "shuffle_buffer_size": 8},
        "inference": {"batch_size": 1, "mode": "PerClassHardNMS",
                      "iou_threshold": 0.5, "score_threshold": 0.05,
                      "soft_nms_sigma": 0.5, "pre_nms_top_k": 200,
                      "filter_per_class": True, "max_detections": 10},
    }


@pytest.fixture(scope="module")
def traced_reads(tmp_path_factory):
    """Drive the framework over read-traced configs; return the union of
    leaf paths actually consumed."""
    from retinanet_tpu.data.pipeline import InputPipeline
    from retinanet_tpu.data.synthetic import write_synthetic_tfrecords
    from retinanet_tpu.export.serving import export_artifact
    from retinanet_tpu.train.executor import Executor

    tmp = str(tmp_path_factory.mktemp("knob_audit"))
    pattern, ann = write_synthetic_tfrecords(
        os.path.join(tmp, "data"), "train", num_shards=2,
        samples_per_shard=8, num_classes=6, write_annotations=True)

    reads = set()

    # ---- drive A: train (2 steps, grad-accum, EMA, inflection) + eval +
    # export over one traced config
    params_a = cfg.from_dict(_drive_tree(tmp, pattern, ann))
    traced_a, reads_a = cfg.trace_reads(params_a)
    ex = Executor(traced_a, run_mode="train_val",
                  train_input_fn=lambda: InputPipeline(
                      "train", traced_a),
                  val_input_fn=lambda: InputPipeline("val", traced_a),
                  enable_tensorboard=True)
    assert ex.train()
    ex.evaluate()
    export_artifact(traced_a, ex.state.params, ex.state.batch_stats,
                    os.path.join(tmp, "artifact"), mode="tf",
                    serialize_stablehlo=True)
    reads |= reads_a

    # stash weights for drive B's fine-tune / backbone-checkpoint paths
    ckpt_path = os.path.join(tmp, "pretrained.msgpack")
    with open(ckpt_path, "wb") as f:
        f.write(flax.serialization.msgpack_serialize(
            {"params": jax.device_get(ex.state.params)}))

    # ---- drive B: the alternate paths one coherent run can't reach —
    # cosine schedule, fine-tuning restore, backbone checkpoint, aux
    # head, SoftNMS (reads soft_nms_sigma), separable convs
    tree_b = _drive_tree(tmp, pattern, ann)
    tree_b["experiment"]["name"] = "audit_drive_b"
    tree_b["architecture"]["backbone"]["checkpoint"] = ckpt_path
    tree_b["architecture"]["auxillary_head"] = {
        "use_auxillary_head": True, "num_convs": 1, "filters": 16}
    tree_b["loss"]["auxillary_loss_weight"] = 0.5
    tree_b["fine_tuning"] = {"fine_tune": True,
                             "pretrained_checkpoint": ckpt_path}
    tree_b["training"]["optimizer"]["lr_params"] = {
        "schedule_type": "cosine_decay", "initial_learning_rate": 0.01,
        "alpha": 0.1, "warmup_learning_rate": 0.001, "warmup_steps": 1}
    tree_b["inference"]["mode"] = "PerClassSoftNMS"
    params_b = cfg.from_dict(tree_b)
    traced_b, reads_b = cfg.trace_reads(params_b)
    ex_b = Executor(traced_b, run_mode="val",
                    val_input_fn=lambda: InputPipeline("val", traced_b),
                    enable_tensorboard=False)
    ex_b.evaluate()
    reads |= reads_b
    return reads


def test_every_config_key_is_read_by_the_framework(traced_reads):
    missing = sorted(
        p for p in _schema_paths()
        if p not in traced_reads
        and p not in INTENTIONALLY_INERT
        and p not in CONSUMED_OUTSIDE_DRIVES)
    assert not missing, (
        "config keys never READ while driving train/eval/export "
        "(wire them or declare them in INTENTIONALLY_INERT with a "
        f"reason): {missing}")


def test_inert_list_is_minimal(traced_reads):
    """A key listed as inert must actually be inert — if the framework
    starts consuming it, the declaration must be removed."""
    stale = sorted(set(INTENTIONALLY_INERT) & traced_reads)
    assert not stale, f"keys declared inert but actually read: {stale}"


# ------------------------------------------------------------ structural

def _base(neck="fpn"):
    return {
        "experiment": {"name": "audit"},
        "input": {"input_shape": [128, 128], "channels": 3},
        "architecture": {
            "backbone": {"type": "resnet", "depth": 18},
            "feature_fusion": {"type": neck, "fusion_mode": "sum",
                               "filters": 32, "min_level": 3,
                               "max_level": 7, "backbone_max_level": 5},
            "head": {"num_convs": 1, "filters": 32, "num_classes": 8,
                     "num_anchors": 9},
        },
    }


def _param_shapes(tree_overrides, neck="fpn"):
    params = cfg.from_dict(cfg.deep_merge(_base(neck), tree_overrides))
    model = build_model(params)
    x = jnp.zeros((1, 128, 128, 3), jnp.bfloat16)
    variables = jax.eval_shape(
        lambda k: model.init(k, x, train=False), jax.random.PRNGKey(0))
    flat, _ = jax.tree_util.tree_flatten_with_path(variables["params"])
    return {
        "/".join(str(getattr(k, "key", k)) for k in kp): v.shape
        for kp, v in flat
    }


STRUCTURAL_KNOBS = [
    # (id, neck type, override that must change the param tree)
    ("use_seperable_conv", "fpn",
     {"architecture": {"conv_2d": {"use_seperable_conv": True}}}),
    ("use_bias_before_bn/mlaf", "multi_level_attention",
     {"architecture": {"conv_2d": {"use_bias_before_bn": True}}}),
    ("use_bias_before_bn/stacked", "stacked_multi_level_attention",
     {"architecture": {"conv_2d": {"use_bias_before_bn": True}}}),
    ("use_bias_before_bn/fpn_p5", "fpn_p5",
     {"architecture": {"conv_2d": {"use_bias_before_bn": True}}}),
    ("use_auxillary_head", "fpn",
     {"architecture": {"auxillary_head": {"use_auxillary_head": True}}}),
    ("fusion_mode=fast_attention", "fpn",
     {"architecture": {"feature_fusion": {"fusion_mode": "fast_attention"}}}),
    ("use_channel_attention", "multi_level_attention",
     {"architecture": {"feature_fusion": {"use_channel_attention": True}}}),
    ("head.num_convs", "fpn",
     {"architecture": {"head": {"num_convs": 2}}}),
    ("backbone.depth", "fpn",
     {"architecture": {"backbone": {"depth": 34}}}),
]


@pytest.mark.parametrize(
    "knob_id,neck,override", STRUCTURAL_KNOBS,
    ids=[k for k, _, _ in STRUCTURAL_KNOBS])
def test_structural_knob_changes_param_tree(knob_id, neck, override):
    default = _param_shapes({}, neck=neck)
    flipped = _param_shapes(override, neck=neck)
    assert default != flipped, (
        f"structural knob {knob_id!r} flipped but the param tree is "
        "identical — the knob is not wired through build_model")


def test_use_balanced_features_changes_outputs():
    """BalanceFeatures is param-free (reference balance_features.py has no
    weights), so the param-tree probe can't see it — assert the forward
    outputs change instead."""
    def forward(override):
        params = cfg.from_dict(cfg.deep_merge(_base("fpn"), override))
        model = build_model(params)
        x = jnp.ones((1, 128, 128, 3), jnp.bfloat16)
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        return model.apply(variables, x, train=False)

    base = forward({})
    flipped = forward(
        {"architecture": {"feature_fusion": {"use_balanced_features": True}}})
    same = all(
        bool(jnp.array_equal(a, b)) for a, b in zip(
            jax.tree_util.tree_leaves(base), jax.tree_util.tree_leaves(flipped)))
    assert not same, (
        "use_balanced_features flipped but forward outputs are identical — "
        "BalanceFeatures is not wired through build_model"
    )
