"""Consumed-knob audit: no config key may be silently ignored.

Round-3 VERDICT found `conv_2d.use_bias_before_bn` was accepted by the
validating config system but never wired into `build_neck` — inert for
every shipped config, invisible to every test. This file kills that
failure class two ways:

1. Every leaf key in the union of the validated defaults
   (core/config._DEFAULTS) and all shipped configs must be *referenced*
   somewhere in retinanet_tpu/ source, or be explicitly listed here as
   intentionally inert with a reason.
2. Structural knobs (the ones whose job is to change the parameter
   tree) must actually change it: build the model with the knob at its
   default and flipped, and assert the param-tree shapes differ. This
   is the check that would have caught use_bias_before_bn — its name
   appeared in mlaf.py all along; what was missing was the wiring.
"""

import glob
import json
import os
import re

import jax
import jax.numpy as jnp
import pytest

from retinanet_tpu.core import config as cfg
from retinanet_tpu.core.config import _DEFAULTS
from retinanet_tpu.models.retinanet import build_model

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Keys that are deliberately not consumed by this framework, with the
# reason. Adding a key here is a public, reviewable statement — the
# opposite of silently dropping it.
INTENTIONALLY_INERT = {
    # (none currently — every schema key is consumed)
}


def _leaf_paths(tree, prefix=""):
    for k, v in tree.items():
        p = f"{prefix}.{k}" if prefix else str(k)
        if isinstance(v, dict):
            yield from _leaf_paths(v, p)
        else:
            yield p


def _source_words():
    words = set()
    for path in glob.glob(os.path.join(REPO, "retinanet_tpu", "**", "*.py"),
                          recursive=True):
        with open(path) as f:
            words.update(re.findall(r"\w+", f.read()))
    return words


def test_every_config_key_is_referenced_in_source():
    paths = set(_leaf_paths(_DEFAULTS))
    for config_path in glob.glob(os.path.join(REPO, "configs", "*.json")):
        with open(config_path) as f:
            paths.update(_leaf_paths(json.load(f)))
    assert paths, "no config keys collected — corpus missing?"
    words = _source_words()
    unreferenced = sorted(
        p for p in paths
        if p.split(".")[-1] not in words and p not in INTENTIONALLY_INERT)
    assert not unreferenced, (
        "config keys never referenced in retinanet_tpu/ source (wire them "
        f"or add to INTENTIONALLY_INERT with a reason): {unreferenced}")


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
        "BalanceFeatures is not wired through build_model")
