"""Serving-lane integration: approx bf16+packed top-k vs exact f32.

Guards the wiring in make_inference_fn (bf16 fusion cast, packed
selection, f32 sigmoid on winners). A real random-weight model is the
WRONG fixture here: its scores are one giant tie-group, where the 95%
recall target legitimately picks different candidates. Instead a stub
model plants well-separated, bf16-exact logits at scattered anchors —
in that regime the approx lane must equal the exact lane exactly.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from retinanet_tpu.core import config as cfg
from retinanet_tpu.data import anchors as anchor_lib
from retinanet_tpu.data.preprocessing import make_device_normalizer
from retinanet_tpu.ops.postprocess import make_inference_fn


def _params():
    return cfg.from_dict({
        "experiment": {"name": "lane_test"},
        "input": {"input_shape": [64, 64], "channels": 3},
        "floatx": {"precision": "float32"},
        "architecture": {
            "backbone": {"type": "resnet", "depth": 10},
            "feature_fusion": {"type": "fpn", "filters": 16, "min_level": 3,
                               "max_level": 5, "backbone_max_level": 5},
            "head": {"num_convs": 1, "filters": 16, "num_classes": 5,
                     "num_anchors": 9},
        },
        "anchor_params": {"areas": [1024.0, 4096.0, 16384.0],
                          "aspect_ratios": [0.5, 1.0, 2.0],
                          "scales": [1.0, 2 ** (1 / 3), 2 ** (2 / 3)]},
        "inference": {"batch_size": 2, "pre_nms_top_k": 32,
                      "max_detections": 10},
    })


class _PlantedModel:
    """Stub with the model.apply contract: returns fixed per-level maps.

    Plants ~30 distinct positive logits (multiples of 0.25, hence exact
    in bf16) at scattered (position, anchor, class) sites; everything
    else is -10. Box predictions are zero -> decoded boxes are the
    anchor boxes themselves, distinct per anchor.
    """

    def __init__(self, num_classes=5, anchors_per_loc=9):
        rng = np.random.default_rng(42)
        self.preds = {"class-predictions": {}, "box-predictions": {}}
        sizes = {"3": 8, "4": 4, "5": 2}
        for level, s in sizes.items():
            cls = np.full((2, s, s, anchors_per_loc * num_classes), -10.0,
                          np.float32)
            n_sites = 10 * s // 8
            for b in range(2):
                flat = rng.choice(s * s * anchors_per_loc * num_classes,
                                  size=n_sites, replace=False)
                vals = 2.0 + 0.25 * rng.permutation(n_sites)
                cls[b].reshape(-1)[flat] = vals
            self.preds["class-predictions"][level] = jnp.asarray(cls)
            self.preds["box-predictions"][level] = jnp.zeros(
                (2, s, s, anchors_per_loc * 4), jnp.float32)

    def apply(self, variables, images, train=False):
        del variables, images, train
        return self.preds


def _run(approx):
    params = _params()
    params.inference["use_approx_top_k"] = approx
    model = _PlantedModel()
    anchors = anchor_lib.from_params(params)
    normalizer = make_device_normalizer(params)
    infer = jax.jit(make_inference_fn(model, params, anchors, normalizer,
                                      compute_dtype=jnp.float32))
    images = jnp.zeros((2, 64, 64, 3), jnp.float32)
    return jax.tree_util.tree_map(
        np.asarray, infer({}, {}, images))


def test_approx_lane_matches_exact_detections():
    approx, exact = _run(True), _run(False)
    assert int(exact["valid_detections"].sum()) > 0, "test needs detections"
    np.testing.assert_array_equal(approx["valid_detections"],
                                  exact["valid_detections"])
    for b in range(2):
        v = int(exact["valid_detections"][b])
        np.testing.assert_array_equal(approx["classes"][b][:v],
                                      exact["classes"][b][:v])
        np.testing.assert_allclose(approx["boxes"][b][:v],
                                   exact["boxes"][b][:v], atol=1e-6)
        # planted logits are bf16-exact -> scores match to f32 sigmoid
        np.testing.assert_allclose(approx["scores"][b][:v],
                                   exact["scores"][b][:v], atol=1e-6)


def test_approx_lane_output_contract():
    out = _run(True)
    assert out["boxes"].shape == (2, 10, 4)
    assert out["scores"].shape == (2, 10)
    assert out["classes"].dtype == np.int32
    for b in range(2):
        v = int(out["valid_detections"][b])
        assert np.all(out["classes"][b][v:] == -1)
        assert np.all((out["boxes"][b][:v] >= 0) & (out["boxes"][b][:v] <= 1))
        assert np.all(np.diff(out["scores"][b][:v]) <= 1e-6)


def test_skip_nms_export_lane_keeps_f32_scores():
    """Export lanes (skip_nms / skip_decoding) must not inherit the
    approx lane's bf16 logits cast: with approx on or off their outputs
    are identical."""
    outs = {}
    for approx in (True, False):
        params = _params()
        params.inference["use_approx_top_k"] = approx
        model = _PlantedModel()
        anchors = anchor_lib.from_params(params)
        normalizer = make_device_normalizer(params)
        infer = jax.jit(make_inference_fn(
            model, params, anchors, normalizer,
            compute_dtype=jnp.float32, skip_nms=True))
        outs[approx] = jax.tree_util.tree_map(
            np.asarray, infer({}, {}, jnp.zeros((2, 64, 64, 3))))
    for key in outs[True]:
        np.testing.assert_array_equal(outs[True][key], outs[False][key])


def test_recall_target_reaches_selection(monkeypatch):
    """inference.approx_recall_target must be threaded into the packed
    selection (it was read but dropped before the fix)."""
    from retinanet_tpu.ops import postprocess as pp

    seen = {}
    real = pp.approx_max_k_packed

    def spy(scores, k, recall_target=0.95):
        seen["recall"] = recall_target
        return real(scores, k, recall_target=recall_target)

    monkeypatch.setattr(pp, "approx_max_k_packed", spy)
    params = _params()
    params.inference["use_approx_top_k"] = True
    params.inference["approx_recall_target"] = 0.99
    model = _PlantedModel()
    anchors = anchor_lib.from_params(params)
    normalizer = make_device_normalizer(params)
    infer = make_inference_fn(model, params, anchors, normalizer,
                              compute_dtype=jnp.float32)
    infer({}, {}, jnp.zeros((2, 64, 64, 3)))
    assert seen.get("recall") == 0.99


def _run_decode_lane(decode_after, approx, per_class):
    params = _params()
    params.inference["use_approx_top_k"] = approx
    params.inference["decode_after_topk"] = decode_after
    params.inference["filter_per_class"] = per_class
    model = _PlantedModel()
    # nonzero box regressions so the decode actually transforms the
    # anchors — a mis-gathered anchor row would shift the decoded box
    rng = np.random.default_rng(7)
    model.preds["box-predictions"] = {
        k: jnp.asarray(rng.normal(0.0, 0.1, v.shape).astype(np.float32))
        for k, v in model.preds["box-predictions"].items()}
    anchors = anchor_lib.from_params(params)
    normalizer = make_device_normalizer(params)
    infer = jax.jit(make_inference_fn(model, params, anchors, normalizer,
                                      compute_dtype=jnp.float32))
    return jax.tree_util.tree_map(
        np.asarray, infer({}, {}, jnp.zeros((2, 64, 64, 3), jnp.float32)))


@pytest.mark.parametrize("approx", [True, False])
@pytest.mark.parametrize("per_class", [True, False])
def test_decode_after_topk_bitwise_identical(approx, per_class):
    """inference.decode_after_topk only reorders WHERE the decode runs
    (selected candidates vs all anchors); the per-element program is
    shared, so the final detections must be bit-for-bit identical."""
    after = _run_decode_lane(True, approx, per_class)
    before = _run_decode_lane(False, approx, per_class)
    assert int(before["valid_detections"].sum()) > 0
    for key in before:
        np.testing.assert_array_equal(after[key], before[key], err_msg=key)
