"""int8 activation quantization: calibration + int8 conv serving path.

Parity target: the reference's TensorRT INT8 stack
(reference retinanet/tensorrt/calibrator.py:10-83 entropy/minmax
calibrators + builder.py int8 engines). Here: interceptor-based per-tensor
activation calibration, real s8 x s8 -> s32 convolutions, and a
detection-agreement-AP quality report.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from retinanet_tpu.core import config as cfg
from retinanet_tpu.data import anchors as anchor_lib
from retinanet_tpu.export.calibration import calibrate_activations
from retinanet_tpu.export.quantize import (Int8Model,
                                           detection_agreement_ap,
                                           int8_activation_report)
from retinanet_tpu.models.retinanet import build_model


def _tiny_cfg():
    return cfg.from_dict({
        "experiment": {"name": "int8_test"},
        "input": {"input_shape": [64, 64], "channels": 3},
        "floatx": {"precision": "float32"},
        "architecture": {
            "backbone": {"type": "resnet", "depth": 10},
            "feature_fusion": {"type": "fpn", "filters": 16,
                               "min_level": 3, "max_level": 5,
                               "backbone_max_level": 5},
            "head": {"num_convs": 1, "filters": 16, "num_classes": 6,
                     "num_anchors": 9},
        },
        "anchor_params": {"areas": [1024.0, 4096.0, 16384.0],
                          "aspect_ratios": [0.5, 1.0, 2.0],
                          "scales": [1.0, 2 ** (1 / 3), 2 ** (2 / 3)]},
        # lowered threshold so random weights produce detections
        "inference": {"pre_nms_top_k": 200, "max_detections": 25,
                      "score_threshold": 0.003, "mode": "PerClassHardNMS"},
    })


@pytest.fixture(scope="module")
def setup():
    params = _tiny_cfg()
    model = build_model(params)
    variables = jax.jit(lambda k: model.init(
        k, jnp.zeros((1, 64, 64, 3)), train=False))(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    batches = [rng.normal(0.0, 1.0, (2, 64, 64, 3)).astype(np.float32)
               for _ in range(3)]
    return params, model, variables, batches


def test_calibration_covers_every_conv(setup):
    params, model, variables, batches = setup
    scales = calibrate_activations(model, variables, batches, mode="minmax")
    # resnet10: stem + 4 groups x (proj + 2 convs) + fpn convs + head convs
    assert len(scales) >= 20
    assert all(s > 0 for s in scales.values())
    assert any("backbone" in k for k in scales)
    assert any("neck" in k for k in scales)
    assert any("head" in k for k in scales)


def test_entropy_clips_at_most_minmax(setup):
    params, model, variables, batches = setup
    minmax = calibrate_activations(model, variables, batches, mode="minmax")
    entropy = calibrate_activations(model, variables, batches,
                                    mode="entropy")
    assert set(entropy) == set(minmax)
    for k in minmax:
        assert entropy[k] <= minmax[k] * (1.0 + 1e-6), k


def test_int8_outputs_close_to_fp(setup):
    params, model, variables, batches = setup
    scales = calibrate_activations(model, variables, batches, mode="minmax")
    images = jnp.asarray(batches[0])

    fp = model.apply(variables, images, train=False)
    q_real = Int8Model(model, scales, real_int8=True).apply(
        variables, images, train=False)
    q_fake = Int8Model(model, scales, real_int8=False).apply(
        variables, images, train=False)

    for lvl in fp["class-predictions"]:
        f = np.asarray(fp["class-predictions"][lvl])
        r = np.asarray(q_real["class-predictions"][lvl])
        k = np.asarray(q_fake["class-predictions"][lvl])
        # quantization noise is bounded; logits live around the -4.6 prior
        assert np.abs(f - r).mean() < 0.15, np.abs(f - r).mean()
        # real int8 conv and fake-quant agree up to weight-quant rounding
        assert np.abs(r - k).mean() < 0.15, np.abs(r - k).mean()


def test_prediction_convs_stay_fp(setup):
    params, model, variables, batches = setup
    scales = calibrate_activations(model, variables, batches, mode="minmax")
    assert any("prediction" in k for k in scales)  # calibrated...
    # ...but excluded from quantization by default: outputs with ONLY
    # prediction-conv scales present must match fp exactly
    pred_only = {k: v for k, v in scales.items() if "prediction" in k}
    fp = model.apply(variables, jnp.asarray(batches[0]), train=False)
    q = Int8Model(model, pred_only).apply(
        variables, jnp.asarray(batches[0]), train=False)
    for lvl in fp["class-predictions"]:
        np.testing.assert_array_equal(fp["class-predictions"][lvl],
                                      q["class-predictions"][lvl])


def test_int8_report_end_to_end(setup):
    params, model, variables, batches = setup
    anchors = anchor_lib.from_params(params)
    scales = calibrate_activations(model, variables, batches,
                                   mode="entropy")
    report = int8_activation_report(
        model, params, anchors, lambda im: im, variables, scales, batches)
    assert report["num_calibrated_convs"] >= 20
    assert 0.0 <= report["detection_agreement_ap"] <= 1.0
    # random weights + lowered threshold: behavior must be largely preserved
    assert report["detection_agreement_ap"] > 0.3, report
    assert report["mean_abs_score_diff"] < 0.05, report


def test_agreement_ap_identity_is_one(setup):
    """Sanity: a model compared against itself scores AP 1.0."""
    params, model, variables, batches = setup
    from retinanet_tpu.ops.postprocess import make_inference_fn
    anchors = anchor_lib.from_params(params)
    infer = jax.jit(make_inference_fn(
        model, params, anchors, lambda im: im,
        compute_dtype=jnp.float32))
    dets = jax.device_get(infer(variables["params"],
                                variables["batch_stats"],
                                jnp.asarray(batches[0])))
    dets = {k: np.asarray(v) for k, v in dets.items()}
    ap = detection_agreement_ap(
        dets, dets, (64, 64),
        min_score=float(params.inference.score_threshold))
    assert ap == pytest.approx(1.0, abs=1e-6)
