"""Production-resolution transplant parity (640x640) + serving-lane
agreement, against the EXECUTED reference.

Round-2 parity ran at 256x256; the reference's published claims
(reference README.md:29-32) are at 640x640. This module transplants the
flagship ResNet50-640 reference model ONCE at full resolution and checks:

  * per-level box/class outputs at 640 (raw head outputs),
  * final-detection set equality vs the reference's export postprocess
    graph (reference model/builder.py:153-190),
  * the approx-top-k serving lane's detection agreement vs the same
    reference detections,
  * the int8-activation serving lane's detection agreement,
  * detection-set parity for a second family (MobileDet edge_tpu @448,
    the tucker/fused stack).

Everything shares one module-scoped fixture — the Keras build + forward
at 640 dominates the cost and runs once.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")
pytest.importorskip("tf_keras")


def _match_sets(ref, ours, score_tol=1e-4, box_tol=2e-3):
    """Order-insensitive one-to-one matching of detection sets."""
    np.testing.assert_array_equal(ref["valid_detections"],
                                  ours["valid_detections"])
    for b in range(ref["scores"].shape[0]):
        n = int(ref["valid_detections"][b])
        assert n > 10, "comparison must be non-vacuous"

        def records(det):
            return [(int(det["classes"][b][i]), float(det["scores"][b][i]),
                     np.asarray(det["boxes"][b][i])) for i in range(n)]

        unmatched = records(ours)
        for r in records(ref):
            hit = next(
                (i for i, f in enumerate(unmatched)
                 if f[0] == r[0] and abs(f[1] - r[1]) < score_tol
                 and np.max(np.abs(f[2] - r[2])) < box_tol), None)
            assert hit is not None, f"no match for reference det {r}"
            unmatched.pop(hit)
        assert not unmatched


@pytest.fixture(scope="module")
def flagship640():
    from tools.transplant import run_detection_parity
    # healthify makes the weights DETERMINISTIC across processes (Keras's
    # unseeded initializers differ per process otherwise, which made the
    # lane-agreement APs below flap run-to-run); the damped spread keeps
    # healthified logits out of sigmoid saturation (ties break NMS order).
    # healthified ResNet50 logits land at std ~1.7 (scores spread smoothly
    # over (0, 1) with no tie mass), so no extra kernel spread is needed.
    ref_det, flax_det, ctx = run_detection_parity(
        input_size=640, seed=7, healthify=True, spread=(1.0, 1.0),
        return_context=True)
    return ref_det, flax_det, ctx


def test_per_level_outputs_640(flagship640):
    """Raw head outputs at production resolution (fp32, <=1e-4)."""
    import jax
    _, _, ctx = flagship640
    model, variables = ctx["model"], ctx["variables"]
    out = jax.jit(lambda v, x: model.apply(v, x, train=False))(
        variables, ctx["images"])
    for kind in ("box-predictions", "class-predictions"):
        for lvl, ref in ctx["ref_raw"][kind].items():
            j = np.asarray(out[kind][lvl])
            assert ref.shape == j.shape
            d = float(np.max(np.abs(ref - j)))
            assert d < 1e-4, (kind, lvl, d)


def test_final_detections_640(flagship640):
    ref_det, flax_det, _ = flagship640
    _match_sets(ref_det, flax_det)


def test_approx_topk_lane_agreement_640(flagship640):
    """The shipped serving lane (approx top-k + packed single-key sort,
    ops/postprocess.py) vs the reference's exact export graph at 640.
    Scored as detection-agreement AP (reference dets = pseudo-GT)."""
    import jax
    import jax.numpy as jnp
    from retinanet_tpu.core.config import from_dict
    from retinanet_tpu.export.quantize import detection_agreement_ap
    from retinanet_tpu.ops.postprocess import make_inference_fn

    ref_det, _, ctx = flagship640
    import copy
    import json
    cfg = json.loads(json.dumps(ctx["ref_cfg"]))
    cfg["input"]["input_shape"] = [640, 640]
    cfg["architecture"]["backbone"]["checkpoint"] = ""
    cfg["inference"]["use_approx_top_k"] = True
    params_cfg = from_dict(cfg)
    infer = jax.jit(make_inference_fn(
        ctx["model"], params_cfg, ctx["anchors"],
        normalizer=lambda im: im, compute_dtype=jnp.float32))
    dets = jax.device_get(infer(ctx["variables"]["params"],
                                ctx["variables"]["batch_stats"],
                                ctx["images"]))
    dets = {k: np.asarray(v) for k, v in dets.items()}
    ap = detection_agreement_ap(ref_det, dets, image_shape=(640, 640),
                                min_score=float(
                                    cfg["inference"]["score_threshold"]))
    assert ap > 0.95, f"approx-topk lane agreement AP {ap}"


def test_int8_lane_agreement_640(flagship640):
    """int8-activation serving lane runs end-to-end at 640 and preserves a
    nonvacuous fraction of the reference detections.

    The bar here is deliberately LOW (0.2): on a healthified-random model
    the top-100 scores are near-tied order statistics of a smooth random
    field (all ~0.999, spacing ~1e-5), so int8's quantization noise
    reshuffles which near-ties survive NMS — the metric measures tie
    shuffling, not quantization quality. The quantitative int8 evidence
    lives on TRAINED weights: tools/int8_quality_check.py (true mAP delta
    0.7137 -> 0.7092) and the 640 trained-model agreement recorded in
    PARITY.md."""
    import jax
    import jax.numpy as jnp
    from retinanet_tpu.core.config import from_dict
    from retinanet_tpu.export.calibration import calibrate_activations
    from retinanet_tpu.export.quantize import (Int8Model,
                                               detection_agreement_ap)
    from retinanet_tpu.ops.postprocess import make_inference_fn

    ref_det, _, ctx = flagship640
    import json
    cfg = json.loads(json.dumps(ctx["ref_cfg"]))
    cfg["input"]["input_shape"] = [640, 640]
    cfg["architecture"]["backbone"]["checkpoint"] = ""
    params_cfg = from_dict(cfg)
    scales = calibrate_activations(
        ctx["model"], ctx["variables"], [ctx["images"]], mode="minmax")
    q_model = Int8Model(ctx["model"], scales)
    infer = jax.jit(make_inference_fn(
        q_model, params_cfg, ctx["anchors"],
        normalizer=lambda im: im, compute_dtype=jnp.float32))
    dets = jax.device_get(infer(ctx["variables"]["params"],
                                ctx["variables"]["batch_stats"],
                                ctx["images"]))
    dets = {k: np.asarray(v) for k, v in dets.items()}
    ap = detection_agreement_ap(ref_det, dets, image_shape=(640, 640),
                                min_score=float(
                                    cfg["inference"]["score_threshold"]))
    assert ap > 0.2, f"int8 lane agreement AP {ap}"


def test_mobiledet_edge_tpu_detections_448():
    """Detection-set parity for a non-ResNet family at its production
    resolution (448): MobileDet edge_tpu (tucker + fused-IBN stack)."""
    from tools.transplant import REFERENCE, run_detection_parity
    ref_det, flax_det = run_detection_parity(
        # healthified mobiledet endpoints run hot (logit std ~15): DAMP the
        # prediction kernels so sigmoid scores spread instead of saturating
        # into ties at 1.0 (any tie makes NMS rank order arbitrary)
        input_size=448, seed=7, healthify=True, spread=(0.15, 0.05),
        config_path=(f"{REFERENCE}/configs/v3-8/"
                     "mscoco-retinanet-mobiledet-edge-tpu-448x448-30x-64.json"))
    _match_sets(ref_det, flax_det)
