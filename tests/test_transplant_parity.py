"""Weight-transplant full-model parity vs the EXECUTED reference.

The strongest available stand-in for the reference's published COCO-mAP
claim (no dataset/egress in this sandbox): build the reference Keras
RetinaNet (reference retinanet/model/builder.py:36-119) in-process with
random init, transplant every weight into the Flax model via a
deterministic name mapping (tools/transplant.py, exact-once coverage
asserted), and require:

  * per-level box/class outputs match to fp32 tolerance (<=1e-4, observed
    ~5e-7 at 256x256), and
  * the FINAL detection sets at matched thresholds are identical
    (class exact, scores <=1e-4, boxes <=2e-3 in normalized coords)
    against the reference's full export postprocess graph
    (reference model/builder.py:153-190 + postprocessing_ops.py:59-432).

Requires TF/tf_keras (present in this sandbox); skipped otherwise.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")
pytest.importorskip("tf_keras")


@pytest.fixture(scope="module")
def parity_diffs():
    # healthify: signal-preserving seeded weights + RANDOMIZED BN moving
    # stats, so the BN statistics mapping is load-bearing (identity stats
    # would hide mean<->variance or layer mix-ups)
    from tools.transplant import run_parity
    return run_parity(input_size=256, seed=7, healthify=True)


def test_per_level_outputs_match_reference(parity_diffs):
    for (kind, lvl), diff in parity_diffs.items():
        assert diff < 1e-4, f"{kind} P{lvl}: {diff}"


def test_all_levels_compared(parity_diffs):
    kinds = {k for k, _ in parity_diffs}
    levels = {l for _, l in parity_diffs}
    assert kinds == {"box", "class"}
    assert levels == {3, 4, 5, 6, 7}


def test_efficientnet_b2_outputs_match_reference():
    """Second model family: the shipped EfficientNet-B2 spec (MBConv + SE +
    separable FPN/head convs + BalanceFeatures). healthify is ESSENTIAL
    here: at default random init the deep swish stack attenuates the signal
    to ~1e-6 by P7 and any comparison is vacuous (this initially hid a
    missing BalanceFeatures stage in the parity harness). Worst observed
    diff with healthy weights: 2.8e-6."""
    import jax
    from tools.transplant import (EFFICIENTNET_CONFIG, run_parity,
                                  build_reference_model)
    diffs = run_parity(input_size=256, seed=7,
                       config_path=EFFICIENTNET_CONFIG, healthify=True)
    kinds = {k for k, _ in diffs}
    levels = {l for _, l in diffs}
    assert kinds == {"box", "class"} and levels == {3, 4, 5, 6, 7}
    for key, diff in diffs.items():
        assert diff < 1e-4, (key, diff)


def test_efficientnet_lite2_outputs_match_reference():
    """The lite family exercises what B2 doesn't: fused-conv blocks, no SE,
    relu6. Shipped spec (512x512 config). Worst observed diff 6.2e-5."""
    from tools.transplant import REFERENCE, run_parity
    cfg = (f"{REFERENCE}/configs/v3-32/"
           "mscoco-retinanet-efficientnet-lite2-512x512-30x-256.json")
    diffs = run_parity(input_size=256, seed=7, config_path=cfg,
                       healthify=True)
    assert {l for _, l in diffs} == {3, 4, 5, 6, 7}
    for key, diff in diffs.items():
        assert diff < 2e-4, (key, diff)


@pytest.mark.parametrize("variant,tol", [
    ("mscoco-retinanet-mobiledet-cpu-448x448-30x-64.json", 1e-4),
    # edge_tpu's tucker/fused stack runs hotter under healthified weights
    # (endpoint std ~4); diffs are fp accumulation, relative ~1.5e-5
    ("mscoco-retinanet-mobiledet-edge-tpu-448x448-30x-64.json", 2e-3),
], ids=["mobiledet_cpu", "mobiledet_edge_tpu"])
def test_mobiledet_outputs_match_reference(variant, tol):
    """Third/fourth families: MobileDet via the shared-creation-counter
    mapping (IBN+SE+swish6 for cpu; tucker/fused for edge_tpu). Observed:
    cpu 2.1e-6, edge_tpu 5.1e-4."""
    from tools.transplant import REFERENCE, run_parity
    diffs = run_parity(input_size=256, seed=7,
                       config_path=f"{REFERENCE}/configs/v3-8/{variant}",
                       healthify=True)
    assert len(diffs) >= 8
    for key, diff in diffs.items():
        assert diff < tol, (key, diff)


def test_efficientnet_b2_outputs_nontrivial():
    """Guard against vacuous parity (e.g. all-zero outputs agreeing)."""
    import json
    import jax
    import numpy as np
    from tools.transplant import (EFFICIENTNET_CONFIG, build_reference_model,
                                  keras_weight_dict, transplant)
    from retinanet_tpu.core.config import from_dict

    with open(EFFICIENTNET_CONFIG) as f:
        cfg = json.load(f)
    cfg["floatx"]["precision"] = "float32"
    ref_model = build_reference_model(cfg, 128)
    from tools.transplant import healthify_weights
    healthify_weights(ref_model, seed=7)
    weights = keras_weight_dict(ref_model)
    cfg2 = json.loads(json.dumps(cfg))
    cfg2["input"]["input_shape"] = [128, 128]
    cfg2["architecture"]["backbone"]["checkpoint"] = ""
    model, variables = transplant(from_dict(cfg2), weights, 128)
    x = np.random.default_rng(0).normal(0, 1, (1, 128, 128, 3)).astype(
        np.float32)
    out = jax.jit(lambda v, im: model.apply(v, im, train=False))(
        variables, x)
    cls = np.asarray(out["class-predictions"]["3"])
    box = np.asarray(out["box-predictions"]["3"])
    assert cls.std() > 1e-2, cls.std()
    assert box.std() > 1e-2, box.std()


def test_final_detections_match_reference():
    from tools.transplant import run_detection_parity
    ref, flax = run_detection_parity(input_size=256, seed=7)
    np.testing.assert_array_equal(ref["valid_detections"],
                                  flax["valid_detections"])
    for b in range(ref["scores"].shape[0]):
        n = int(ref["valid_detections"][b])
        assert n > 10, "comparison must be non-vacuous"

        def records(det):
            return [(int(det["classes"][b][i]), float(det["scores"][b][i]),
                     np.asarray(det["boxes"][b][i]))
                    for i in range(n)]

        # the reference's per-class NMS emits class-major order while ours
        # is globally score-sorted, and near-equal scores make any sort
        # key fragile — require an order-insensitive one-to-one matching
        unmatched = records(flax)
        for r in records(ref):
            hit = next(
                (i for i, f in enumerate(unmatched)
                 if f[0] == r[0] and abs(f[1] - r[1]) < 1e-4
                 and np.max(np.abs(f[2] - r[2])) < 2e-3), None)
            assert hit is not None, f"no match for reference det {r}"
            unmatched.pop(hit)
        assert not unmatched
