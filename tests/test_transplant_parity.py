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
    from tools.transplant import run_parity
    return run_parity(input_size=256, seed=7)


def test_per_level_outputs_match_reference(parity_diffs):
    for (kind, lvl), diff in parity_diffs.items():
        assert diff < 1e-4, f"{kind} P{lvl}: {diff}"


def test_all_levels_compared(parity_diffs):
    kinds = {k for k, _ in parity_diffs}
    levels = {l for _, l in parity_diffs}
    assert kinds == {"box", "class"}
    assert levels == {3, 4, 5, 6, 7}


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
