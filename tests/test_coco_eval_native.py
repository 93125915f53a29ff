"""Native C++ COCO matcher vs the pure-Python spec.

The C++ matcher (native/cocoeval_native.cpp) must reproduce the
pure-Python `_evaluate_img` matcher bit-for-bit at the packed-output
level (matched/ignored flags per area x threshold x detection and
non-ignored gt counts), across the same adversarial scenario generator
the differential suite uses (crowds, ignores, score ties, area-boundary
straddles, >100 detections)."""

import numpy as np
import pytest

from retinanet_tpu.eval import native as coco_native
from retinanet_tpu.eval.coco import COCOEval, COCOIndex
from tests.test_coco_eval_differential import random_scenario

pytestmark = pytest.mark.skipif(
    not coco_native.available(), reason="native cocoeval lib unavailable")


def _packed_outputs(gt, dts, use_native):
    ev = COCOEval(COCOIndex(gt), dts)
    ev.evaluate(use_native=use_native)
    p = ev._packed
    return ev, (p["dt_matched"], p["dt_ignore"], p["num_gt"])


@pytest.mark.parametrize("seed", range(10))
def test_native_matcher_bitwise_vs_python(seed):
    rng = np.random.default_rng(seed)
    gt, dts = random_scenario(rng)
    ev_n, out_n = _packed_outputs(gt, dts, use_native=True)
    ev_p, out_p = _packed_outputs(gt, dts, use_native=False)
    for a, b, name in zip(out_n, out_p, ("matched", "ignore", "num_gt")):
        np.testing.assert_array_equal(a, b, err_msg=f"{name} seed={seed}")
    ev_n.accumulate()
    ev_p.accumulate()
    np.testing.assert_array_equal(ev_n.stats, ev_p.stats)


def test_native_matcher_many_detections():
    rng = np.random.default_rng(7)
    gt, dts = random_scenario(rng, n_images=2, n_cats=2)
    for i in range(150):  # force the maxDets=100 truncation path
        dts.append({"image_id": 1, "category_id": 1,
                    "bbox": [float(5 + i % 11), float(5 + i % 13),
                             15.0, 15.0],
                    "score": float(0.5)})  # heavy score ties
    _, out_n = _packed_outputs(gt, dts, use_native=True)
    _, out_p = _packed_outputs(gt, dts, use_native=False)
    for a, b in zip(out_n, out_p):
        np.testing.assert_array_equal(a, b)


def test_python_fallback_differential_suite():
    """The differential reference must also agree with the PYTHON matcher
    (so both lanes stay pinned to the protocol, not just to each other)."""
    from tests.test_coco_eval_differential import reference_eval
    rng = np.random.default_rng(123)
    gt, dts = random_scenario(rng)
    ev = COCOEval(COCOIndex(gt), dts)
    ev.evaluate(use_native=False)
    ev.accumulate()
    np.testing.assert_allclose(ev.stats, reference_eval(gt, dts), atol=1e-9)
