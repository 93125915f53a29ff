"""Bound on the DEFAULT serving lane's trained-model mAP delta.

The shipped serving defaults deviate from the reference's exact pipeline
(approx top-k w/ recall target 0.95 + bf16 logit selection + nms_top_k
256 — ops/postprocess.py:make_inference_fn vs reference
model/layers/postprocessing_ops.py:120-173). tools/serving_lane_quality.py
measures the actual mAP cost of that deviation on a TRAINED 640x640
ResNet50 model on the real chip, on >=200 HELD-OUT scenes (round 5 — the
round-4 measurement used the 16 training images, which could not resolve
a |0.002| effect) with a paired-bootstrap 95% CI, and hard-fails above
the bound; this test pins the committed report so a regression in the
recorded numbers (or a default change made without re-measuring, or a
re-measurement on a set too small to resolve the gate) fails CI.
"""

import json
import os

REPORT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "reports", "serving_lane_640.json")


def test_default_lane_delta_recorded_and_bounded():
    with open(REPORT) as f:
        report = json.load(f)
    # the measurement must be statistically able to resolve the gate:
    # held-out set, and a bootstrap CI half-width below the gate
    assert report["n_images"] >= 200
    assert report["bootstrap_samples"] >= 200
    gate = report["gate"]
    assert gate <= 0.002
    assert report["default_delta_ci95"]["half_width"] < gate, (
        "the |delta| gate is unresolvable at this n — enlarging the "
        "held-out set is required before the bound means anything")
    # |mAP(exact) - mAP(default)| on the held-out set (measured 0.0003,
    # CI [-0.0006, 0.0014]): the default lane must not cost mAP
    assert abs(report["default_delta"]) <= gate
    assert abs(report["default_ap50_delta"]) <= 0.002
    # the report must carry all three lanes so the composition stays
    # measured (default+int8 is the fastest lane users pick); int8's own
    # CI (measured -0.0022 +/- 0.0024) stays within the documented 0.01
    assert set(report["lanes"]) == {"exact", "default", "default+int8"}
    assert abs(report["default_int8_delta"]) <= 0.01
