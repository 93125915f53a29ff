"""Bound on the DEFAULT serving lane's trained-model mAP delta.

The shipped serving defaults deviate from the reference's exact pipeline
(approx top-k w/ recall target 0.95 + bf16 logit selection + nms_top_k
256 — ops/postprocess.py:make_inference_fn vs reference
model/layers/postprocessing_ops.py:120-173). tools/serving_lane_quality.py
measures the actual mAP cost of that deviation on a TRAINED 640x640
ResNet50 model (tools/overfit_check.py artifact, AP50 0.883) on the real
chip and hard-fails above the bound; this test pins the committed report
so a regression in the recorded numbers (or a default change made without
re-measuring) fails CI.
"""

import json
import os

REPORT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "reports", "serving_lane_640.json")


def test_default_lane_delta_recorded_and_bounded():
    with open(REPORT) as f:
        report = json.load(f)
    # |mAP(exact) - mAP(default)| at 640 on the trained model; sign-free
    # bound: the default must not cost more than 0.002 mAP (measured
    # -0.002: the default lane scored marginally HIGHER on this val set).
    assert abs(report["default_delta"]) <= 0.002
    assert report["default_ap50_delta"] == 0.0
    # the report must carry all three lanes so the composition stays
    # measured (default+int8 is the fastest lane users pick)
    assert set(report["lanes"]) == {"exact", "default", "default+int8"}
    assert abs(report["default_int8_delta"]) <= 0.02
