"""Serving throughput/latency sweep: batch size x lane on the real chip.

Production serving needs an operating-point table, not one number: this
measures the FULL inference pipeline (normalize -> forward -> decode ->
top-k -> NMS) per batch size for the two lanes users actually deploy —
the default bf16 lane and the int8-activation lane (s8xs8->s32 MXU
convs) — and prints ms/batch latency, FPS, and the latency-vs-throughput
trade so a deployer can pick bs for an SLO.

The reference's serving numbers are single-point (README.md:83-90:
25 ms TF-FP32, 11.3 ms TRT-FP16, 93.4 FPS TRT-int8 on a V100 at bs=1);
this table is the TPU-native analog across batch sizes.

Usage: PYTHONPATH=/root/.axon_site:. python tools/serving_sweep.py \
    [--sizes 1,2,4,8,16,32] [--input_size 640]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import retinanet_tpu.core.cache  # noqa: F401

import json

import jax.numpy as jnp
import numpy as np
from absl import app, flags

FLAGS = flags.FLAGS
flags.DEFINE_list("sizes", ["1", "2", "4", "8", "16", "32"],
                  "batch sizes to sweep")
flags.DEFINE_integer("input_size", 640, "square input resolution")
flags.DEFINE_integer("iters", 20, "timed iterations per point")
flags.DEFINE_string("out", "reports/serving_sweep_640.json",
                    "where to write the table")
flags.DEFINE_bool("diagnose", False,
                  "per-leg split (forward-only vs full pipeline) at each "
                  "batch size, to attribute throughput dips (e.g. the bs8 "
                  "local minimum) to the conv stack vs the decode/top-k/NMS "
                  "leg; writes <out stem>_legs.json")


def main(argv):
    del argv
    import jax

    from __graft_entry__ import _flagship_params
    from retinanet_tpu.data import anchors as anchor_lib
    from retinanet_tpu.data.preprocessing import make_device_normalizer
    from retinanet_tpu.export.calibration import calibrate_activations
    from retinanet_tpu.export.quantize import Int8Model
    from retinanet_tpu.models.retinanet import build_model
    from retinanet_tpu.ops.postprocess import make_inference_fn
    from retinanet_tpu.utils.benchmark import device_time

    size = FLAGS.input_size
    params = _flagship_params()
    model = build_model(params)
    anchors = anchor_lib.from_params(params)
    normalizer = make_device_normalizer(params)

    variables = jax.jit(lambda k: model.init(
        k, jnp.zeros((1, size, size, 3)), train=False))(
        jax.random.PRNGKey(0))
    mp, bs_ = variables["params"], variables["batch_stats"]

    calib = [np.asarray(np.random.default_rng(i).uniform(
        0, 255, (4, size, size, 3)), np.float32) for i in range(2)]
    scales = calibrate_activations(
        model, variables, calib, mode="minmax",
        preprocess=lambda im: normalizer(im).astype(jnp.bfloat16))

    lanes = {
        "bf16": make_inference_fn(
            model, params, anchors, normalizer, compute_dtype=jnp.bfloat16),
        "int8": make_inference_fn(
            Int8Model(model, scales), params, anchors, normalizer,
            compute_dtype=jnp.bfloat16),
    }

    # forward-only legs (normalize + conv stack to raw head outputs) for
    # --diagnose: full-pipeline minus forward attributes the remainder to
    # the decode/top-k/NMS leg without restructuring make_inference_fn
    fwd_lanes = {}
    if FLAGS.diagnose:
        from retinanet_tpu.train import step as step_lib

        def _jit_fwd(m):
            raw = step_lib.make_eval_forward(m, jnp.bfloat16)
            return jax.jit(lambda p, s, im: raw(p, s, normalizer(im)))

        fwd_lanes["bf16"] = _jit_fwd(model)
        fwd_lanes["int8"] = _jit_fwd(Int8Model(model, scales))

    rows = []
    for n in [int(s) for s in FLAGS.sizes]:
        images = jnp.asarray(np.random.default_rng(0).uniform(
            0, 255, (n, size, size, 3)), jnp.float32)
        row = {"batch": n}
        for name, fn in lanes.items():
            dt = device_time(lambda im, fn=fn: fn(mp, bs_, im),
                             images, iters=FLAGS.iters)
            row[f"{name}_ms_per_batch"] = round(dt * 1000, 2)
            row[f"{name}_fps"] = round(n / dt, 1)
            if name in fwd_lanes:
                ffn = fwd_lanes[name]
                fdt = device_time(
                    lambda im, f=ffn: f(mp, bs_, im),
                    images, iters=FLAGS.iters)
                row[f"{name}_fwd_ms"] = round(fdt * 1000, 2)
                row[f"{name}_post_ms"] = round((dt - fdt) * 1000, 2)
        rows.append(row)
        print(json.dumps(row))

    out = FLAGS.out
    if FLAGS.diagnose:
        # keep the canonical sweep table untouched; legs go to a sibling
        out = out.rsplit(".", 1)[0] + "_legs.json"
    with open(out, "w") as f:
        json.dump({"input_size": size, "iters": FLAGS.iters,
                   "rows": rows}, f, indent=1)
    print(f"wrote {out}")

    # markdown table for docs
    print("\n| bs | bf16 ms/batch | bf16 FPS | int8 ms/batch | int8 FPS |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['batch']} | {r['bf16_ms_per_batch']} | "
              f"{r['bf16_fps']} | {r['int8_ms_per_batch']} | "
              f"{r['int8_fps']} |")


if __name__ == "__main__":
    app.run(main)
