"""A/B the decode-after-top-k serving lane on the attached TPU.

Measures the full flagship serving function (640x640, bs8, bf16 lane)
with inference.decode_after_topk off vs on. The two lanes are
bitwise-identical in output (tests/test_inference_lanes.py); this tool
decides whether the smaller decode (C*k candidates vs all ~77k anchors,
at the price of one extra anchor-row gather) is a speedup in practice.

Usage: python tools/decode_after_topk_ab.py [--iters 30]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import argparse
import sys

import retinanet_tpu.core.cache  # noqa: F401

import jax
import jax.numpy as jnp
import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    from __graft_entry__ import _flagship_params
    from retinanet_tpu.data import anchors as anchor_lib
    from retinanet_tpu.data.preprocessing import make_device_normalizer
    from retinanet_tpu.models.retinanet import build_model
    from retinanet_tpu.ops.postprocess import make_inference_fn
    from retinanet_tpu.utils.benchmark import device_time

    params = _flagship_params()
    model = build_model(params)
    anchors = anchor_lib.from_params(params)
    normalizer = make_device_normalizer(params)
    variables = jax.jit(lambda k: model.init(
        k, jnp.zeros((1, 640, 640, 3)), train=False))(jax.random.PRNGKey(0))
    images = jnp.asarray(
        np.random.default_rng(0).uniform(
            0, 255, (args.batch, 640, 640, 3)), jnp.float32)

    results = {}
    for flag in (False, True):
        params.inference["decode_after_topk"] = flag
        infer = make_inference_fn(
            model, params, anchors, normalizer, compute_dtype=jnp.bfloat16)
        dt = device_time(
            lambda im: infer(variables["params"], variables["batch_stats"],
                             im),
            images, iters=args.iters)
        results[flag] = dt
        print(f"decode_after_topk={flag}: {dt * 1e3:.2f} ms "
              f"({args.batch / dt:.1f} FPS)", flush=True)

    speedup = results[False] / results[True]
    print(f"speedup from decode_after_topk: {speedup:.3f}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
