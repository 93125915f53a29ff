"""Per-op device profile of the flagship inference fn (fwd + postprocess).

Same xplane aggregation as profile_step.py but for make_inference_fn at
batch 8 (bench.py's serving benchmark).

Usage: PYTHONPATH=/root/.axon_site:. python tools/profile_infer.py [runs]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import retinanet_tpu.core.cache  # noqa: F401

import collections
import sys
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from tools.profile_step import aggregate_xplane


def main():
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    from __graft_entry__ import _flagship_params
    from retinanet_tpu.data import anchors as anchor_lib
    from retinanet_tpu.data.preprocessing import make_device_normalizer
    from retinanet_tpu.models.retinanet import build_model
    from retinanet_tpu.ops.postprocess import make_inference_fn

    params = _flagship_params()
    model = build_model(params)
    anchors = anchor_lib.from_params(params)
    normalizer = make_device_normalizer(params)
    variables = jax.jit(lambda k: model.init(
        k, jnp.zeros((1, 640, 640, 3)), train=False))(jax.random.PRNGKey(0))
    infer = jax.jit(make_inference_fn(model, params, anchors, normalizer,
                                      compute_dtype=jnp.bfloat16))
    images = jnp.asarray(np.random.default_rng(0).uniform(
        0, 255, (8, 640, 640, 3)), jnp.float32)

    out = infer(variables["params"], variables["batch_stats"], images)
    jax.tree_util.tree_map(lambda x: np.asarray(x), out)  # settle

    trace_dir = tempfile.mkdtemp(prefix="xinfer_")
    with jax.profiler.trace(trace_dir):
        for _ in range(runs):
            out = infer(variables["params"], variables["batch_stats"],
                        images)
        jax.tree_util.tree_map(lambda x: np.asarray(x), out)

    totals, occ, planes = aggregate_xplane(trace_dir)
    print("trace:", trace_dir)
    by_line = collections.defaultdict(collections.Counter)
    for (plane, line, name), ps in totals.items():
        by_line[(plane, line)][name] += ps
    for (plane, line), counter in sorted(by_line.items()):
        if line != "XLA Ops":
            continue
        total_ms = sum(counter.values()) / 1e9
        print(f"\n== {plane} :: {line} (total {total_ms:.2f} ms over "
              f"{runs} runs)")
        for name, ps in counter.most_common(35):
            print(f"  {ps / 1e9 / runs:9.3f} ms/run  {name[:130]}")


if __name__ == "__main__":
    main()
