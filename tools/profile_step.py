"""Per-op device profile of the flagship train step.

Captures a jax.profiler trace of N chained steps and aggregates the TPU
device plane's event durations by op name, printing the top-K time sinks.
Parses the raw .xplane.pb with TF's bundled xplane proto (no tensorboard
plugin needed).

Usage: PYTHONPATH=/root/.axon_site:. python tools/profile_step.py [steps]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import retinanet_tpu.core.cache  # noqa: F401

import collections
import glob
import os
import sys
import tempfile

import jax
import jax.numpy as jnp


def build_step():
    from __graft_entry__ import _flagship_params
    from retinanet_tpu.data import anchors as anchor_lib
    from retinanet_tpu.data.label_encoder import make_batched_encoder
    from retinanet_tpu.data.preprocessing import make_device_normalizer
    from retinanet_tpu.data.synthetic import synthetic_train_batch
    from retinanet_tpu.losses.losses import RetinaNetLoss
    from retinanet_tpu.models.retinanet import build_model
    from retinanet_tpu.optimizers.builder import build_optimizer
    from retinanet_tpu.train import step as step_lib
    from retinanet_tpu.train.train_state import create_train_state

    params = _flagship_params()
    model = build_model(params)
    anchors = anchor_lib.from_params(params)
    encoder = make_batched_encoder(anchors, params.encoder_params)
    normalizer = make_device_normalizer(params)
    loss_fn = RetinaNetLoss(80, params.loss)
    tx, schedule = build_optimizer(
        params.training.optimizer, params.training.train_steps)
    variables = jax.jit(lambda k: model.init(
        k, jnp.zeros((1, 640, 640, 3)), train=False))(jax.random.PRNGKey(0))
    state = create_train_state(variables, tx)
    step = jax.jit(
        step_lib.make_train_step(
            model, loss_fn, encoder, normalizer, tx, schedule,
            use_weight_decay=True, weight_decay_alpha=1e-4,
            compute_dtype=jnp.bfloat16),
        donate_argnums=(0,))
    batch = {k: jnp.asarray(v) for k, v in
             synthetic_train_batch(16, (640, 640), 100, 80, seed=0).items()}
    return step, state, batch


def aggregate_xplane(trace_dir: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane under {trace_dir}"
    totals = collections.Counter()
    occurrences = collections.Counter()
    plane_names = []
    for path in paths:
        xspace = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xspace.ParseFromString(f.read())
        for plane in xspace.planes:
            plane_names.append(plane.name)
            if "TPU" not in plane.name and "/device" not in plane.name:
                continue
            ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
            for line in plane.lines:
                # XLA Ops line carries per-op self times
                if line.name not in ("XLA Ops", "XLA Modules", "Steps"):
                    pass
                for event in line.events:
                    name = ev_meta.get(event.metadata_id, "?")
                    totals[(plane.name, line.name, name)] += \
                        event.duration_ps
                    occurrences[(plane.name, line.name, name)] += 1
    return totals, occurrences, plane_names


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    step, state, batch = build_step()
    state, metrics = step(state, batch)
    float(metrics["total-loss"])  # compile + settle

    trace_dir = tempfile.mkdtemp(prefix="xprof_")
    with jax.profiler.trace(trace_dir):
        for _ in range(steps):
            state, metrics = step(state, batch)
        float(metrics["total-loss"])

    totals, occ, planes = aggregate_xplane(trace_dir)
    print("planes:", sorted(set(planes)))
    by_line = collections.defaultdict(collections.Counter)
    for (plane, line, name), ps in totals.items():
        by_line[(plane, line)][name] += ps
    for (plane, line), counter in sorted(by_line.items()):
        total_ms = sum(counter.values()) / 1e9
        print(f"\n== {plane} :: {line} (total {total_ms:.2f} ms over "
              f"{steps} steps)")
        for name, ps in counter.most_common(40):
            print(f"  {ps / 1e9 / steps:9.3f} ms/step  {name[:110]}")


if __name__ == "__main__":
    main()
