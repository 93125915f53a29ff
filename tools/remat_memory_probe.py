"""Measure what backbone.remat and grad_accum_steps buy in device memory.

Compiles the FULL flagship train step (640x640) at several batch sizes
with architecture.backbone.remat off/on and grad_accum_steps 1/K, and
reports XLA's compiled memory analysis (temp/argument/peak bytes) plus,
when the run fits, the measured step time — each memory knob's
cost/benefit on the real chip in one table.

Usage: python tools/remat_memory_probe.py [--batches 8,16,24,32]
                                          [--accums 1,2] [--run]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import retinanet_tpu.core.cache  # noqa: F401

import jax
import jax.numpy as jnp
import numpy as np


def _step_for(params, batch_size, grad_accum=1):
    from retinanet_tpu.data import anchors as anchor_lib
    from retinanet_tpu.data.label_encoder import make_batched_encoder
    from retinanet_tpu.data.preprocessing import make_device_normalizer
    from retinanet_tpu.data.synthetic import synthetic_train_batch
    from retinanet_tpu.losses.losses import RetinaNetLoss
    from retinanet_tpu.models.retinanet import build_model
    from retinanet_tpu.optimizers.builder import build_optimizer
    from retinanet_tpu.train import step as step_lib
    from retinanet_tpu.train.train_state import create_train_state

    model = build_model(params)
    encoder = make_batched_encoder(anchor_lib.from_params(params),
                                   params.encoder_params)
    normalizer = make_device_normalizer(params)
    loss_fn = RetinaNetLoss(80, params.loss)
    tx, schedule = build_optimizer(
        params.training.optimizer, params.training.train_steps)
    variables = jax.jit(lambda k: model.init(
        k, jnp.zeros((1, 640, 640, 3)), train=False))(jax.random.PRNGKey(0))
    state = create_train_state(variables, tx)
    step = jax.jit(step_lib.make_train_step(
        model, loss_fn, encoder, normalizer, tx, schedule,
        use_weight_decay=True, weight_decay_alpha=1e-4,
        compute_dtype=jnp.bfloat16, grad_accum_steps=grad_accum),
        donate_argnums=(0,))
    batch = {k: np.asarray(v) for k, v in synthetic_train_batch(
        batch_size, (640, 640), 100, 80, seed=0).items()}
    if grad_accum > 1:
        batch = step_lib.fold_micro_batches(batch, grad_accum)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    return step, state, batch


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="8,16,24,32")
    ap.add_argument("--accums", default="1,2")
    ap.add_argument("--run", action="store_true",
                    help="also execute + time each fitting config")
    args = ap.parse_args()

    from __graft_entry__ import _flagship_params
    from retinanet_tpu.utils.benchmark import chained_step_time

    for bs in [int(b) for b in args.batches.split(",")]:
        for remat in (False, True):
            for accum in [int(a) for a in args.accums.split(",")]:
                if bs % accum:
                    continue
                params = _flagship_params()
                params.architecture.backbone["remat"] = remat
                tag = f"bs={bs:3d} remat={int(remat)} accum={accum}"
                try:
                    step, state, batch = _step_for(params, bs, accum)
                    compiled = step.lower(state, batch).compile()
                    mem = compiled.memory_analysis()
                    peak = (mem.temp_size_in_bytes
                            + mem.argument_size_in_bytes
                            + mem.output_size_in_bytes
                            - mem.alias_size_in_bytes)
                    line = (f"{tag} "
                            f"temp={mem.temp_size_in_bytes / 2**30:.2f}GiB "
                            f"args={mem.argument_size_in_bytes / 2**30:.2f}"
                            f"GiB peak~={peak / 2**30:.2f}GiB")
                    if args.run:
                        # use the executable already built for the memory
                        # analysis — calling `step` would re-trace and
                        # re-compile each config a second time
                        state, m = compiled(state, batch)
                        float(m["total-loss"])
                        dt, state = chained_step_time(compiled, state, batch,
                                                      iters=10)
                        line += (f" step={dt * 1e3:.1f}ms "
                                 f"({bs / dt:.1f} imgs/s)")
                    print(line, flush=True)
                    del step, state, batch
                except Exception as e:  # OOM at compile or run
                    print(f"{tag} FAILED: {type(e).__name__}: "
                          f"{str(e)[:160]}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
