"""Measure the train-loop stall of a periodic checkpoint save.

The Executor's periodic saves run orbax-async (executor.py:_save_checkpoint
blocking=False): the mandatory D2H snapshot stays synchronous (the next
step donates the state buffers) but the disk serialization overlaps
training. This probe times, on the real flagship TrainState (ResNet50-FPN
640 params + SGD momentum + step), what the loop actually pays:

  blocking save   = device_get + full disk write + commit (old behavior)
  async dispatch  = device_get + background-write handoff (new behavior)
  drain           = wait_until_finished() afterwards (the hidden tail,
                    paid only if a restore/exit follows immediately)

Usage: python tools/ckpt_stall_probe.py [--iters 3]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import retinanet_tpu.core.cache  # noqa: F401

import jax
import jax.numpy as jnp


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import orbax.checkpoint as ocp

    from __graft_entry__ import _flagship_params
    from retinanet_tpu.models.retinanet import build_model
    from retinanet_tpu.optimizers.builder import build_optimizer
    from retinanet_tpu.train.train_state import create_train_state

    params = _flagship_params()
    model = build_model(params)
    tx, _ = build_optimizer(params.training.optimizer,
                            params.training.train_steps)
    variables = jax.jit(lambda k: model.init(
        k, jnp.zeros((1, 640, 640, 3)), train=False))(jax.random.PRNGKey(0))
    state = create_train_state(variables, tx)
    state = jax.device_put(state, jax.devices()[0])
    jax.block_until_ready(state.params)
    nbytes = sum(x.nbytes for x in jax.tree_util.tree_leaves(state))
    print(f"TrainState: {nbytes / 2**20:.0f} MiB on device")

    for mode in ("blocking", "async"):
        stalls, drains = [], []
        for i in range(args.iters):
            d = tempfile.mkdtemp(prefix=f"ckpt_probe_{mode}_")
            mgr = ocp.CheckpointManager(
                d, options=ocp.CheckpointManagerOptions(
                    max_to_keep=2, create=True,
                    enable_async_checkpointing=(mode == "async")))
            t0 = time.time()
            mgr.save(i, args=ocp.args.StandardSave(jax.device_get(state)))
            if mode == "blocking":
                mgr.wait_until_finished()
            stall = time.time() - t0
            t1 = time.time()
            mgr.wait_until_finished()
            drains.append(time.time() - t1)
            stalls.append(stall)
            mgr.close()
            shutil.rmtree(d, ignore_errors=True)
        print(f"{mode:9s} save: loop stall "
              f"{min(stalls) * 1e3:7.1f} ms (best of {args.iters}; "
              f"all {[round(s * 1e3) for s in stalls]}), "
              f"drain tail {min(drains) * 1e3:.1f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())
