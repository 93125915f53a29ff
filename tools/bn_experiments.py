"""BN-wall experiments: measure flagship train-step variants on the TPU.

Round-1 profiling attributed ~66 ms of the 122 ms step to BatchNorm
statistic reductions (models/layers.py perf note). This harness measures
the step time of controlled variants to locate the wall:

  baseline     current BatchNorm wrapper (fp32 cast + fp32 BN)
  frozen       use_running_average=True even in training — deletes the
               stat computation entirely (NOT semantically valid; upper
               bound on any stat-reduction optimization)
  bf16         no fp32 pre-cast; nn.BatchNorm computes in bf16 with
               force_float32_reductions (halves BN HBM traffic if casts
               don't fuse)
  slowvar      use_fast_variance=False (two-pass variance; control)

Usage: python tools/bn_experiments.py [variant ...]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import retinanet_tpu.core.cache  # noqa: F401  persistent XLA cache

import sys
from functools import partial

import jax
import jax.numpy as jnp

from flax import linen as nn


def _patch_batchnorm(variant: str):
    from typing import Callable, Optional
    from retinanet_tpu.models import (layers, resnet, fpn, heads, mlaf,
                                      efficientnet, mobiledet)

    class PatchedBatchNorm(nn.Module):
        momentum: float = 0.99
        epsilon: float = 1e-3
        dtype: object = jnp.float32
        scale_init: Callable = nn.initializers.ones
        use_running_average: Optional[bool] = None
        axis_name: Optional[str] = None

        @nn.compact
        def __call__(self, x, use_running_average=None):
            use_ra = nn.merge_param(
                "use_running_average", self.use_running_average,
                use_running_average)
            kwargs = dict(momentum=self.momentum, epsilon=self.epsilon,
                          param_dtype=jnp.float32,
                          scale_init=self.scale_init,
                          axis_name=self.axis_name, name="bn")
            if variant == "frozen":
                y = nn.BatchNorm(use_running_average=True,
                                 dtype=jnp.float32, **kwargs)(
                                     x.astype(jnp.float32))
            elif variant == "bf16":
                y = nn.BatchNorm(use_running_average=use_ra,
                                 dtype=self.dtype, **kwargs)(x)
            elif variant == "slowvar":
                y = nn.BatchNorm(use_running_average=use_ra,
                                 dtype=jnp.float32, use_fast_variance=False,
                                 **kwargs)(x.astype(jnp.float32))
            else:
                raise ValueError(variant)
            return y.astype(self.dtype)

    for mod in (layers, resnet, fpn, heads, mlaf, efficientnet, mobiledet):
        if hasattr(mod, "BatchNorm"):
            mod.BatchNorm = PatchedBatchNorm


def measure(variant: str) -> float:
    if variant != "baseline":
        _patch_batchnorm(variant)

    from __graft_entry__ import _flagship_params
    from retinanet_tpu.data import anchors as anchor_lib
    from retinanet_tpu.data.label_encoder import make_batched_encoder
    from retinanet_tpu.data.preprocessing import make_device_normalizer
    from retinanet_tpu.data.synthetic import synthetic_train_batch
    from retinanet_tpu.losses.losses import RetinaNetLoss
    from retinanet_tpu.models.retinanet import build_model
    from retinanet_tpu.optimizers.builder import build_optimizer
    from retinanet_tpu.train.train_state import create_train_state
    from retinanet_tpu.utils.benchmark import chained_step_time
    import optax

    params = _flagship_params()
    bs = 16
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

    # local step with a tolerant batch_stats fetch (the frozen variant
    # doesn't mutate the collection)
    def step(state, batch):
        images = normalizer(batch["image"]).astype(jnp.bfloat16)
        targets = encoder(batch["boxes"], batch["classes"], batch["valid"])

        def compute_loss(p):
            preds, mutated = model.apply(
                {"params": p, "batch_stats": state.batch_stats},
                images, train=True, mutable=["batch_stats"])
            losses, _ = loss_fn(targets, preds, None)
            return losses["weighted-loss"], mutated.get(
                "batch_stats", state.batch_stats)

        grads, new_stats = jax.grad(compute_loss, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=new_params,
                             batch_stats=new_stats, opt_state=new_opt), {
                                 "total-loss": losses_placeholder(grads)}

    def losses_placeholder(grads):
        return optax.global_norm(grads)

    step_jit = jax.jit(step, donate_argnums=(0,))
    batch = {k: jnp.asarray(v) for k, v in
             synthetic_train_batch(bs, (640, 640), 100, 80, seed=0).items()}
    state, m = step_jit(state, batch)
    float(m["total-loss"])
    dt, state = chained_step_time(step_jit, state, batch, iters=20)
    return dt


if __name__ == "__main__":
    variants = sys.argv[1:] or ["baseline"]
    for v in variants:
        dt = measure(v)
        print(f"{v}: {dt * 1000:.2f} ms/step, {16 / dt:.1f} imgs/s/chip",
              flush=True)
