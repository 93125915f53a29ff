"""Optimizer construction (optax).

Capability parity with reference retinanet/optimizers/builder.py:27-71 plus
the executor's gradient hygiene (reference executor.py:401-441):

  * SGD + momentum (optionally Nesterov); any optax optimizer by name.
  * LR schedules from `lr_params` (see schedules.py).
  * Gradient clipping: per-tensor clip_by_norm THEN global-norm clip, both
    at `clipnorm` (reference Executor._clip_gradients_by_norm:401-407).
  * Layer freezing by config `freeze_variables` regex keys — zero out
    updates for matching param paths (reference executor.py:154-176 +
    model/builder.py FREEZE_VARS_REGEX).
  * EMA of params (tfa MovingAverage equivalent) handled by the Executor
    via optax.ema-style state on top of this optimizer.

Weight decay note: the reference adds an explicit L2 penalty over conv
kernels to the LOSS (executor.py:296-327). We keep that semantics (see
train/executor.py) rather than decoupled weight decay, so the training
dynamics match.
"""

from __future__ import annotations

import re
from typing import Any, Callable, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import optax

from retinanet_tpu.models.retinanet import FREEZE_VARS_REGEX
from retinanet_tpu.optimizers import schedules


def clip_per_tensor_then_global(threshold: float) -> optax.GradientTransformation:
    """tf.clip_by_norm per tensor, then tf.clip_by_global_norm."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params

        def _clip_one(g):
            norm = jnp.sqrt(jnp.sum(jnp.square(g)))
            scale = jnp.minimum(1.0, threshold / jnp.maximum(norm, 1e-20))
            return g * scale

        updates = jax.tree_util.tree_map(_clip_one, updates)
        g_norm = optax.global_norm(updates)
        g_scale = jnp.minimum(1.0, threshold / jnp.maximum(g_norm, 1e-20))
        updates = jax.tree_util.tree_map(lambda g: g * g_scale, updates)
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


class KerasSGDState(NamedTuple):
    count: jnp.ndarray     # step counter fed to the LR schedule
    velocity: Any          # momentum buffer in Keras units (lr-scaled)


def keras_sgd(schedule: Callable, momentum: float = 0.0,
              nesterov: bool = False) -> optax.GradientTransformation:
    """SGD with the REFERENCE's (Keras) momentum semantics.

    Keras SGD folds the learning rate into the velocity buffer
    (tf_keras SGD.update_step: ``v = momentum * v - lr * g`` then
    ``w += v``; nesterov ``w += momentum * v_new - lr * g``), so past
    gradients stay scaled by the LR that was active WHEN THEY WERE TAKEN.
    optax.sgd instead accumulates a raw-gradient trace and multiplies by
    the CURRENT lr — identical for constant schedules, but a different
    optimizer under the reference's warmup/piecewise schedules (after a
    10x LR drop, optax instantly rescales the whole momentum buffer; Keras
    decays the old-LR momentum away over ~1/(1-m) steps). The reference's
    published mAP was trained with Keras semantics
    (reference executor.py:437, optimizers/builder.py:46), so this is the
    parity-correct default — verified by the lockstep run in
    tools/training_dynamics_parity.py.
    """

    if momentum == 0.0:
        # Momentum-less SGD needs no velocity buffer (the update is
        # -lr*g regardless of history; nesterov degenerates to the same
        # expression) — keep only the schedule counter instead of a
        # params-sized HBM buffer.
        def init_fn(params):
            del params
            return KerasSGDState(count=jnp.zeros([], jnp.int32),
                                 velocity=None)

        def update_fn(updates, state, params=None):
            del params
            lr = jnp.asarray(schedule(state.count), jnp.float32)
            out = jax.tree_util.tree_map(lambda g: -lr * g, updates)
            return out, KerasSGDState(count=state.count + 1, velocity=None)

        return optax.GradientTransformation(init_fn, update_fn)

    def init_fn(params):
        return KerasSGDState(
            count=jnp.zeros([], jnp.int32),
            velocity=jax.tree_util.tree_map(jnp.zeros_like, params))

    def update_fn(updates, state, params=None):
        del params
        lr = jnp.asarray(schedule(state.count), jnp.float32)
        m = jnp.float32(momentum)
        velocity = jax.tree_util.tree_map(
            lambda v, g: m * v - lr * g, state.velocity, updates)
        if nesterov:
            out = jax.tree_util.tree_map(
                lambda v, g: m * v - lr * g, velocity, updates)
        else:
            out = velocity
        return out, KerasSGDState(count=state.count + 1, velocity=velocity)

    return optax.GradientTransformation(init_fn, update_fn)


def _param_path_strings(params) -> Any:
    """Tree of 'a/b/c' path strings matching the param tree structure."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    paths = []
    for key_path, _ in flat:
        parts = []
        for k in key_path:
            if hasattr(k, "key"):
                parts.append(str(k.key))
            elif hasattr(k, "idx"):
                parts.append(str(k.idx))
            else:
                parts.append(str(k))
        paths.append("/".join(parts))
    return jax.tree_util.tree_unflatten(treedef, paths)


def freeze_mask_fn(freeze_keys: Sequence[str]) -> Callable:
    """Returns fn(params) -> bool tree; True = trainable."""
    regexes = []
    for key in freeze_keys:
        if key not in FREEZE_VARS_REGEX:
            raise ValueError(
                f"Unknown freeze_variables key '{key}'. "
                f"Available: {sorted(FREEZE_VARS_REGEX)}")
        regexes.append(FREEZE_VARS_REGEX[key])

    def mask(params):
        paths = _param_path_strings(params)
        return jax.tree_util.tree_map(
            lambda p: not any(r.search(p) for r in regexes), paths)

    return mask


def build_optimizer(opt_params,
                    train_steps: int,
                    freeze_variables: Sequence[str] = (),
                    precision: str = "mixed_bfloat16"):
    """Returns (optax.GradientTransformation, schedule_fn)."""
    del precision  # bf16 needs no loss scaling; fp16 is not used on TPU
    schedule = schedules.from_params(opt_params.lr_params, train_steps)

    name = opt_params.name.lower()
    if name == "sgd":
        core = keras_sgd(
            schedule,
            momentum=float(opt_params.get("momentum", 0.0)),
            nesterov=bool(opt_params.get("nesterov", False)))
    elif name == "adam":
        core = optax.adam(learning_rate=schedule)
    elif name == "adamw":
        core = optax.adamw(learning_rate=schedule)
    elif hasattr(optax, name):
        # generic registry: any optax optimizer factory by name, mirroring
        # the reference's `tf.optimizers.get(config)` passthrough
        # (reference optimizers/builder.py:33-38). Extra config fields that
        # match the factory's signature are forwarded.
        import inspect
        factory = getattr(optax, name)
        accepted = set(inspect.signature(factory).parameters)
        kwargs = {k: v for k, v in opt_params.items()
                  if k in accepted and k not in ("learning_rate",)}
        core = factory(learning_rate=schedule, **kwargs)
    else:
        raise ValueError(f"Unsupported optimizer: {opt_params.name}")

    chain = []
    clipnorm = opt_params.get("clipnorm", None)
    if clipnorm:
        chain.append(clip_per_tensor_then_global(float(clipnorm)))
    chain.append(core)
    tx = optax.chain(*chain)

    if freeze_variables:
        tx = optax.masked(tx, freeze_mask_fn(freeze_variables))
        # Frozen params get no updates at all.
        tx = optax.chain(
            tx,
            optax.masked(
                optax.set_to_zero(),
                lambda p: jax.tree_util.tree_map(
                    lambda x: not x, freeze_mask_fn(freeze_variables)(p))))
    return tx, schedule
