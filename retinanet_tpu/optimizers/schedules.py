"""Learning-rate schedules (optax-compatible callables).

Capability parity with reference retinanet/optimizers/:
  * PiecewiseConstantDecayWithLinearWarmup
    (piecewise_constant_decay_with_warmup.py:4-35) — note the reference
    shifts boundaries by -1; we reproduce that so LR changes on the same
    step numbers.
  * CosineDecayWithLinearWarmup (cosine_decay_with_warmup.py:4-43).
  * InverseDecay (inverse_decay.py:4-26).
"""

from __future__ import annotations

import math
from typing import Sequence

import jax.numpy as jnp


def piecewise_constant_decay_with_warmup(warmup_learning_rate: float,
                                         warmup_steps: int,
                                         boundaries: Sequence[int],
                                         values: Sequence[float]):
    if len(values) != len(boundaries) + 1:
        raise ValueError("need len(values) == len(boundaries) + 1")
    warmup_lr = float(warmup_learning_rate)
    warmup_steps = int(warmup_steps)
    bnds = jnp.asarray([b - 1 for b in boundaries], dtype=jnp.float32)
    vals = jnp.asarray(values, dtype=jnp.float32)
    step_size = float(values[0]) - warmup_lr

    def schedule(step):
        step_f = jnp.asarray(step, jnp.float32)
        warm = warmup_lr + step_f / warmup_steps * step_size
        idx = jnp.sum((step_f > bnds).astype(jnp.int32))
        decayed = vals[idx]
        return jnp.where(step_f < warmup_steps, warm, decayed)

    return schedule


def cosine_decay_with_warmup(initial_learning_rate: float,
                             warmup_learning_rate: float,
                             warmup_steps: int,
                             total_steps: int,
                             alpha: float = 0.0):
    init_lr = float(initial_learning_rate)
    warmup_lr = float(warmup_learning_rate)
    warmup_steps = int(warmup_steps)
    decay_steps = int(total_steps) - warmup_steps
    step_size = init_lr - warmup_lr

    def schedule(step):
        step_f = jnp.asarray(step, jnp.float32)
        warm = warmup_lr + step_f / warmup_steps * step_size
        # tf.keras CosineDecay: clips step to decay_steps; note the
        # reference feeds the *global* step (not step - warmup_steps).
        p = jnp.minimum(step_f, decay_steps) / decay_steps
        cosine = 0.5 * (1.0 + jnp.cos(math.pi * p))
        decayed = init_lr * ((1.0 - alpha) * cosine + alpha)
        return jnp.where(step_f < warmup_steps, warm, decayed)

    return schedule


def inverse_decay(initial_learning_rate: float, decay_rate: float):
    init_lr = float(initial_learning_rate)
    rate = float(decay_rate)

    def schedule(step):
        step_f = jnp.asarray(step, jnp.float32)
        denom = 1.0 + rate * step_f
        return jnp.where(denom == 0.0, 0.0, init_lr / denom)

    return schedule


def from_params(lr_params, total_steps: int):
    """Dispatch on `schedule_type` (reference optimizers/builder.py:14-25)."""
    kind = lr_params.schedule_type
    if kind == "piecewise_constant_decay":
        return piecewise_constant_decay_with_warmup(
            warmup_learning_rate=lr_params.warmup_learning_rate,
            warmup_steps=lr_params.warmup_steps,
            boundaries=list(lr_params["boundaries"]),
            # NOTE: indexed access — 'values' collides with dict.values
            values=list(lr_params["values"]))
    if kind == "cosine_decay":
        return cosine_decay_with_warmup(
            initial_learning_rate=lr_params.initial_learning_rate,
            warmup_learning_rate=lr_params.warmup_learning_rate,
            warmup_steps=lr_params.warmup_steps,
            total_steps=total_steps,
            alpha=float(lr_params.get("alpha", 0.0)))
    if kind == "inverse_decay":
        return inverse_decay(
            initial_learning_rate=lr_params.initial_learning_rate,
            decay_rate=lr_params.decay_rate)
    raise ValueError(f"Invalid learning rate schedule: {kind}")
