"""Train state: one pytree holding everything the jitted step mutates.

JAX equivalent of the reference's model + optimizer + EMA variables
(reference executor.py:104-152, 255-267). The whole state is donated to the
step so XLA updates it in place (no HBM copies).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray               # () int32 — optimizer.iterations analog
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Optional[Any] = None          # tfa MovingAverage analog
    normalizer_ema: Optional[jnp.ndarray] = None  # moving-average loss norm


def create_train_state(variables,
                       tx: optax.GradientTransformation,
                       use_ema: bool = False,
                       use_normalizer_ema: bool = False) -> TrainState:
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        ema_params=jax.tree_util.tree_map(jnp.copy, params)
        if use_ema else None,
        normalizer_ema=jnp.zeros((), jnp.float32)
        if use_normalizer_ema else None,
    )
