"""Device-honest micro-benchmarking.

The tunneled TPU runtime ('axon') makes naive timing useless:
  * jax.block_until_ready can return before device work completes,
  * every eager op / tiny device_get costs a full tunnel round trip.

`device_time` therefore measures N iterations INSIDE one jitted program: a
lax.fori_loop whose carry forces iteration i+1 to depend on iteration i's
output (a zero-valued data dependency folded into the input), so XLA cannot
elide or overlap the work. One dispatch + one scalar fetch per measurement;
tunnel RTT is amortized over all iterations.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp


def device_time(fn: Callable, example_input, iters: int = 20,
                warmup: bool = True) -> float:
    """Average seconds per `fn(input)` call, measured on device.

    fn must map one array to a pytree; the first output leaf is folded back
    into the input as a serial dependency.
    """

    def run(x):
        def body(_, carry):
            out = fn(carry)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return carry + (leaf.reshape(-1)[0] * 0).astype(carry.dtype)

        final = jax.lax.fori_loop(0, iters, body, x)
        return final.reshape(-1)[0]

    run_jit = jax.jit(run)
    if warmup:
        float(run_jit(example_input))  # compile + one warm pass
    t0 = time.perf_counter()
    result = run_jit(example_input)
    scalar = float(result)  # forces completion through the tunnel
    del scalar
    return (time.perf_counter() - t0) / iters


def chained_step_time(step_fn: Callable, state, batch, iters: int = 20,
                      fetch=lambda m: m["total-loss"]):
    """Average seconds per train step: state donation already serializes
    the chain; one scalar fetch at the end forces completion.

    Returns (seconds_per_step, final_state) — the input state's buffers
    are DONATED by the first step, so callers must switch to the returned
    state."""
    state, metrics = step_fn(state, batch)  # warm (assumed compiled)
    float(fetch(metrics))
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step_fn(state, batch)
    float(fetch(metrics))
    return (time.perf_counter() - t0) / iters, state
