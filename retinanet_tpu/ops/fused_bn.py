"""Fused batch-normalization statistics — a kept NEGATIVE result.

Round-1 hypothesis: BN statistic reductions dominate the step, so one-pass
fused moments with a custom VJP should win. Measured outcome: 6% SLOWER
end-to-end — the custom_vjp boundary breaks XLA's epilogue fusions. Round-2
profiling (tools/profile_step.py + tools/bn_experiments.py) explained why:
the BN fusions already run at the chip's measured HBM streaming rate, and
deleting the stat computation entirely saves only ~11 ms of a ~105 ms step.
Kept as documentation, exercised by tests/test_fused_bn.py.

This module provides `fused_batch_norm` with a custom VJP:
  * forward: ONE variadic lax.reduce computes (sum, sumsq) reading x once
    (f32 accumulation from bf16 input);
  * backward: ONE variadic lax.reduce computes (sum(dy), sum(dy*xhat))
    reading dy and x once, then a single fused elementwise pass for dx.

Math (standard batch norm over reduction axes R, m = |R|):
  mu = sum(x)/m;  var = sum(x^2)/m - mu^2
  xhat = (x - mu) * rsqrt(var + eps);  y = gamma * xhat + beta
  dbeta = sum(dy);  dgamma = sum(dy * xhat)
  dx = gamma * rsqrt(var+eps) * (dy - dbeta/m - xhat * dgamma/m)
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax


def _moments_one_pass(x32: jnp.ndarray, axes) -> Tuple[jnp.ndarray,
                                                       jnp.ndarray]:
    """(mean, var) via a single variadic reduce over `axes`."""
    def comp(acc, val):
        return acc[0] + val[0], acc[1] + val[1]

    s, sq = lax.reduce(
        (x32, x32 * x32),
        (jnp.float32(0), jnp.float32(0)),
        comp, axes)
    m = 1.0
    for a in axes:
        m *= x32.shape[a]
    mean = s / m
    var = jnp.maximum(sq / m - mean * mean, 0.0)
    return mean, var


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_batch_norm(x, scale, bias, eps: float = 1e-3):
    """Training-mode batch norm over all axes but the last.

    x: (..., C) any float dtype; scale/bias: (C,) f32.
    Returns (y in x.dtype, mean (C,) f32, var (C,) f32).
    """
    y, mean, var = _fwd_impl(x, scale, bias, eps)
    return y, mean, var


def _fwd_impl(x, scale, bias, eps):
    axes = tuple(range(x.ndim - 1))
    x32 = x.astype(jnp.float32)
    mean, var = _moments_one_pass(x32, axes)
    inv = lax.rsqrt(var + eps)
    y = (x32 - mean) * inv * scale + bias
    return y.astype(x.dtype), mean, var


def _fwd(x, scale, bias, eps):
    y, mean, var = _fwd_impl(x, scale, bias, eps)
    return (y, mean, var), (x, scale, mean, var)


def _bwd(eps, residuals, cotangents):
    x, scale, mean, var = residuals
    dy, _, _ = cotangents  # no gradient flows into the returned moments
    axes = tuple(range(x.ndim - 1))
    m = 1.0
    for a in axes:
        m *= x.shape[a]
    x32 = x.astype(jnp.float32)
    dy32 = dy.astype(jnp.float32)
    inv = lax.rsqrt(var + eps)
    xhat = (x32 - mean) * inv

    def comp(acc, val):
        return acc[0] + val[0], acc[1] + val[1]

    dbeta, dgamma = lax.reduce(
        (dy32, dy32 * xhat),
        (jnp.float32(0), jnp.float32(0)),
        comp, axes)

    dx = (scale * inv) * (dy32 - dbeta / m - xhat * (dgamma / m))
    return dx.astype(x.dtype), dgamma, dbeta


fused_batch_norm.defvjp(_fwd, _bwd)
