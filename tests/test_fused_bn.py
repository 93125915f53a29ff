"""ops/fused_bn.py is a kept, documented negative result (the custom-VJP
one-pass BN was 6% slower end-to-end than flax's BN because the custom_vjp
boundary breaks XLA epilogue fusions — see models/layers.py perf note).
This test keeps it compiling and numerically honest."""

import jax
import jax.numpy as jnp
import numpy as np

from retinanet_tpu.ops.fused_bn import fused_batch_norm


def _ref_bn(x, scale, bias, eps):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=tuple(range(x.ndim - 1)))
    var = jnp.var(x32, axis=tuple(range(x.ndim - 1)))
    y = (x32 - mean) * jax.lax.rsqrt(var + eps) * scale + bias
    return y.astype(x.dtype), mean, var


def test_fused_bn_matches_direct_formulation():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(1.5, 2.0, (4, 8, 8, 16)), jnp.float32)
    scale = jnp.asarray(rng.normal(1.0, 0.1, (16,)), jnp.float32)
    bias = jnp.asarray(rng.normal(0.0, 0.1, (16,)), jnp.float32)

    y, mean, var = jax.jit(
        lambda x, s, b: fused_batch_norm(x, s, b, 1e-3))(x, scale, bias)
    y_ref, mean_ref, var_ref = _ref_bn(x, scale, bias, 1e-3)
    np.testing.assert_allclose(mean, mean_ref, atol=1e-5)
    np.testing.assert_allclose(var, var_ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(y, y_ref, atol=1e-4)


def test_fused_bn_custom_vjp_matches_autodiff():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0.0, 1.0, (2, 4, 4, 8)), jnp.float32)
    scale = jnp.asarray(rng.normal(1.0, 0.1, (8,)), jnp.float32)
    bias = jnp.zeros((8,), jnp.float32)

    def loss_fused(x, s, b):
        y, _, _ = fused_batch_norm(x, s, b, 1e-3)
        return jnp.sum(jnp.sin(y))

    def loss_ref(x, s, b):
        y, _, _ = _ref_bn(x, s, b, 1e-3)
        return jnp.sum(jnp.sin(y))

    g_fused = jax.jit(jax.grad(loss_fused, argnums=(0, 1, 2)))(x, scale, bias)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_ in zip(g_fused, g_ref):
        np.testing.assert_allclose(a, b_, rtol=1e-4, atol=1e-5)
