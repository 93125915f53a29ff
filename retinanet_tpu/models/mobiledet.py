"""MobileDet backbones (Flax Linen).

Capability parity with reference retinanet/model/backbone/mobiledet.py:
four hand-written variants (cpu / dsp / edge_tpu / gpu, ref:318-612) built
from:
  * _conv: conv(+bias)+BN+act (ref:46-75),
  * _separable_conv / depthwise with the depthwise He-init correction
    stddev = sqrt(2/k^2)/0.87962566 (ref:78-120),
  * _squeeze_and_excite with hidden = scale_filters(ch, 0.25) (ref:122-147),
  * _inverted_bottleneck(_no_expansion) (ref:150-232),
  * _fused_conv (ref:235-275), _tucker_conv (ref:278-315),
  * swish6 h*relu6(h+3)/6 for the cpu variant (ref:41-43),
  * base-8 filter scaling (ref:34-38),
emitting endpoints {'1'..'5'}.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from retinanet_tpu.models.layers import BatchNorm

Dtype = Any

_VS_INIT = nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal")


def scale_filters(filters: int, multiplier: float, base: int = 8) -> int:
    round_half_up = int(int(filters) * multiplier / base + 0.5)
    return max(int(round_half_up * base), base)


def swish6(h):
    return h * jax.nn.relu6(h + 3.0) * (1.0 / 6.0)


def _dw_init(kernel_size: int):
    stddev = (2.0 / kernel_size ** 2) ** 0.5 / 0.87962566103423978
    return nn.initializers.truncated_normal(stddev=stddev)


class _Ctx:
    """Carries module-level state through the functional block builders."""

    def __init__(self, module: nn.Module, act: Callable, train: bool,
                 bn_momentum: float, bn_epsilon: float, dtype):
        self.m = module
        self.act = act
        self.train = train
        self.bn_momentum = bn_momentum
        self.bn_epsilon = bn_epsilon
        self.dtype = dtype
        self.counter = 0

    def _name(self, kind: str) -> str:
        self.counter += 1
        return f"{kind}_{self.counter}"

    def conv(self, x, filters, kernel_size, strides=1, use_bn=True,
             act: Optional[Callable] = None):
        act = self.act if act is None else act
        x = nn.Conv(
            filters, (kernel_size, kernel_size), strides=(strides, strides),
            padding="SAME", use_bias=True, kernel_init=_VS_INIT,
            dtype=self.dtype, param_dtype=jnp.float32,
            name=self._name("conv"))(x)
        if use_bn:
            x = BatchNorm(momentum=self.bn_momentum, epsilon=self.bn_epsilon,
                          dtype=self.dtype, name=self._name("bn"))(
                              x, use_running_average=not self.train)
        return act(x)

    def depthwise(self, x, kernel_size, strides=1):
        ch = x.shape[-1]
        x = nn.Conv(ch, (kernel_size, kernel_size),
                    strides=(strides, strides), padding="SAME",
                    feature_group_count=ch, use_bias=True,
                    kernel_init=_dw_init(kernel_size), dtype=self.dtype,
                    param_dtype=jnp.float32, name=self._name("dwconv"))(x)
        x = BatchNorm(momentum=self.bn_momentum, epsilon=self.bn_epsilon,
                      dtype=self.dtype, name=self._name("bn"))(
                          x, use_running_average=not self.train)
        return self.act(x)

    def squeeze_excite(self, x, hidden_dim):
        ch = x.shape[-1]
        u = jnp.mean(x, axis=(1, 2), keepdims=True)
        u = self.conv(u, hidden_dim, 1, use_bn=False)
        u = self.conv(u, ch, 1, use_bn=False, act=jax.nn.sigmoid)
        return u * x

    # -- blocks (ref:150-315) ------------------------------------------------

    def ibn_no_expansion(self, x, filters, kernel_size=3, strides=1,
                         use_se=False):
        ch = x.shape[-1]
        x = self.depthwise(x, kernel_size, strides)
        if use_se:
            x = self.squeeze_excite(x, scale_filters(ch, 0.25))
        return self.conv(x, filters, 1, act=lambda v: v)

    def ibn(self, x, filters, kernel_size=3, expansion=8, strides=1,
            use_se=False, residual=True):
        shortcut = x
        expanded = x.shape[-1] * expansion
        x = self.conv(x, expanded, 1)
        x = self.depthwise(x, kernel_size, strides)
        if use_se:
            x = self.squeeze_excite(x, scale_filters(expanded, 0.25))
        x = self.conv(x, filters, 1, act=lambda v: v)
        return x + shortcut if residual else x

    def fused(self, x, filters, kernel_size=3, expansion=8, strides=1,
              use_se=False, residual=True):
        shortcut = x
        expanded = x.shape[-1] * expansion
        x = self.conv(x, expanded, kernel_size, strides=strides)
        if use_se:
            x = self.squeeze_excite(x, scale_filters(expanded, 0.25))
        x = self.conv(x, filters, 1, act=lambda v: v)
        return x + shortcut if residual else x

    def tucker(self, x, filters, kernel_size=3, input_rank_ratio=0.25,
               output_rank_ratio=0.25, strides=1, residual=True):
        shortcut = x
        input_rank = scale_filters(x.shape[-1], input_rank_ratio)
        x = self.conv(x, input_rank, 1)
        output_rank = scale_filters(filters, output_rank_ratio)
        x = self.conv(x, output_rank, kernel_size, strides=strides)
        x = self.conv(x, filters, 1, act=lambda v: v)
        return x + shortcut if residual else x


def _cpu(c: _Ctx, h, s):
    """ref mobiledet_cpu_backbone:318-381."""
    e = {}
    h = c.conv(h, s(16), 3, strides=2)
    h = c.ibn_no_expansion(h, s(8), use_se=True)
    e["1"] = h
    h = c.ibn(h, s(16), expansion=4, strides=2, use_se=True, residual=False)
    e["2"] = h
    h = c.ibn(h, s(32), expansion=8, strides=2, use_se=True, residual=False)
    for _ in range(3):
        h = c.ibn(h, s(32), expansion=4, use_se=True)
    e["3"] = h
    h = c.ibn(h, s(72), kernel_size=5, expansion=8, strides=2, use_se=True,
              residual=False)
    h = c.ibn(h, s(72), expansion=8, use_se=True)
    h = c.ibn(h, s(72), kernel_size=5, expansion=4, use_se=True)
    h = c.ibn(h, s(72), expansion=4, use_se=True)
    h = c.ibn(h, s(72), expansion=8, use_se=True, residual=False)
    for _ in range(3):
        h = c.ibn(h, s(72), expansion=8, use_se=True)
    e["4"] = h
    h = c.ibn(h, s(104), kernel_size=5, expansion=8, strides=2, use_se=True,
              residual=False)
    h = c.ibn(h, s(104), kernel_size=5, expansion=4, use_se=True)
    h = c.ibn(h, s(104), kernel_size=5, expansion=4, use_se=True)
    h = c.ibn(h, s(104), expansion=4, use_se=True)
    h = c.ibn(h, s(144), expansion=8, use_se=True, residual=False)
    e["5"] = h
    return e


def _dsp(c: _Ctx, h, s):
    """ref mobiledet_dsp_backbone:383-443."""
    e = {}
    h = c.conv(h, s(32), 3, strides=2)
    h = c.ibn_no_expansion(h, s(24))
    e["1"] = h
    h = c.fused(h, s(32), expansion=4, strides=2, residual=False)
    h = c.fused(h, s(32), expansion=4)
    h = c.ibn(h, s(32), expansion=4)
    h = c.tucker(h, s(32), input_rank_ratio=0.25, output_rank_ratio=0.75)
    e["2"] = h
    h = c.fused(h, s(64), expansion=8, strides=2, residual=False)
    h = c.ibn(h, s(64), expansion=4)
    h = c.fused(h, s(64), expansion=4)
    h = c.fused(h, s(64), expansion=4)
    e["3"] = h
    h = c.fused(h, s(120), expansion=8, strides=2, residual=False)
    h = c.ibn(h, s(120), expansion=4)
    h = c.ibn(h, s(120), expansion=8)
    h = c.ibn(h, s(120), expansion=8)
    h = c.fused(h, s(144), expansion=8, residual=False)
    h = c.ibn(h, s(144), expansion=8)
    h = c.ibn(h, s(144), expansion=8)
    h = c.ibn(h, s(144), expansion=8)
    e["4"] = h
    h = c.ibn(h, s(160), expansion=4, strides=2, residual=False)
    h = c.ibn(h, s(160), expansion=4)
    h = c.fused(h, s(160), expansion=4)
    h = c.tucker(h, s(160), input_rank_ratio=0.75, output_rank_ratio=0.75)
    h = c.ibn(h, s(240), expansion=8, residual=False)
    e["5"] = h
    return e


def _edge_tpu(c: _Ctx, h, s):
    """ref mobiledet_edgetpu_backbone:445-510."""
    e = {}
    h = c.conv(h, s(32), 3, strides=2)
    h = c.tucker(h, s(16), input_rank_ratio=0.25, output_rank_ratio=0.75,
                 residual=False)
    e["1"] = h
    h = c.fused(h, s(16), expansion=8, strides=2, residual=False)
    h = c.fused(h, s(16), expansion=4)
    h = c.fused(h, s(16), expansion=8)
    h = c.fused(h, s(16), expansion=4)
    e["2"] = h
    h = c.fused(h, s(40), expansion=8, kernel_size=5, strides=2,
                residual=False)
    h = c.fused(h, s(40), expansion=4)
    h = c.fused(h, s(40), expansion=4)
    h = c.fused(h, s(40), expansion=4)
    e["3"] = h
    h = c.ibn(h, s(72), expansion=8, strides=2, residual=False)
    h = c.ibn(h, s(72), expansion=8)
    h = c.fused(h, s(72), expansion=4)
    h = c.fused(h, s(72), expansion=4)
    h = c.ibn(h, s(96), expansion=8, kernel_size=5, residual=False)
    h = c.ibn(h, s(96), expansion=8, kernel_size=5)
    h = c.ibn(h, s(96), expansion=8)
    h = c.ibn(h, s(96), expansion=8)
    e["4"] = h
    h = c.ibn(h, s(120), expansion=8, kernel_size=5, strides=2,
              residual=False)
    h = c.ibn(h, s(120), expansion=8)
    h = c.ibn(h, s(120), expansion=4, kernel_size=5)
    h = c.ibn(h, s(120), expansion=8)
    h = c.ibn(h, s(384), expansion=8, kernel_size=5, residual=False)
    e["5"] = h
    return e


def _gpu(c: _Ctx, h, s):
    """ref mobiledet_gpu_backbone:512-612."""
    e = {}
    h = c.conv(h, s(32), 3, strides=2)
    h = c.tucker(h, s(16), input_rank_ratio=0.25, output_rank_ratio=0.25,
                 residual=False)
    e["1"] = h
    h = c.fused(h, s(32), expansion=8, strides=2, residual=False)
    h = c.tucker(h, s(32), input_rank_ratio=0.25, output_rank_ratio=0.25)
    h = c.tucker(h, s(32), input_rank_ratio=0.25, output_rank_ratio=0.25)
    h = c.tucker(h, s(32), input_rank_ratio=0.25, output_rank_ratio=0.25)
    e["2"] = h
    h = c.fused(h, s(64), expansion=8, strides=2, residual=False)
    h = c.fused(h, s(64), expansion=8)
    h = c.fused(h, s(64), expansion=8)
    h = c.fused(h, s(64), expansion=4)
    e["3"] = h
    h = c.fused(h, s(128), expansion=8, strides=2, residual=False)
    h = c.fused(h, s(128), expansion=4)
    h = c.fused(h, s(128), expansion=4)
    h = c.fused(h, s(128), expansion=4)
    h = c.fused(h, s(128), expansion=8, residual=False)
    h = c.fused(h, s(128), expansion=8)
    h = c.fused(h, s(128), expansion=8)
    h = c.fused(h, s(128), expansion=8)
    e["4"] = h
    h = c.fused(h, s(128), expansion=4, strides=2, residual=False)
    h = c.fused(h, s(128), expansion=4)
    h = c.fused(h, s(128), expansion=4)
    h = c.fused(h, s(128), expansion=4)
    h = c.ibn(h, s(384), expansion=8, residual=False)
    e["5"] = h
    return e


_VARIANTS = {
    "mobiledet_cpu": (_cpu, swish6),
    "mobiledet_dsp": (_dsp, jax.nn.relu6),
    "mobiledet_edge_tpu": (_edge_tpu, jax.nn.relu6),
    "mobiledet_gpu": (_gpu, jax.nn.relu6),
}


class MobileDet(nn.Module):
    """Backbone emitting {'1'..'5'} endpoints."""
    variant: str = "mobiledet_edge_tpu"
    multiplier: float = 1.0
    bn_momentum: float = 0.99
    bn_epsilon: float = 1e-3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        if self.variant not in _VARIANTS:
            raise ValueError(
                f"Unknown MobileDet variant: {self.variant}. "
                f"Available: {sorted(_VARIANTS)}")
        build_fn, act = _VARIANTS[self.variant]
        ctx = _Ctx(self, act, train, self.bn_momentum, self.bn_epsilon,
                   self.dtype)

        def s(f):
            return scale_filters(f, self.multiplier)

        return build_fn(ctx, x, s)
