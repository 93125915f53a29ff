"""Post-activation ResNet v1 backbones (Flax Linen).

Capability parity with reference retinanet/model/backbone/resnet.py:
  * depths {10, 14, 18, 26, 34, 50, 101, 152, 200} (_MODEL_CONFIG, ref:345-382)
  * explicit fixed padding for strided convs (ref conv2d_fixed_padding:118-144)
  * zero-init gamma on each block's final BN (ref:147-248)
  * 7x7/2 stem + 3x3/2 SAME max-pool (ref resnet_fn:289-307)
  * outputs dict {'2': C2, '3': C3, '4': C4, '5': C5} (ref:336-341)
  * backbone activation is always ReLU (config activation applies to
    neck/heads only — ref NormActivation default).

TPU-first: NHWC layout, bf16 compute / fp32 params, convs without bias
(folded into BN), all shapes static so XLA tiles convs onto the MXU.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from retinanet_tpu.models.layers import BatchNorm

Dtype = Any

_CONV_INIT = nn.initializers.variance_scaling(
    1.0, "fan_in", "truncated_normal")

MODEL_CONFIG = {
    10: ("residual", (1, 1, 1, 1)),
    14: ("bottleneck", (1, 1, 1, 1)),
    18: ("residual", (2, 2, 2, 2)),
    26: ("bottleneck", (2, 2, 2, 2)),
    34: ("residual", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
    200: ("bottleneck", (3, 24, 36, 3)),
}


def _fixed_pad(x: jnp.ndarray, kernel_size: int) -> jnp.ndarray:
    """Input-size-independent padding for strided convs (ref:93-115)."""
    pad_total = kernel_size - 1
    pad_beg = pad_total // 2
    pad_end = pad_total - pad_beg
    return jnp.pad(x, ((0, 0), (pad_beg, pad_end), (pad_beg, pad_end), (0, 0)))


class ConvFixedPadding(nn.Module):
    """Strided conv with explicit padding (ref conv2d_fixed_padding:118-144)."""
    filters: int
    kernel_size: int
    strides: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.strides > 1:
            x = _fixed_pad(x, self.kernel_size)
        return nn.Conv(
            features=self.filters,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.strides, self.strides),
            padding="SAME" if self.strides == 1 else "VALID",
            use_bias=False,
            kernel_init=_CONV_INIT,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv")(x)


class ResidualBlock(nn.Module):
    """Basic 2-conv residual block (ref residual_block:147-195)."""
    filters: int
    strides: int
    use_projection: bool = False
    bn_momentum: float = 0.99
    bn_epsilon: float = 1e-3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        bn = partial(BatchNorm, momentum=self.bn_momentum,
                     epsilon=self.bn_epsilon, dtype=self.dtype)
        shortcut = x
        if self.use_projection:
            shortcut = ConvFixedPadding(
                self.filters, 1, self.strides, dtype=self.dtype,
                name="proj")(x)
            shortcut = bn(name="proj_bn")(
                shortcut, use_running_average=not train)

        x = ConvFixedPadding(self.filters, 3, self.strides, dtype=self.dtype,
                             name="conv1")(x)
        x = jax.nn.relu(bn(name="bn1")(x, use_running_average=not train))
        x = ConvFixedPadding(self.filters, 3, 1, dtype=self.dtype,
                             name="conv2")(x)
        x = bn(scale_init=nn.initializers.zeros, name="bn2")(
            x, use_running_average=not train)
        return jax.nn.relu(x + shortcut)


class BottleneckBlock(nn.Module):
    """1-3-1 bottleneck block, 4x expansion (ref bottleneck_block:198-248)."""
    filters: int
    strides: int
    use_projection: bool = False
    bn_momentum: float = 0.99
    bn_epsilon: float = 1e-3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        bn = partial(BatchNorm, momentum=self.bn_momentum,
                     epsilon=self.bn_epsilon, dtype=self.dtype)
        shortcut = x
        if self.use_projection:
            shortcut = ConvFixedPadding(
                4 * self.filters, 1, self.strides, dtype=self.dtype,
                name="proj")(x)
            shortcut = bn(name="proj_bn")(
                shortcut, use_running_average=not train)

        x = ConvFixedPadding(self.filters, 1, 1, dtype=self.dtype,
                             name="conv1")(x)
        x = jax.nn.relu(bn(name="bn1")(x, use_running_average=not train))
        x = ConvFixedPadding(self.filters, 3, self.strides, dtype=self.dtype,
                             name="conv2")(x)
        x = jax.nn.relu(bn(name="bn2")(x, use_running_average=not train))
        x = ConvFixedPadding(4 * self.filters, 1, 1, dtype=self.dtype,
                             name="conv3")(x)
        x = bn(scale_init=nn.initializers.zeros, name="bn3")(
            x, use_running_average=not train)
        return jax.nn.relu(x + shortcut)


class BlockGroup(nn.Module):
    """First block projects/strides; the rest are identity (ref:252-287).

    ``remat`` wraps each block in ``nn.remat`` (jax.checkpoint): only
    block-boundary activations are kept live for the backward pass and
    everything inside a block is recomputed — the standard TPU
    FLOPs-for-HBM trade that lets high-resolution configs (e.g. the
    1280x1280 reference config) fit a useful per-chip batch. Lifted
    transform: parameter names/values are identical with or without it.
    """
    filters: int
    block_type: str
    blocks: int
    strides: int
    bn_momentum: float = 0.99
    bn_epsilon: float = 1e-3
    dtype: Dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        block_cls = (BottleneckBlock if self.block_type == "bottleneck"
                     else ResidualBlock)
        if self.remat:
            block_cls = nn.remat(block_cls, static_argnums=(2,))
        x = block_cls(self.filters, self.strides, use_projection=True,
                      bn_momentum=self.bn_momentum,
                      bn_epsilon=self.bn_epsilon, dtype=self.dtype,
                      name="block0")(x, train)
        for i in range(1, self.blocks):
            x = block_cls(self.filters, 1,
                          bn_momentum=self.bn_momentum,
                          bn_epsilon=self.bn_epsilon, dtype=self.dtype,
                          name=f"block{i}")(x, train)
        return x


class ResNet(nn.Module):
    """ResNet backbone emitting {'2': C2, '3': C3, '4': C4, '5': C5}."""
    depth: int = 50
    bn_momentum: float = 0.99
    bn_epsilon: float = 1e-3
    dtype: Dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        if self.depth not in MODEL_CONFIG:
            raise ValueError(f"Unsupported ResNet depth: {self.depth}")
        block_type, layers = MODEL_CONFIG[self.depth]

        x = ConvFixedPadding(64, 7, 2, dtype=self.dtype, name="stem")(x)
        x = BatchNorm(momentum=self.bn_momentum, epsilon=self.bn_epsilon,
                      dtype=self.dtype, name="stem_bn")(
                          x, use_running_average=not train)
        x = jax.nn.relu(x)
        x = nn.max_pool(x, (3, 3), (2, 2), padding="SAME")

        outputs = {}
        filters = (64, 128, 256, 512)
        strides = (1, 2, 2, 2)
        for i in range(4):
            x = BlockGroup(
                filters=filters[i], block_type=block_type, blocks=layers[i],
                strides=strides[i], bn_momentum=self.bn_momentum,
                bn_epsilon=self.bn_epsilon, dtype=self.dtype,
                remat=self.remat, name=f"group{i + 1}")(x, train)
            outputs[str(i + 2)] = x
        return outputs
