"""Feature Pyramid Network necks (Flax Linen).

Capability parity with reference retinanet/model/neck/fpn.py +
fpn_base.py:

  * Coarse levels P6..P(max) synthesized from the backbone max level via a
    dedicated 1x1 conv+BN then a chain of stride-2 max pools
    (ref fpn_base.py:44-71). Note the coarse chain reads the *raw* backbone
    feature (through its own conv), not the lateral — matching the
    reference's call ordering (fpn.py:82-84 calls super().call first).
  * Per-level 1x1 channel-normalize conv+BN on backbone levels
    (ref fpn.py:86-92).
  * Top-down pathway: nearest-upsample + FeatureFusion (sum /
    fast_attention / fast_channel_attention) + activation (ref fpn.py:94-100).
  * Per-level 3x3 output conv+BN (ref fpn.py:102-107).
  * Separable-conv switch via conv_2d config (ref fpn_base.py:28-39).

Also provides FPNP5 (original-paper style coarse levels via stride-2 convs
from P5 — ref model/neck/fpn_p5.py).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict

import jax.numpy as jnp
from flax import linen as nn

from retinanet_tpu.models.layers import (
    BatchNorm, Conv2D, FeatureFusion, max_pool, nearest_upsample)

Dtype = Any


class FPN(nn.Module):
    filters: int = 256
    min_level: int = 3
    max_level: int = 7
    backbone_max_level: int = 5
    fusion_mode: str = "sum"
    separable_conv: bool = False
    bn_momentum: float = 0.99
    bn_epsilon: float = 1e-3
    activation: Callable = nn.relu
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, features: Dict[str, jnp.ndarray],
                 train: bool = False) -> Dict[str, jnp.ndarray]:
        bn = partial(BatchNorm, momentum=self.bn_momentum,
                     epsilon=self.bn_epsilon, dtype=self.dtype)
        conv = partial(Conv2D, separable=self.separable_conv,
                       dtype=self.dtype)
        outputs = dict(features)

        # Coarse levels from the raw backbone max level (fpn_base semantics).
        for level in range(self.backbone_max_level + 1, self.max_level + 1):
            x = outputs[str(level - 1)]
            if level == self.backbone_max_level + 1:
                x = conv(filters=self.filters, kernel_size=1,
                         name="backbone_max_level_conv")(x)
                x = bn(name="backbone_max_level_bn")(
                    x, use_running_average=not train)
            outputs[str(level)] = max_pool(x, 2, 2, padding="VALID")

        # Channel-normalize backbone laterals.
        for level in range(self.min_level, self.backbone_max_level + 1):
            key = str(level)
            x = conv(filters=self.filters, kernel_size=1,
                     name=f"p{key}_in_conv")(outputs[key])
            outputs[key] = bn(name=f"p{key}_in_bn")(
                x, use_running_average=not train)

        # Top-down pathway with fusion.
        for level in range(self.max_level, self.min_level, -1):
            low = str(level - 1)
            up = nearest_upsample(outputs[str(level)], 2)
            up = up[:, :outputs[low].shape[1], :outputs[low].shape[2], :]
            fused = FeatureFusion(
                mode=self.fusion_mode, filters=self.filters,
                dtype=self.dtype, name=f"p{low}_fusion")(outputs[low], up)
            outputs[low] = self.activation(fused)

        # Output convs.
        for level in range(self.min_level, self.max_level + 1):
            key = str(level)
            x = conv(filters=self.filters, kernel_size=3,
                     name=f"p{key}_out_conv")(outputs[key])
            outputs[key] = bn(name=f"p{key}_out_bn")(
                x, use_running_average=not train)

        return {str(l): outputs[str(l)]
                for l in range(self.min_level, self.max_level + 1)}


class FPNP5(nn.Module):
    """Original-paper FPN: lateral 1x1 convs, top-down FeatureFusion
    merges, P6/P7 via stride-2 3x3 convs chained from P5, and a per-level
    output BN on every level (reference model/neck/fpn_p5.py:10-126;
    output convs consume conv_2d.use_bias_before_bn at fpn_p5.py:82,
    output norms applied at fpn_p5.py:121-125)."""
    filters: int = 256
    min_level: int = 3
    max_level: int = 7
    backbone_max_level: int = 5
    fusion_mode: str = "sum"
    use_bias_before_bn: bool = False
    separable_conv: bool = False
    bn_momentum: float = 0.99
    bn_epsilon: float = 1e-3
    activation: Callable = nn.relu
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, features: Dict[str, jnp.ndarray],
                 train: bool = False) -> Dict[str, jnp.ndarray]:
        bn = partial(BatchNorm, momentum=self.bn_momentum,
                     epsilon=self.bn_epsilon, dtype=self.dtype)
        conv = partial(Conv2D, separable=self.separable_conv,
                       dtype=self.dtype)
        laterals = {}
        for level in range(self.min_level, self.backbone_max_level + 1):
            key = str(level)
            laterals[key] = conv(filters=self.filters, kernel_size=1,
                                 name=f"l{key}_conv")(features[key])
        for level in range(self.backbone_max_level, self.min_level, -1):
            low = str(level - 1)
            up = nearest_upsample(laterals[str(level)], 2)
            up = up[:, :laterals[low].shape[1], :laterals[low].shape[2], :]
            laterals[low] = FeatureFusion(
                mode=self.fusion_mode, filters=self.filters,
                dtype=self.dtype, name=f"m{level}_fusion")(laterals[low], up)

        outputs = {}
        for level in range(self.min_level, self.backbone_max_level + 1):
            key = str(level)
            outputs[key] = conv(filters=self.filters, kernel_size=3,
                                use_bias=self.use_bias_before_bn,
                                name=f"p{key}_out_conv")(laterals[key])

        # Coarse chain: P6 from the P5 *output* (pre-BN), deeper levels
        # through an activation first (fpn_p5.py:110-119).
        for level in range(self.backbone_max_level + 1, self.max_level + 1):
            key = str(level)
            prev = outputs[str(level - 1)]
            if level > self.backbone_max_level + 1:
                prev = self.activation(prev)
            outputs[key] = conv(filters=self.filters, kernel_size=3,
                                strides=2, use_bias=self.use_bias_before_bn,
                                name=f"p{key}_out_conv")(prev)

        for level in range(self.min_level, self.max_level + 1):
            key = str(level)
            outputs[key] = bn(name=f"p{key}_out_bn")(
                outputs[key], use_running_average=not train)
        return outputs
