"""Multi-Level Attention Fusion necks (Flax Linen).

Capability parity with reference
retinanet/model/neck/multi_level_attention_fusion.py:107-175 and
stacked_multi_level_attention_fusion.py:9-54:

  * lateral 1x1 conv (+BN+relu) per backbone level,
  * every level resized (nearest-upsample / max-pool) to each target level,
  * sum -> global-average-pool -> projection 1x1 conv+BN+relu ->
    attention 1x1 conv -> softmax over levels (per-channel when
    `use_channel_attention`) -> attention-weighted sum,
  * extra pyramid levels via stride-2 3x3 convs; per-level output BN.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from retinanet_tpu.models.layers import (
    BatchNorm, Conv2D, max_pool, nearest_upsample)

Dtype = Any


class MultiLevelAttentionFusion(nn.Module):
    filters: int = 256
    projection_dim: int = 64
    min_level: int = 3
    max_level: int = 7
    backbone_max_level: int = 5
    use_lateral_conv: bool = True
    use_channel_attention: bool = True
    use_bias_before_bn: bool = False
    separable_conv: bool = False
    bn_momentum: float = 0.99
    bn_epsilon: float = 1e-3
    activation: Callable = nn.relu  # unused; reference hardcodes relu here
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, features: Dict[str, jnp.ndarray],
                 train: bool = False) -> Dict[str, jnp.ndarray]:
        bn = partial(BatchNorm, momentum=self.bn_momentum,
                     epsilon=self.bn_epsilon, dtype=self.dtype)
        conv = partial(Conv2D, separable=self.separable_conv,
                       dtype=self.dtype)
        num_features = self.backbone_max_level - self.min_level + 1

        intermediate = {}
        for level in range(self.min_level, self.backbone_max_level + 1):
            key = str(level)
            x = features[key]
            if self.use_lateral_conv:
                x = conv(filters=self.filters, kernel_size=1,
                         use_bias=self.use_bias_before_bn,
                         name=f"l{key}_conv")(x)
            x = bn(name=f"l{key}_intermediate_bn")(
                x, use_running_average=not train)
            intermediate[key] = jax.nn.relu(x)

        outputs = {}
        for current in range(self.min_level, self.backbone_max_level + 1):
            ckey = str(current)
            fused = []
            for level in range(self.min_level, self.backbone_max_level + 1):
                x = intermediate[str(level)]
                if level > current:
                    x = nearest_upsample(x, 2 ** (level - current))
                elif level < current:
                    f = 2 ** (current - level)
                    x = max_pool(x, f, f, padding="VALID")
                fused.append(x)

            summed = sum(fused)                                # (B,H,W,C)
            stacked = jnp.stack(fused)                         # (L,B,H,W,C)

            g = jnp.mean(summed, axis=(1, 2), keepdims=True)   # (B,1,1,C)
            g = conv(filters=self.projection_dim, kernel_size=1,
                     use_bias=self.use_bias_before_bn,
                     name=f"l{ckey}_projection_conv")(g)
            g = bn(name=f"l{ckey}_projection_bn")(
                g, use_running_average=not train)
            g = jax.nn.relu(g)

            att_ch = self.filters if self.use_channel_attention else 1
            att = conv(filters=num_features * att_ch, kernel_size=1,
                       name=f"l{ckey}_attention_conv")(g)     # (B,1,1,L*att)
            att = jnp.stack(jnp.split(att, num_features, axis=3))  # (L,B,1,1,att)
            att = jax.nn.softmax(att, axis=0)

            outputs[ckey] = jnp.sum(stacked * att, axis=0)

        for level in range(self.min_level, self.max_level + 1):
            key = str(level)
            stride = 2 if level > self.backbone_max_level else 1
            out_conv = conv(filters=self.filters, kernel_size=3,
                            strides=stride, use_bias=self.use_bias_before_bn,
                            name=f"p{key}_conv")
            if level <= self.backbone_max_level:
                outputs[key] = out_conv(outputs[key])
            elif level == self.backbone_max_level + 1:
                outputs[key] = out_conv(outputs[str(level - 1)])
            else:
                outputs[key] = out_conv(jax.nn.relu(outputs[str(level - 1)]))

        for level in range(self.min_level, self.max_level + 1):
            key = str(level)
            outputs[key] = bn(name=f"p{key}_bn")(
                outputs[key], use_running_average=not train)
        return outputs


class StackedMultiLevelAttentionFusion(nn.Module):
    """`num_repeats` MLAF blocks; lateral conv only in the first, full
    max_level only in the last (reference
    stacked_multi_level_attention_fusion.py:9-54)."""
    filters: int = 256
    projection_dim: int = 64
    num_repeats: int = 2
    min_level: int = 3
    max_level: int = 7
    backbone_max_level: int = 5
    use_channel_attention: bool = True
    use_bias_before_bn: bool = False
    separable_conv: bool = False
    bn_momentum: float = 0.99
    bn_epsilon: float = 1e-3
    activation: Callable = nn.relu
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, features: Dict[str, jnp.ndarray],
                 train: bool = False) -> Dict[str, jnp.ndarray]:
        outputs = features
        for i in range(self.num_repeats):
            block_max = (self.max_level if i == self.num_repeats - 1
                         else self.backbone_max_level)
            outputs = MultiLevelAttentionFusion(
                filters=self.filters,
                projection_dim=self.projection_dim,
                min_level=self.min_level,
                max_level=block_max,
                backbone_max_level=self.backbone_max_level,
                use_lateral_conv=(i == 0),
                use_channel_attention=self.use_channel_attention,
                use_bias_before_bn=self.use_bias_before_bn,
                separable_conv=self.separable_conv,
                bn_momentum=self.bn_momentum,
                bn_epsilon=self.bn_epsilon,
                dtype=self.dtype,
                name=f"mlaf_{i + 1}")(outputs, train=train)
        return outputs
