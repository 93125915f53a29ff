"""Detection heads (Flax Linen).

Capability parity with reference retinanet/model/head/detection_head.py and
head/builder.py:

  * `num_convs` 3x3 convs with weights SHARED across pyramid levels but
    per-level BatchNorm (ref detection_head.py:68-74, 97-101),
  * RandomNormal(stddev=0.01) kernel init for plain convs, VarianceScaling
    for separable (ref:38-49),
  * prediction conv runs in fp32 regardless of the compute dtype
    (ref:80-88 — keeps logits numerically stable under mixed bf16),
  * class head bias prior -log((1-0.01)/0.01), box head zeros, auxiliary
    IoU head prior 0.5 (ref head/builder.py:7-72).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Callable, Dict, Optional

import jax.numpy as jnp
from flax import linen as nn

from retinanet_tpu.models.layers import BatchNorm, Conv2D

Dtype = Any


def _constant_init(value: float):
    def init(key, shape, dtype=jnp.float32):
        return jnp.full(shape, value, dtype)
    return init


class DetectionHead(nn.Module):
    num_convs: int = 4
    filters: int = 256
    output_filters: int = 36
    min_level: int = 3
    max_level: int = 7
    prediction_bias_prior: Optional[float] = None  # None -> zeros
    separable_conv: bool = False
    bn_momentum: float = 0.99
    bn_epsilon: float = 1e-3
    activation: Callable = nn.relu
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, features: Dict[str, jnp.ndarray],
                 train: bool = False) -> Dict[str, jnp.ndarray]:
        if self.separable_conv:
            kernel_init = nn.initializers.variance_scaling(
                1.0, "fan_in", "truncated_normal")
        else:
            kernel_init = nn.initializers.normal(stddev=0.01)

        convs = [
            Conv2D(filters=self.filters, kernel_size=3,
                   separable=self.separable_conv, kernel_init=kernel_init,
                   dtype=self.dtype, name=f"conv{i}")
            for i in range(self.num_convs)
        ]
        norms = {
            (i, str(level)): BatchNorm(
                momentum=self.bn_momentum, epsilon=self.bn_epsilon,
                dtype=self.dtype, name=f"conv{i}_p{level}_bn")
            for i in range(self.num_convs)
            for level in range(self.min_level, self.max_level + 1)
        }
        bias_init = (nn.initializers.zeros
                     if self.prediction_bias_prior is None else
                     _constant_init(
                         -math.log((1.0 - self.prediction_bias_prior)
                                   / self.prediction_bias_prior)))
        # Prediction conv in fp32 (reference detection_head.py:80-88).
        prediction = Conv2D(
            filters=self.output_filters, kernel_size=3,
            separable=self.separable_conv, kernel_init=kernel_init,
            bias_init=bias_init, dtype=jnp.float32, name="prediction")

        outputs = {}
        for level in range(self.min_level, self.max_level + 1):
            key = str(level)
            x = features[key]
            for i in range(self.num_convs):
                x = convs[i](x)
                x = norms[(i, key)](x, use_running_average=not train)
                x = self.activation(x)
            outputs[key] = prediction(x.astype(jnp.float32))
        return outputs


def build_detection_heads(head_params, min_level: int, max_level: int,
                          separable_conv: bool, bn_momentum: float,
                          bn_epsilon: float, activation: Callable,
                          dtype: Dtype):
    """(box_head, class_head) — reference head/builder.py:7-43."""
    common = dict(
        num_convs=int(head_params.num_convs),
        filters=int(head_params.filters),
        min_level=min_level, max_level=max_level,
        separable_conv=separable_conv,
        bn_momentum=bn_momentum, bn_epsilon=bn_epsilon,
        activation=activation, dtype=dtype)
    box_head = DetectionHead(
        output_filters=int(head_params.num_anchors) * 4,
        prediction_bias_prior=None, name="box_head", **common)
    class_head = DetectionHead(
        output_filters=(int(head_params.num_anchors)
                        * int(head_params.num_classes)),
        prediction_bias_prior=0.01, name="class_head", **common)
    return box_head, class_head


def build_auxillary_head(aux_params, num_anchors: int, min_level: int,
                         max_level: int, separable_conv: bool,
                         bn_momentum: float, bn_epsilon: float,
                         activation: Callable, dtype: Dtype):
    """IoU-prediction head with 0.5 prior (reference head/builder.py:46-72)."""
    return DetectionHead(
        num_convs=int(aux_params.num_convs),
        filters=int(aux_params.filters),
        output_filters=num_anchors,
        min_level=min_level, max_level=max_level,
        prediction_bias_prior=0.5,
        separable_conv=separable_conv,
        bn_momentum=bn_momentum, bn_epsilon=bn_epsilon,
        activation=activation, dtype=dtype, name="auxillary_head")
