"""RetinaNet model assembly (Flax Linen) + builder from config.

Capability parity with reference retinanet/model/builder.py:36-119:
backbone -> neck -> (optional BalanceFeatures) -> box/class heads
(+ optional auxiliary IoU head). Outputs a dict:
  {'class-predictions': {lvl: (B,H,W,A*K)},
   'box-predictions':   {lvl: (B,H,W,A*4)},
   ['iou-predictions':  {lvl: (B,H,W,A)}]}

Freeze patterns (reference builder.py FREEZE_VARS_REGEX:19-30) are
re-expressed over the Flax param tree path in `FREEZE_VARS_REGEX` and
consumed by the optimizer builder.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Dict, Optional

import jax.numpy as jnp
from flax import linen as nn

from retinanet_tpu.models import mobiledet as mobiledet_lib
from retinanet_tpu.models import efficientnet as efficientnet_lib
from retinanet_tpu.models.fpn import FPN, FPNP5
from retinanet_tpu.models.heads import (build_auxillary_head,
                                        build_detection_heads)
from retinanet_tpu.models.layers import BalanceFeatures, get_activation
from retinanet_tpu.models.mlaf import (MultiLevelAttentionFusion,
                                       StackedMultiLevelAttentionFusion)
from retinanet_tpu.models.resnet import ResNet

Dtype = Any

# Param-tree path regexes for layer freezing; same keys as the reference
# (reference model/builder.py:19-30). Paths look like
# 'backbone/group1/block0/conv1/conv/kernel'.
FREEZE_VARS_REGEX = {
    "backbone": re.compile(r"^backbone/"),
    "backbone-bn": re.compile(r"^backbone/.*bn"),
    "fpn": re.compile(r"^neck/"),
    "fpn-bn": re.compile(r"^neck/.*bn"),
    "head": re.compile(r"^(box_head|class_head)/(?!.*prediction)"),
    "head-bn": re.compile(r"^(box_head|class_head)/.*bn"),
    "bn": re.compile(r".*bn"),
    "resnet_initial": re.compile(r"^backbone/(stem|stem_bn)/"),
}


class RetinaNet(nn.Module):
    """Full detector. `train=True` updates batch stats."""
    backbone: nn.Module
    neck: nn.Module
    box_head: nn.Module
    class_head: nn.Module
    auxillary_head: Optional[nn.Module] = None
    balance_features: Optional[nn.Module] = None

    def __call__(self, images: jnp.ndarray,
                 train: bool = False) -> Dict[str, Dict[str, jnp.ndarray]]:
        features = self.backbone(images, train=train)
        features = self.neck(features, train=train)
        if self.balance_features is not None:
            features = self.balance_features(features)
        outputs = {
            "box-predictions": self.box_head(features, train=train),
            "class-predictions": self.class_head(features, train=train),
        }
        if self.auxillary_head is not None:
            outputs["iou-predictions"] = self.auxillary_head(
                features, train=train)
        return outputs


def _compute_dtype(precision: str):
    if precision == "mixed_float16":
        # The reference trains fp16 with DYNAMIC LOSS SCALING (reference
        # optimizers/builder.py:61-65, __main__.py:75-80) because fp16's
        # 5-bit exponent underflows small gradients. TPUs have no fp16
        # compute path; bf16 keeps fp32's 8-bit exponent range, so the
        # substitution needs no loss scaling and is numerically SAFER —
        # but it IS a substitution, so say so loudly rather than
        # silently rewriting the knob (docs/configuration.md, "precision").
        import logging
        logging.getLogger(__name__).warning(
            "floatx.precision='mixed_float16' requested: TPUs have no fp16 "
            "compute path; substituting bfloat16 (same memory footprint, "
            "wider exponent, no loss scaling needed). The reference's "
            "dynamic loss scaling has intentionally no counterpart here. "
            "Set floatx.precision='mixed_bfloat16' to silence this warning.")
    return {
        "float32": jnp.float32,
        "mixed_bfloat16": jnp.bfloat16,
        "mixed_float16": jnp.bfloat16,
    }[precision]


def build_backbone(params, bn, dtype) -> nn.Module:
    """Dispatch on architecture.backbone.type
    (reference model/backbone/builder.py:7-33)."""
    kind = params.backbone.type
    common = dict(bn_momentum=bn.momentum, bn_epsilon=bn.epsilon, dtype=dtype)
    remat = bool(params.backbone.get("remat", False))
    if kind == "resnet":
        return ResNet(depth=int(params.backbone.depth), remat=remat,
                      name="backbone", **common)
    if remat:
        raise ValueError(
            "backbone.remat is currently supported for resnet backbones "
            f"only (got type={kind!r}); refusing to silently ignore a "
            "memory policy")
    if kind.startswith("efficientnet"):
        return efficientnet_lib.EfficientNet.from_name(
            kind, name="backbone",
            override_params=dict(params.backbone.get("override_params", {})),
            **common)
    if kind.startswith("mobiledet"):
        return mobiledet_lib.MobileDet(
            variant=kind,
            multiplier=float(params.backbone.get("multiplier", 1.0)),
            name="backbone", **common)
    raise ValueError(f"Unsupported backbone type: {kind}")


def build_neck(params, conv_2d, bn, activation, dtype) -> nn.Module:
    """Dispatch on feature_fusion.type (reference model/neck/builder.py:8-56)."""
    ff = params.feature_fusion
    kind = ff.type
    common = dict(
        filters=int(ff.filters),
        min_level=int(ff.min_level),
        max_level=int(ff.max_level),
        backbone_max_level=int(ff.backbone_max_level),
        separable_conv=bool(conv_2d.use_seperable_conv),
        bn_momentum=bn.momentum, bn_epsilon=bn.epsilon,
        activation=activation, dtype=dtype, name="neck")
    # conv_2d.use_bias_before_bn is consumed by MLAF / stacked-MLAF /
    # FPN-P5 exactly as in the reference (multi_level_attention_fusion.py:71,
    # fpn_p5.py:82); the default FPN never reads it (reference fpn.py has no
    # use_bias argument anywhere).
    bias_before_bn = bool(conv_2d.get("use_bias_before_bn", False))
    if kind == "fpn":
        return FPN(fusion_mode=ff.get("fusion_mode", "sum"), **common)
    if kind == "fpn_p5":
        return FPNP5(fusion_mode=ff.get("fusion_mode", "sum"),
                     use_bias_before_bn=bias_before_bn, **common)
    if kind == "multi_level_attention":
        return MultiLevelAttentionFusion(
            use_channel_attention=bool(ff.get("use_channel_attention", False)),
            use_bias_before_bn=bias_before_bn,
            **common)
    if kind == "stacked_multi_level_attention":
        return StackedMultiLevelAttentionFusion(
            num_repeats=int(ff.get("num_repeats", 2)),
            use_channel_attention=bool(ff.get("use_channel_attention", False)),
            use_bias_before_bn=bias_before_bn,
            **common)
    raise ValueError(f"Unsupported neck type: {kind}")


def build_model(params) -> RetinaNet:
    """Assemble the detector from a validated config tree."""
    arch = params.architecture
    dtype = _compute_dtype(params.floatx.precision)
    activation = get_activation(arch.activation.type)
    bn = arch.batch_norm
    if not bn.get("use_sync", True):
        import jax
        if jax.device_count() > 1:
            # Under GSPMD data parallelism the batch is sharded over devices
            # and XLA computes BN moments over the GLOBAL batch — sync-BN by
            # construction. Local-moment BN would require wrapping the model
            # in shard_map; no shipped config asks for it (all 15 reference
            # configs set use_sync:true, and the reference itself fell back
            # to plain BN only for single-replica runs —
            # reference model/utils.py:7-22). Fail loudly rather than
            # silently computing sync moments.
            raise ValueError(
                "batch_norm.use_sync=false is unsupported on multi-device "
                "meshes (GSPMD BN moments are global); run single-device "
                "or set use_sync=true")

    backbone = build_backbone(arch, bn, dtype)
    neck = build_neck(arch, arch.conv_2d, bn, activation, dtype)
    box_head, class_head = build_detection_heads(
        arch.head,
        min_level=int(arch.feature_fusion.min_level),
        max_level=int(arch.feature_fusion.max_level),
        separable_conv=bool(arch.conv_2d.use_seperable_conv),
        bn_momentum=bn.momentum, bn_epsilon=bn.epsilon,
        activation=activation, dtype=dtype)

    aux_head = None
    if arch.auxillary_head.use_auxillary_head:
        aux_head = build_auxillary_head(
            arch.auxillary_head,
            num_anchors=int(arch.head.num_anchors),
            min_level=int(arch.feature_fusion.min_level),
            max_level=int(arch.feature_fusion.max_level),
            separable_conv=bool(arch.conv_2d.use_seperable_conv),
            bn_momentum=bn.momentum, bn_epsilon=bn.epsilon,
            activation=activation, dtype=dtype)

    balance = None
    if arch.feature_fusion.use_balanced_features:
        balance = BalanceFeatures(
            min_level=int(arch.feature_fusion.min_level),
            max_level=int(arch.feature_fusion.max_level),
            intermediate_level=int(arch.feature_fusion.min_level) + 1,
            dtype=dtype, name="balance_features")

    return RetinaNet(
        backbone=backbone, neck=neck, box_head=box_head,
        class_head=class_head, auxillary_head=aux_head,
        balance_features=balance)
