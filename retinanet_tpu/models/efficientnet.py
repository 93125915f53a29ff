"""EfficientNet backbones (Flax Linen).

Capability parity with reference retinanet/model/backbone/efficientnet.py:
  * block-string specs ('r1_k3_s11_e1_i32_o16_se0.25', BlockDecoder
    ref:858-934), b0-l2 + lite0-lite4 coefficient tables (ref:47-73),
  * width/depth rounding with depth_divisor=8 and the 10%-round-down guard
    (round_filters/round_repeats, ref:196-219),
  * MBConv (expand 1x1 -> depthwise kxk -> SE -> project 1x1) with id-skip
    and stochastic-depth drop-connect scaled linearly by block index
    (ref:222-480), fused-conv variant (ref:357-366), conv_type=1
    no-depthwise variant (ref:484-565),
  * lite variants: relu6, no SE, unscaled stem/head (fix_head_stem)
    (ref efficientnet_lite:961-985),
  * conv kernel init = Normal(stddev=sqrt(2/fan_out)) (ref:117-140),
  * emits {'2': reduction_2, ..., '5': reduction_5} (ref wrapper:1019-1049).

Not carried over: the super-pixel (space-to-depth) block variant — no
shipped spec or config uses it (all default block strings have p=0); the
decoder rejects p!=0 explicitly. Drop-connect engages only when a
'dropout' PRNG stream is supplied to apply().
"""

from __future__ import annotations

import math
import re
from typing import Any, Dict, List, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from retinanet_tpu.models.layers import BatchNorm

Dtype = Any


class BlockArgs(NamedTuple):
    kernel_size: int
    num_repeat: int
    input_filters: int
    output_filters: int
    expand_ratio: int
    id_skip: bool
    strides: int
    se_ratio: Optional[float]
    conv_type: int
    fused_conv: bool


DEFAULT_BLOCKS = (
    "r1_k3_s11_e1_i32_o16_se0.25",
    "r2_k3_s22_e6_i16_o24_se0.25",
    "r2_k5_s22_e6_i24_o40_se0.25",
    "r3_k3_s22_e6_i40_o80_se0.25",
    "r3_k5_s11_e6_i80_o112_se0.25",
    "r4_k5_s22_e6_i112_o192_se0.25",
    "r1_k3_s11_e6_i192_o320_se0.25",
)

# (width_coefficient, depth_coefficient, resolution, dropout_rate)
PARAMS_B = {
    "efficientnet-b0": (1.0, 1.0, 224, 0.2),
    "efficientnet-b1": (1.0, 1.1, 240, 0.2),
    "efficientnet-b2": (1.1, 1.2, 260, 0.3),
    "efficientnet-b3": (1.2, 1.4, 300, 0.3),
    "efficientnet-b4": (1.4, 1.8, 380, 0.4),
    "efficientnet-b5": (1.6, 2.2, 456, 0.4),
    "efficientnet-b6": (1.8, 2.6, 528, 0.5),
    "efficientnet-b7": (2.0, 3.1, 600, 0.5),
    "efficientnet-b8": (2.2, 3.6, 672, 0.5),
    "efficientnet-l2": (4.3, 5.3, 800, 0.5),
}
PARAMS_LITE = {
    "efficientnet-lite0": (1.0, 1.0, 224, 0.2),
    "efficientnet-lite1": (1.0, 1.1, 240, 0.2),
    "efficientnet-lite2": (1.1, 1.2, 260, 0.3),
    "efficientnet-lite3": (1.2, 1.4, 280, 0.3),
    "efficientnet-lite4": (1.4, 1.8, 300, 0.3),
}


def decode_block_string(block_string: str) -> BlockArgs:
    """reference BlockDecoder._decode_block_string (ref:860-889)."""
    options = {}
    for op in block_string.split("_"):
        splits = re.split(r"(\d.*)", op)
        if len(splits) >= 2:
            options[splits[0]] = splits[1]
    if "s" not in options or len(options["s"]) != 2:
        raise ValueError("Strides options should be a pair of integers.")
    if options["s"][0] != options["s"][1]:
        raise ValueError("Only square strides are supported.")
    if int(options.get("p", 0)) != 0:
        raise NotImplementedError(
            "super_pixel blocks are not supported (unused by every shipped "
            "spec in the reference)")
    if "cc" in block_string:
        raise NotImplementedError("condconv is not supported (reference "
                                  "raises too, ref:330-331)")
    return BlockArgs(
        kernel_size=int(options["k"]),
        num_repeat=int(options["r"]),
        input_filters=int(options["i"]),
        output_filters=int(options["o"]),
        expand_ratio=int(options["e"]),
        id_skip="noskip" not in block_string,
        strides=int(options["s"][0]),
        se_ratio=float(options["se"]) if "se" in options else None,
        conv_type=int(options.get("c", 0)),
        fused_conv=bool(int(options.get("f", 0))),
    )


def round_filters(filters: int, width_coefficient: Optional[float],
                  depth_divisor: int = 8, skip: bool = False) -> int:
    """ref:196-211."""
    if skip or not width_coefficient:
        return int(filters)
    filters *= width_coefficient
    new_filters = max(depth_divisor,
                      int(filters + depth_divisor / 2)
                      // depth_divisor * depth_divisor)
    if new_filters < 0.9 * filters:
        new_filters += depth_divisor
    return int(new_filters)


def round_repeats(repeats: int, depth_coefficient: Optional[float],
                  skip: bool = False) -> int:
    if skip or not depth_coefficient:
        return int(repeats)
    return int(math.ceil(depth_coefficient * repeats))


def _conv_init(key, shape, dtype=jnp.float32):
    """Normal(stddev=sqrt(2/fan_out)) over spatial*out (ref:117-140)."""
    kh, kw, _, out = shape
    fan_out = kh * kw * out
    return jax.random.normal(key, shape, dtype) * math.sqrt(2.0 / fan_out)


def _dw_init(key, shape, dtype=jnp.float32):
    # depthwise kernels use fan_out = kh*kw*channel_multiplier per TF
    kh, kw, _, out = shape
    return jax.random.normal(key, shape, dtype) * math.sqrt(
        2.0 / (kh * kw * out))


def _drop_connect(x: jnp.ndarray, rng, survival_prob: float) -> jnp.ndarray:
    """Stochastic depth (ref drop_connect:100-115)."""
    batch = x.shape[0]
    random_tensor = survival_prob + jax.random.uniform(
        rng, (batch, 1, 1, 1), x.dtype)
    binary = jnp.floor(random_tensor)
    return x / survival_prob * binary


class SqueezeExcite(nn.Module):
    """ref SE:224-268."""
    se_filters: int
    output_filters: int
    act: Any
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        se = jnp.mean(x, axis=(1, 2), keepdims=True)
        se = nn.Conv(self.se_filters, (1, 1), use_bias=True,
                     kernel_init=_conv_init, dtype=self.dtype,
                     param_dtype=jnp.float32, name="reduce")(se)
        se = self.act(se)
        se = nn.Conv(self.output_filters, (1, 1), use_bias=True,
                     kernel_init=_conv_init, dtype=self.dtype,
                     param_dtype=jnp.float32, name="expand")(se)
        return jax.nn.sigmoid(se) * x


class MBConvBlock(nn.Module):
    args: BlockArgs
    use_se: bool
    act: Any
    bn_momentum: float
    bn_epsilon: float
    survival_prob: Optional[float] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        a = self.args
        bn = lambda name: BatchNorm(  # noqa: E731
            momentum=self.bn_momentum, epsilon=self.bn_epsilon,
            dtype=self.dtype, name=name)
        inputs = x
        filters = a.input_filters * a.expand_ratio
        s = (a.strides, a.strides)
        k = (a.kernel_size, a.kernel_size)

        if a.conv_type == 1:
            # MBConvBlockWithoutDepthwise (ref:484-565)
            if a.expand_ratio != 1:
                x = nn.Conv(filters, k, use_bias=False,
                            kernel_init=_conv_init, dtype=self.dtype,
                            param_dtype=jnp.float32, name="expand_conv")(x)
                x = self.act(bn("bn0")(x, use_running_average=not train))
            x = nn.Conv(a.output_filters, (1, 1), strides=s, use_bias=False,
                        kernel_init=_conv_init, dtype=self.dtype,
                        param_dtype=jnp.float32, name="project_conv")(x)
            x = bn("bn1")(x, use_running_average=not train)
        else:
            if a.fused_conv:
                x = nn.Conv(filters, k, strides=s, use_bias=False,
                            kernel_init=_conv_init, dtype=self.dtype,
                            param_dtype=jnp.float32, name="fused_conv")(x)
                x = self.act(bn("bn1")(x, use_running_average=not train))
            else:
                if a.expand_ratio != 1:
                    x = nn.Conv(filters, (1, 1), use_bias=False,
                                kernel_init=_conv_init, dtype=self.dtype,
                                param_dtype=jnp.float32,
                                name="expand_conv")(x)
                    x = self.act(bn("bn0")(x, use_running_average=not train))
                # channel count from the actual input: with expand_ratio==1
                # and fix_head_stem the stem width can differ from the
                # stage's declared input_filters (TF's DepthwiseConv2D
                # infers this too)
                dw_ch = x.shape[-1]
                x = nn.Conv(dw_ch, k, strides=s,
                            feature_group_count=dw_ch, use_bias=False,
                            kernel_init=_dw_init, dtype=self.dtype,
                            param_dtype=jnp.float32,
                            name="depthwise_conv")(x)
                x = self.act(bn("bn1")(x, use_running_average=not train))

            if self.use_se and a.se_ratio and 0 < a.se_ratio <= 1:
                se_filters = max(1, int(a.input_filters * a.se_ratio))
                x = SqueezeExcite(se_filters, x.shape[-1], self.act,
                                  dtype=self.dtype, name="se")(x)

            x = nn.Conv(a.output_filters, (1, 1), use_bias=False,
                        kernel_init=_conv_init, dtype=self.dtype,
                        param_dtype=jnp.float32, name="project_conv")(x)
            x = bn("bn2")(x, use_running_average=not train)

        if a.id_skip and a.strides == 1 \
                and a.input_filters == a.output_filters:
            if (train and self.survival_prob
                    and self.has_rng("dropout")):
                x = _drop_connect(x, self.make_rng("dropout"),
                                  self.survival_prob)
            x = x + inputs
        return x


class EfficientNet(nn.Module):
    """Backbone emitting {'2'..'5'} = reduction_2..reduction_5."""
    width_coefficient: float = 1.0
    depth_coefficient: float = 1.0
    blocks: Sequence[str] = DEFAULT_BLOCKS
    use_se: bool = True
    fix_head_stem: bool = False
    activation: str = "swish"   # 'relu6' for lite
    survival_prob: float = 0.8
    bn_momentum: float = 0.99
    bn_epsilon: float = 1e-3
    dtype: Dtype = jnp.float32

    @classmethod
    def from_name(cls, model_name: str, bn_momentum: float = 0.99,
                  bn_epsilon: float = 1e-3, dtype: Dtype = jnp.float32,
                  name: Optional[str] = None,
                  override_params: Optional[Dict] = None) -> "EfficientNet":
        override_params = dict(override_params or {})
        if model_name in PARAMS_B:
            w, d, _, _ = PARAMS_B[model_name]
            cfg = dict(width_coefficient=w, depth_coefficient=d,
                       use_se=True, fix_head_stem=False, activation="swish")
        elif model_name in PARAMS_LITE:
            w, d, _, _ = PARAMS_LITE[model_name]
            cfg = dict(width_coefficient=w, depth_coefficient=d,
                       use_se=False, fix_head_stem=True, activation="relu6")
        else:
            raise ValueError(f"Unknown EfficientNet variant: {model_name}")
        cfg.update(override_params)
        return cls(bn_momentum=bn_momentum, bn_epsilon=bn_epsilon,
                   dtype=dtype, name=name, **cfg)

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        act = {"swish": jax.nn.swish, "relu6": jax.nn.relu6,
               "relu": jax.nn.relu}[self.activation]
        decoded = [decode_block_string(s) for s in self.blocks]

        # Stem (ref Stem:568-586; lite keeps 32 unscaled via fix_head_stem)
        stem_filters = round_filters(
            decoded[0].input_filters, self.width_coefficient,
            skip=self.fix_head_stem)
        x = nn.Conv(stem_filters, (3, 3), strides=(2, 2), use_bias=False,
                    kernel_init=_conv_init, dtype=self.dtype,
                    param_dtype=jnp.float32, name="stem_conv")(x)
        x = BatchNorm(momentum=self.bn_momentum, epsilon=self.bn_epsilon,
                      dtype=self.dtype, name="stem_bn")(
                          x, use_running_average=not train)
        x = act(x)

        # Expand per-stage args into the flat block list (ref _build:700-776)
        all_blocks: List[BlockArgs] = []
        n_stages = len(decoded)
        for i, args in enumerate(decoded):
            in_f = round_filters(args.input_filters, self.width_coefficient)
            out_f = round_filters(args.output_filters, self.width_coefficient)
            repeats = round_repeats(
                args.num_repeat, self.depth_coefficient,
                skip=self.fix_head_stem and (i == 0 or i == n_stages - 1))
            args = args._replace(input_filters=in_f, output_filters=out_f,
                                 num_repeat=repeats)
            all_blocks.append(args)
            for _ in range(repeats - 1):
                all_blocks.append(args._replace(
                    input_filters=out_f, strides=1))

        outputs: Dict[str, jnp.ndarray] = {}
        reduction_idx = 0
        n = len(all_blocks)
        for idx, args in enumerate(all_blocks):
            is_reduction = (idx == n - 1
                            or all_blocks[idx + 1].strides > 1)
            sp = None
            if self.survival_prob:
                drop_rate = 1.0 - self.survival_prob
                sp = 1.0 - drop_rate * float(idx) / n
            x = MBConvBlock(
                args=args, use_se=self.use_se, act=act,
                bn_momentum=self.bn_momentum, bn_epsilon=self.bn_epsilon,
                survival_prob=sp, dtype=self.dtype,
                name=f"blocks_{idx}")(x, train)
            if is_reduction:
                reduction_idx += 1
                if 2 <= reduction_idx <= 5:
                    outputs[str(reduction_idx)] = x
        return outputs
