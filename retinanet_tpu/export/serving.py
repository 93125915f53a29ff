"""Model export + serving artifacts.

Replaces the reference's SavedModel / ONNX / TensorRT export stack
(reference retinanet/export.py:108-347, onnx_utils.py, tensorrt/*) with the
TPU-native equivalents:

  * artifact directory: config.json + params.msgpack (flax serialization of
    {params, batch_stats}) + optional EMA weights — the analog of
    `save_weights` + frozen SavedModel variables;
  * AOT-serialized StableHLO of the full serving function via `jax.export`
    (`serving_default.stablehlo`, fixed inference batch size — the analog
    of the frozen `serving_default` signature, reference export.py:229-268);
    the serialized artifact is portable across processes and survives
    without Python model code;
  * serving modes mirror ModelBuilder.prepare_model_for_export
    (reference model/builder.py:121-151): 'tf'-equivalent full pipeline,
    and the skip-decode / skip-NMS variants used for external-NMS
    deployments;
  * `load_artifact` reconstructs a jittable serving function either from
    the StableHLO blob (exact frozen graph) or by rebuilding from config +
    weights (flexible batch).

Quantized (int8) serving is provided by export/quantize.py (PTQ, replacing
the TensorRT INT8 calibrators).
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

import flax.serialization

from retinanet_tpu.core.config import ConfigDict, from_dict
from retinanet_tpu.data import anchors as anchor_lib
from retinanet_tpu.data.preprocessing import (HostPreprocessor,
                                              make_device_normalizer)
from retinanet_tpu.models.retinanet import build_model, _compute_dtype
from retinanet_tpu.ops.postprocess import make_inference_fn

EXPORT_MODES = ("tf", "tf_tensorrt", "onnx", "onnx_tensorrt")
_WEIGHTS_FILE = "params.msgpack"
_CONFIG_FILE = "config.json"
_STABLEHLO_FILE = "serving_default.stablehlo"
_STABLEHLO_INT8_FILE = "serving_int8.stablehlo"


def _mode_flags(mode: str) -> Tuple[bool, bool]:
    """(skip_decoding, skip_nms) per reference model/builder.py:121-151:
    'tf' keeps everything; 'tf_tensorrt' skips NMS (TRT plugin did it);
    'onnx'/'onnx_tensorrt' skip decode+topk+NMS (EfficientNMS_TRT did it).
    """
    if mode == "tf":
        return False, False
    if mode == "tf_tensorrt":
        return False, True
    if mode in ("onnx", "onnx_tensorrt"):
        return True, True
    raise ValueError(f"mode must be one of {EXPORT_MODES}")


def build_serving_fn(params: ConfigDict,
                     mode: str = "tf",
                     int8_scales: Optional[Dict[str, float]] = None
                     ) -> Callable:
    """Serving function (model_params, batch_stats, images) -> detections.

    `int8_scales` (activation-scale dict from calibrate_activations /
    the artifact's activation_scales.json) switches the model to the
    int8-activation compute path — the fastest serving lane on TPU
    (~400 vs ~345 FPS bs8 at 640x640; see bench.py)."""
    skip_decoding, skip_nms = _mode_flags(mode)
    model = build_model(params)
    if int8_scales:
        from retinanet_tpu.export.quantize import Int8Model
        model = Int8Model(model, int8_scales)
    anchors = anchor_lib.from_params(params)
    normalizer = make_device_normalizer(params)
    return make_inference_fn(
        model, params, anchors, normalizer,
        compute_dtype=_compute_dtype(params.floatx.precision),
        skip_decoding=skip_decoding, skip_nms=skip_nms)


def export_artifact(params: ConfigDict,
                    model_params,
                    batch_stats,
                    output_dir: str,
                    mode: str = "tf",
                    serialize_stablehlo: bool = True) -> Dict[str, str]:
    """Write a serving artifact directory. Returns {artifact: path}."""
    os.makedirs(output_dir, exist_ok=True)
    written = {}

    with open(os.path.join(output_dir, _CONFIG_FILE), "w") as f:
        json.dump(params.to_dict(), f, indent=2)
    written["config"] = os.path.join(output_dir, _CONFIG_FILE)

    state = {
        "params": jax.device_get(model_params),
        "batch_stats": jax.device_get(batch_stats),
    }
    weights_path = os.path.join(output_dir, _WEIGHTS_FILE)
    with open(weights_path, "wb") as f:
        f.write(flax.serialization.to_bytes(state))
    written["weights"] = weights_path

    if serialize_stablehlo:
        written["stablehlo"] = serialize_serving_stablehlo(
            params, state, output_dir, mode=mode)
    return written


def serialize_serving_stablehlo(params: ConfigDict, state: Dict,
                                output_dir: str, mode: str = "tf",
                                int8_scales: Optional[Dict[str, float]]
                                = None) -> str:
    """AOT-serialize a serving graph closed over the weights.

    With `int8_scales` the int8-activation lane is serialized: the
    per-channel weight quantization happens at trace time from the f32
    params (export/quantize.py interceptor), so the blob is a
    self-contained quantized program — the analog of the reference's
    self-contained TensorRT INT8 engine (reference
    tensorrt/builder.py:46-91), where calibration also happened at build
    time and the engine carried the result."""
    from jax import export as jax_export
    serving = build_serving_fn(params, mode, int8_scales=int8_scales)
    batch = int(params.inference.batch_size)
    h, w = params.input.input_shape
    spec = jax.ShapeDtypeStruct(
        (batch, int(h), int(w), int(params.input.channels)), jnp.float32)
    closed = jax.jit(
        lambda images: serving(state["params"], state["batch_stats"],
                               images))
    exported = jax_export.export(closed)(spec)
    blob = exported.serialize()
    hlo_path = os.path.join(
        output_dir, _STABLEHLO_INT8_FILE if int8_scales else _STABLEHLO_FILE)
    with open(hlo_path, "wb") as f:
        f.write(blob)
    return hlo_path


class ServingModule:
    """Loaded serving artifact.

    `run_inference(images)`: fixed-batch detection (serving_default analog).
    `prepare_image(image)`: variable-size single image -> (input tensor,
    resize_scale) — host-side resize-with-pad, the analog of the reference's
    `prepare_image` signature (reference export.py:217-223).
    """

    def __init__(self, params: ConfigDict, serving_fn: Callable,
                 state: Dict, exported=None):
        self.params = params
        self._fn = jax.jit(serving_fn)
        self._state = state
        self._exported = exported
        self._host_pre = HostPreprocessor(params)
        self._host_pre.use_augmentation = False
        self._host_pre.horizontal_flip = False
        self._host_pre.jitter = None

    def run_inference(self, images) -> Dict[str, np.ndarray]:
        det = self._fn(self._state["params"], self._state["batch_stats"],
                       jnp.asarray(images, jnp.float32))
        return jax.device_get(det)

    def run_exported(self, images) -> Dict[str, np.ndarray]:
        """Execute through the deserialized StableHLO artifact.

        The graph is frozen at inference.batch_size (like the reference's
        serving_default signature); smaller batches are padded and results
        sliced back."""
        if self._exported is None:
            raise ValueError("artifact was saved without StableHLO")
        images = np.asarray(images, np.float32)
        frozen_bs = int(self.params.inference.batch_size)
        n = images.shape[0]
        if n > frozen_bs:
            raise ValueError(
                f"batch {n} exceeds the frozen serving batch {frozen_bs}")
        if n < frozen_bs:
            pad = np.zeros((frozen_bs - n,) + images.shape[1:], np.float32)
            images = np.concatenate([images, pad])
        out = jax.device_get(self._exported.call(jnp.asarray(images)))
        return {k: v[:n] for k, v in out.items()}

    def prepare_image(self, image: np.ndarray):
        out, scale = self._host_pre.resize_with_pad(np.asarray(image))
        return out[None], scale


def load_artifact(artifact_dir: str, mode: str = "tf",
                  use_stablehlo: bool = False,
                  use_int8_activations: bool = False) -> ServingModule:
    """`use_int8_activations` serves through the int8-activation path
    using the artifact's activation_scales.json (written by
    `python -m retinanet_tpu.export --int8_activations`)."""
    with open(os.path.join(artifact_dir, _CONFIG_FILE)) as f:
        params = from_dict(json.load(f))

    int8_scales = None
    if use_int8_activations:
        spath = os.path.join(artifact_dir, "activation_scales.json")
        if not os.path.exists(spath):
            raise FileNotFoundError(
                f"{spath} missing — export with --int8_activations to "
                "serve the int8 path")
        with open(spath) as f:
            int8_scales = json.load(f)["scales"]

    model = build_model(params)
    h, w = params.input.input_shape
    dummy = jnp.zeros((1, int(h), int(w), int(params.input.channels)))
    template = jax.eval_shape(
        lambda k: model.init(k, dummy, train=False), jax.random.PRNGKey(0))
    template = {"params": template["params"],
                "batch_stats": template.get("batch_stats", {})}
    template = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), template)
    with open(os.path.join(artifact_dir, _WEIGHTS_FILE), "rb") as f:
        state = flax.serialization.from_bytes(template, f.read())

    exported = None
    hlo_name = _STABLEHLO_INT8_FILE if use_int8_activations \
        else _STABLEHLO_FILE
    hlo_path = os.path.join(artifact_dir, hlo_name)
    if use_stablehlo:
        # A missing blob fails HERE for both lanes (fp and int8): the
        # same user error must not defer to a confusing run_exported()
        # failure for one lane and raise at load for the other.
        if not os.path.exists(hlo_path):
            hint = ("export with --int8_activations (and --stablehlo) to "
                    "serialize the int8 serving graph"
                    if use_int8_activations else
                    "export with serialize_stablehlo=True (the CLI default) "
                    "to serialize the serving graph")
            raise FileNotFoundError(f"{hlo_path} missing — {hint}")
        from jax import export as jax_export
        with open(hlo_path, "rb") as f:
            exported = jax_export.deserialize(f.read())

    return ServingModule(
        params, build_serving_fn(params, mode, int8_scales=int8_scales),
        state, exported)
