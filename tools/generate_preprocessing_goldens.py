"""Golden-capture for the reference PreprocessingPipeline.

Executes the reference's val path (normalize_and_resize_with_pad,
reference retinanet/dataloader/preprocessing_pipeline.py:96-129) and train
path (__call__ -> flip + jitter-resize + crop + pad + box transform,
preprocessing_pipeline.py:13-94) on a corpus of adversarially shaped
images (non-square, odd dims, larger and smaller than target), with the
train path's three stateful tf.random.uniform draws pinned so the repo's
HostPreprocessor can replay the identical geometry.

No reference code is copied — the reference is imported and *executed*,
outputs are saved to tests/goldens/preprocessing_goldens.npz.

Usage: python tools/generate_preprocessing_goldens.py
"""

from __future__ import annotations

import json
import sys
import types

import numpy as np

REFERENCE = "/root/reference"
OUT = "tests/goldens/preprocessing_goldens.npz"

# (h, w) corpus: non-square both orientations, odd dims, tiny upscales,
# large downscales, exact-fit, near-1 aspect.
SHAPES = [
    (480, 640),
    (640, 480),
    (427, 641),   # odd width, landscape-ish
    (123, 457),   # small, extreme aspect
    (800, 1203),  # downscale, odd width
    (77, 33),     # big upscale, portrait
    (640, 640),   # exact fit
    (1024, 683),
    (333, 500),
    (501, 333),
]

TARGET = 640

# Pinned draws for the train path, in reference call order:
#   1. flip draw        (utils.random_flip_horizontal:50)
#   2. scale draw value within [min_scale, max_scale] (pipeline:25-27)
#   3. offset draw pair in [0,1)^2 (pipeline:39)
# One triple per corpus image; mix flip on/off and scales above/below 1
# so both the crop branch (scale>1) and the pad branch (scale<1) run.
TRAIN_DRAWS = [
    (0.9, 1.50, (0.3, 0.7)),
    (0.1, 0.60, (0.5, 0.5)),
    (0.9, 1.00, (0.0, 0.0)),
    (0.2, 1.90, (0.99, 0.01)),
    (0.8, 0.52, (0.2, 0.9)),
    (0.9, 1.25, (0.6, 0.4)),
    (0.1, 1.75, (0.5, 0.25)),
    (0.7, 0.80, (0.1, 0.1)),
    (0.3, 1.10, (0.8, 0.3)),
    (0.9, 1.33, (0.45, 0.55)),
]


class EasyDict(dict):
    def __getattr__(self, k):
        if k.startswith("__"):
            raise AttributeError(k)
        v = self[k]
        if isinstance(v, dict) and not isinstance(v, EasyDict):
            v = EasyDict(v)
            self[k] = v
        return v

    def __setattr__(self, k, v):
        self[k] = v


def _install_shims():
    m = types.ModuleType("easydict")
    m.EasyDict = EasyDict
    sys.modules["easydict"] = m
    pct = types.ModuleType("pycocotools")
    pcc = types.ModuleType("pycocotools.coco")
    pcc.COCO = object
    pce = types.ModuleType("pycocotools.cocoeval")
    pce.COCOeval = object
    sys.modules.update({"pycocotools": pct, "pycocotools.coco": pcc,
                        "pycocotools.cocoeval": pce})


class _PinnedUniform:
    """Replaces tf.random.uniform inside the reference modules with a
    deterministic queue of draws (reference calls: flip scalar, scale
    scalar, offset pair)."""

    def __init__(self, tf):
        self._tf = tf
        self.queue = []

    def load(self, flip, scale, offset):
        self.queue = [
            np.float32(flip),
            np.float32(scale),
            np.asarray(offset, np.float32),
        ]

    def __call__(self, shape, minval=0, maxval=None, seed=None, **kw):
        # Draws are stored in final units (the scale draw is already inside
        # [min_scale, max_scale]; flip/offset draws are in [0, 1)).
        draw = self.queue.pop(0)
        return self._tf.constant(draw, dtype=self._tf.float32)


def main():
    _install_shims()
    import tensorflow as tf
    sys.path.insert(0, REFERENCE)

    with open(f"{REFERENCE}/configs/v3-32/"
              "mscoco-retinanet-resnet50-640x640-30x-256.json") as f:
        params = EasyDict(json.load(f))
    dl_params = params.dataloader_params

    from retinanet.dataloader import preprocessing_pipeline as pp_mod
    from retinanet.dataloader import utils as utils_mod

    pinned = _PinnedUniform(tf)
    # Both modules resolve tf.random.uniform dynamically through the shared
    # `tf` module object; patch once.
    orig_uniform = tf.random.uniform
    tf.random.uniform = pinned

    try:
        rng = np.random.default_rng(20260817)
        out = {}

        # ---- val path (no random draws involved) -------------------------
        # input_shape is a plain list in the reference (export.py:210-212
        # passes params.input.input_shape straight from JSON).
        pipe_val = pp_mod.PreprocessingPipeline([TARGET, TARGET], dl_params)
        for i, (h, w) in enumerate(SHAPES):
            img = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
            res = pipe_val.normalize_and_resize_with_pad(
                tf.constant(img, tf.float32))
            out[f"val{i}_img_u8"] = img
            out[f"val{i}_image"] = res["image"].numpy()
            out[f"val{i}_scale"] = res["resize_scale"].numpy()

        # ---- train path (pinned draws) -----------------------------------
        aug = EasyDict(json.loads(json.dumps(dl_params)))
        aug.augmentations.use_augmentation = True
        aug.augmentations.horizontal_flip = True
        pipe_train = pp_mod.PreprocessingPipeline([TARGET, TARGET], aug)
        jit_lo = float(aug.augmentations.scale_jitter.min_scale)
        jit_hi = float(aug.augmentations.scale_jitter.max_scale)

        for i, ((h, w), (flip, scale, off)) in enumerate(
                zip(SHAPES, TRAIN_DRAWS)):
            img = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
            n_box = 6
            x1 = rng.uniform(0, 0.8, n_box)
            y1 = rng.uniform(0, 0.8, n_box)
            boxes = np.stack([
                x1, y1,
                np.minimum(x1 + rng.uniform(0.05, 0.5, n_box), 1.0),
                np.minimum(y1 + rng.uniform(0.05, 0.5, n_box), 1.0),
            ], axis=-1).astype(np.float32)
            cls = rng.integers(0, 80, n_box).astype(np.int32)

            pinned.load(flip, scale, off)
            sample = {
                "image": tf.constant(img, tf.float32),
                "objects": {
                    "bbox": tf.constant(boxes),
                    "label": tf.constant(cls),
                },
            }
            t_img, t_box, t_cls = pipe_train(sample)
            assert not pinned.queue, "unconsumed pinned draws"
            out[f"tr{i}_img_u8"] = img
            out[f"tr{i}_boxes_norm"] = boxes
            out[f"tr{i}_cls_in"] = cls
            out[f"tr{i}_draws"] = np.array(
                [flip, scale, off[0], off[1]], np.float32)
            out[f"tr{i}_image"] = t_img.numpy()
            out[f"tr{i}_boxes"] = t_box.numpy()
            out[f"tr{i}_cls"] = t_cls.numpy()
    finally:
        tf.random.uniform = orig_uniform
        assert utils_mod  # imported for patch coverage documentation

    out["n_shapes"] = np.int32(len(SHAPES))
    out["target"] = np.int32(TARGET)
    out["mean"] = np.asarray(dl_params.preprocessing.mean, np.float32)
    out["stddev"] = np.asarray(dl_params.preprocessing.stddev, np.float32)
    out["pixel_scale"] = np.float32(dl_params.preprocessing.pixel_scale)
    out["jitter"] = np.array([jit_lo, jit_hi], np.float32)
    np.savez_compressed(OUT, **out)
    print(f"wrote {OUT}: {len(out)} arrays")


if __name__ == "__main__":
    main()
