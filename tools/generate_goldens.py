"""Regenerate tests/goldens/*.npz from the reference implementation.

Requires the reference checkout at /root/reference and the `tf_keras`
(legacy Keras 2) package. We execute the reference's anchor generator,
label encoder and losses to capture golden outputs; no reference code is
copied into this repo.

Usage: python tools/generate_goldens.py
"""

from __future__ import annotations

import json
import sys
import types

import numpy as np

REFERENCE = "/root/reference"
OUT_DIR = "tests/goldens"


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


def main():
    _install_shims()
    import tensorflow as tf
    import tf_keras
    tf.keras = tf_keras  # the reference targets Keras 2
    sys.path.insert(0, REFERENCE)

    with open(f"{REFERENCE}/configs/v3-32/"
              "mscoco-retinanet-resnet50-640x640-30x-256.json") as f:
        params = EasyDict(json.load(f))

    from retinanet.dataloader.anchor_generator import AnchorBoxGenerator
    from retinanet.dataloader.label_encoder import LabelEncoder
    from retinanet.dataloader.utils import compute_iou
    from retinanet.losses.loss_impl import FocalLossV1

    gen = AnchorBoxGenerator(640, 640, 3, 7, params.anchor_params)
    ap_small = EasyDict({
        "areas": [1024.0, 4096.0, 16384.0],
        "aspect_ratios": [0.5, 1.0, 2.0],
        "scales": [1.0, 2 ** (1 / 3), 2 ** (2 / 3)]})
    gen_small = AnchorBoxGenerator(64, 64, 3, 5, ap_small)

    rng = np.random.default_rng(42)
    n_gt = 7
    gt_xywh = np.stack([
        rng.uniform(8, 56, n_gt), rng.uniform(8, 56, n_gt),
        rng.uniform(4, 40, n_gt), rng.uniform(4, 40, n_gt)],
        axis=-1).astype(np.float32)
    gt_cls = rng.integers(0, 10, n_gt).astype(np.int32)

    cfg = EasyDict(json.loads(json.dumps(params)))
    cfg.input.input_shape = [64, 64]
    cfg.architecture.feature_fusion.min_level = 3
    cfg.architecture.feature_fusion.max_level = 5
    cfg.anchor_params = ap_small
    le = LabelEncoder(cfg)
    matches = le._match_anchor_boxes(
        le.anchors.boxes, tf.constant(gt_xywh)).numpy()
    gt_p, cls_p = LabelEncoder._pad_labels(
        tf.constant(gt_xywh), tf.cast(tf.constant(gt_cls), tf.float32))
    gathered = tf.gather(gt_p, matches + 2)
    cls_target = tf.gather(cls_p, matches + 2).numpy()
    box_target = le._compute_box_target(
        gathered, tf.constant(matches)).numpy()
    iou_target = compute_iou(
        le.anchors.boxes, gathered, pair_wise=False).numpy()
    iou_target = np.where(matches > -1, iou_target, -1.0).astype(np.float32)

    np.savez_compressed(
        f"{OUT_DIR}/reference_goldens.npz",
        anchors_640=gen.boxes.numpy(),
        boundaries_640=np.array(gen.anchor_boundaries),
        anchors_small=gen_small.boxes.numpy(),
        boundaries_small=np.array(gen_small.anchor_boundaries),
        gt_xywh=gt_xywh, gt_cls=gt_cls, matches=matches,
        cls_target=cls_target, box_target=box_target,
        iou_target=iou_target,
        num_positives=np.float32(np.sum(matches > -1)))

    fl = FocalLossV1(0.25, 1.5, 0.0)
    logits = rng.normal(size=(2, 4, 4, 18)).astype(np.float32)
    y = (rng.uniform(size=(2, 4, 4, 18)) > 0.9).astype(np.float32)
    w = (rng.uniform(size=(2, 4, 4, 18)) > 0.2).astype(np.float32)
    focal_sum = float(fl(y_true=tf.constant(y), y_pred=tf.constant(logits),
                         sample_weight=tf.constant(w)).numpy())
    huber = tf_keras.losses.Huber(delta=0.1, reduction="sum")
    bt = (rng.normal(size=(2, 4, 4, 36, 1)).astype(np.float32)
          * (rng.uniform(size=(2, 4, 4, 36, 1)) > 0.5))
    bp = rng.normal(size=(2, 4, 4, 36, 1)).astype(np.float32)
    huber_sum = float(huber(
        y_true=tf.constant(bt), y_pred=tf.constant(bp),
        sample_weight=tf.constant((bt != 0).astype(np.float32))).numpy())
    np.savez_compressed(
        f"{OUT_DIR}/loss_goldens.npz",
        logits=logits, y=y, w=w, focal_sum=np.float32(focal_sum),
        bt=bt, bp=bp, huber_sum=np.float32(huber_sum))
    print("goldens written to", OUT_DIR)


if __name__ == "__main__":
    main()
