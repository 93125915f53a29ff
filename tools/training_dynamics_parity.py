"""Lockstep training-dynamics parity vs the EXECUTED reference.

The last link in the mAP-parity chain: forward, detections, losses and
preprocessing are golden-verified, but the backward pass + optimizer
trajectory never were. This tool runs N optimizer steps in BOTH
frameworks from the same transplanted init on identical batches and
compares, per step:

  * total / class / box / l2 losses,
  * the post-clip global gradient norm (reference executor.py:440
    definition, num_replicas = 1),
  * per-top-level-module L2 of the parameter delta (backbone / neck /
    box_head / class_head), plus the BN moving-statistics delta.

Reference side (all EXECUTED reference code, nothing copied):
  * model: tools/transplant.build_reference_model (reference
    model/builder.py recipe),
  * targets: reference LabelEncoder.encode_sample with augmentation off
    (reference dataloader/label_encoder.py:88-125),
  * loss: reference losses.RetinaNetLoss (losses/retinanet_loss.py:37-83),
  * optimizer: reference optimizers.build_optimizer resolved to the
    Keras-2 SGD the reference trained with (optimizers/builder.py:46),
  * step semantics: forward -> loss -> +weight decay -> grads ->
    per-tensor-then-global clip -> apply (executor.py:409-441), with the
    weight-decay variable walk of executor.py:301-327.

Our side: the production make_train_step (train/step.py) with our
encoder / loss / optax keras_sgd — the exact step every training run jits.

Modes: 'plain' (flagship semantics: wd on, clipnorm, momentum+nesterov,
warmup LR active so the LR VARIES across the compared steps) and
'freeze' (freeze_variables=['backbone']). The EMA wrapper cannot be
locksteped here: tensorflow_addons is not installable in this sandbox,
and the reference itself silently disables EMA when the import fails
(reference optimizers/builder.py:55-59); our EMA is pinned against the
tfa MovingAverage formula in tests/test_ema.py instead.

Usage: python tools/training_dynamics_parity.py [--steps 10] [--size 256]
       [--batch 4] [--mode plain|freeze|all] [--markdown]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.transplant import (EasyDict, FLAGSHIP_CONFIG, REFERENCE,  # noqa: E402
                              build_reference_model, healthify_weights,
                              keras_weight_dict, transplant)


# --------------------------------------------------------------- batch maker

def make_batches(n_steps, batch, size, n_gt=10, seed=0):
    """Identical raw batches for both frameworks: pixel images in [0,255],
    in-bounds non-degenerate boxes (so the reference's clip/degenerate-drop
    in _prepare_labels is a no-op and both sides see the same GT set)."""
    rng = np.random.default_rng(seed)
    batches = []
    for _ in range(n_steps):
        images = rng.uniform(0, 255, (batch, size, size, 3)).astype(
            np.float32)
        w = rng.uniform(16, size * 0.45, (batch, n_gt)).astype(np.float32)
        h = rng.uniform(16, size * 0.45, (batch, n_gt)).astype(np.float32)
        cx = rng.uniform(0, 1, (batch, n_gt)).astype(np.float32) \
            * (size - w - 2) + w / 2 + 1
        cy = rng.uniform(0, 1, (batch, n_gt)).astype(np.float32) \
            * (size - h - 2) + h / 2 + 1
        centers = np.stack([cx, cy, w, h], axis=-1)       # (B, G, 4) cxcywh
        corners = np.stack([cx - w / 2, cy - h / 2,
                            cx + w / 2, cy + h / 2], axis=-1)
        classes = rng.integers(0, 80, (batch, n_gt)).astype(np.int32)
        batches.append({"images": images, "centers": centers,
                        "corners": corners, "classes": classes})
    return batches


# ----------------------------------------------------------- reference side

def build_reference_trainer(ref_cfg, size, freeze=()):
    """Executed-reference training closure: step(images, targets) ->
    (losses dict, post-clip grad norm)."""
    import tensorflow as tf
    import tf_keras

    model = build_reference_model(ref_cfg, size)
    healthify_weights(model, seed=0)

    sys.path.insert(0, REFERENCE)
    from retinanet.losses import RetinaNetLoss as RefLoss
    from retinanet.model.builder import ModelBuilder
    from retinanet.optimizers.builder import get_learning_rate_schedule

    params = EasyDict(json.loads(json.dumps(ref_cfg)))
    params.input.input_shape = [size, size]
    loss_fn = RefLoss(params.architecture.head.num_classes, params.loss)

    # Freeze per reference Executor._maybe_freeze_layers (executor.py:154-176)
    def flat_layers():
        out = []
        for layer in model.layers:
            out.extend(layer.layers if hasattr(layer, "layers") else [layer])
        return out

    for pattern in freeze:
        regex = ModelBuilder.FREEZE_VARS_REGEX[pattern]
        for layer in flat_layers():
            for wgt in layer.weights:
                if regex.search(wgt.name) and layer.trainable:
                    layer.trainable = False

    # Optimizer: the reference's build_optimizer resolves `tf.optimizers.get`
    # which in its training era was the Keras-2 SGD; execute exactly that
    # (reference optimizers/builder.py:27-46 minus the tfa/loss-scale arms
    # that cannot activate here).
    opt_cfg = dict(params.training.optimizer)
    lr_params = opt_cfg.pop("lr_params")
    opt_cfg.pop("use_moving_average", None)
    opt_cfg.pop("moving_average_decay", None)
    opt_cfg.pop("global_clipnorm", None)
    clipnorm = opt_cfg.pop("clipnorm", None)
    opt_cfg["learning_rate"] = get_learning_rate_schedule(
        params.training.train_steps, EasyDict(lr_params))
    optimizer = tf_keras.optimizers.get(
        {"class_name": opt_cfg.pop("name"), "config": opt_cfg})

    # Weight-decay variable walk (reference executor.py:301-327).
    wd_vars = []
    for layer in flat_layers():
        if not layer.trainable:
            continue
        if isinstance(layer, tf_keras.layers.SeparableConv2D):
            wd_vars += [layer.depthwise_kernel, layer.pointwise_kernel]
        elif isinstance(layer, tf_keras.layers.DepthwiseConv2D):
            wd_vars.append(layer.depthwise_kernel)
        elif isinstance(layer, tf_keras.layers.Conv2D):
            wd_vars.append(layer.kernel)
        else:
            for var in layer.trainable_variables:
                if "kernel" in var.name or "weight" in var.name:
                    wd_vars.append(var)
    alpha = float(params.training.weight_decay_alpha)
    use_wd = bool(params.training.use_weight_decay)

    @tf.function
    def step(images, targets):
        with tf.GradientTape() as tape:
            preds = model(images, training=True)
            losses = loss_fn(targets, preds)
            losses["total-loss"] = losses["weighted-loss"]
            if use_wd:
                losses["l2-regularization"] = tf.math.add_n(
                    [alpha * tf.nn.l2_loss(v) for v in wd_vars])
                losses["total-loss"] += losses["l2-regularization"]
        grads = tape.gradient(losses["total-loss"],
                              model.trainable_variables)
        if clipnorm:
            # reference Executor._clip_gradients_by_norm (executor.py:401-407)
            grads = [tf.clip_by_norm(g, clipnorm) for g in grads]
            grads, _ = tf.clip_by_global_norm(grads, clipnorm)
        optimizer.apply_gradients(zip(grads, model.trainable_variables))
        losses["gradient-norm"] = tf.linalg.global_norm(grads)
        # per-image normalizer count (reference executor.py:438)
        losses["num-anchors-matched"] /= tf.cast(
            tf.shape(images)[0], tf.float32)
        return losses

    return model, step


def reference_targets(ref_cfg, size, batch_np):
    """Per-sample reference LabelEncoder.encode_sample (augmentation OFF so
    the preprocessing geometry is identity), stacked to a batch."""
    import tensorflow as tf
    from retinanet.dataloader.label_encoder import LabelEncoder

    cfg = EasyDict(json.loads(json.dumps(ref_cfg)))
    cfg.input.input_shape = [size, size]
    cfg.dataloader_params.augmentations.use_augmentation = False
    le = LabelEncoder(cfg)

    images, per_sample = [], []
    for i in range(batch_np["images"].shape[0]):
        sample = {
            "image": tf.constant(batch_np["images"][i]),
            "objects": {
                "bbox": tf.constant(batch_np["corners"][i] / size),
                "label": tf.constant(batch_np["classes"][i]),
            },
        }
        image, targets = le.encode_sample(sample)
        images.append(image)
        per_sample.append(targets)

    def stack(key):
        return {lvl: tf.stack([s[key][lvl] for s in per_sample])
                for lvl in per_sample[0][key]}

    batched = {"class-targets": stack("class-targets"),
               "box-targets": stack("box-targets"),
               "num-positives": tf.stack(
                   [s["num-positives"] for s in per_sample])}
    return tf.stack(images), batched


# ----------------------------------------------------------------- our side

def build_flax_trainer(params_cfg, variables, freeze=()):
    import jax
    import jax.numpy as jnp
    from retinanet_tpu.data import anchors as anchor_lib
    from retinanet_tpu.data.label_encoder import make_batched_encoder
    from retinanet_tpu.data.preprocessing import make_device_normalizer
    from retinanet_tpu.losses.losses import RetinaNetLoss
    from retinanet_tpu.optimizers.builder import build_optimizer
    from retinanet_tpu.train import step as step_lib
    from retinanet_tpu.train.train_state import create_train_state
    from retinanet_tpu.models.retinanet import build_model

    model = build_model(params_cfg)
    t = params_cfg.training
    anchors = anchor_lib.from_params(params_cfg)
    encoder = make_batched_encoder(anchors, params_cfg.encoder_params)
    normalizer = make_device_normalizer(params_cfg)
    loss_fn = RetinaNetLoss(
        int(params_cfg.architecture.head.num_classes), params_cfg.loss)
    tx, schedule = build_optimizer(
        t.optimizer, int(t.train_steps), freeze_variables=list(freeze),
        precision="float32")
    state = create_train_state(dict(variables), tx)
    step = jax.jit(step_lib.make_train_step(
        model, loss_fn, encoder, normalizer, tx, schedule,
        use_weight_decay=bool(t.use_weight_decay),
        weight_decay_alpha=float(t.weight_decay_alpha),
        compute_dtype=jnp.float32,
        clipnorm=t.optimizer.get("clipnorm", None),
        freeze_keys=list(freeze)))
    return state, step


# ------------------------------------------------------------- fingerprints

def flax_keras_pairs(params_cfg, variables, size):
    """[(tree ('params'|'batch_stats'), flax path, keras name)] via the
    transplant name mapping — the shared coordinate system for comparing
    parameter deltas."""
    import jax
    from tools.transplant import (flax_to_keras_name, make_resnet_mapper)

    mapper = make_resnet_mapper(int(params_cfg.architecture.backbone.depth))
    min_l = int(params_cfg.architecture.feature_fusion.min_level)
    max_l = int(params_cfg.architecture.feature_fusion.max_level)
    pairs = []
    for tree_name in ("params", "batch_stats"):
        flat, _ = jax.tree_util.tree_flatten_with_path(variables[tree_name])
        for key_path, _leaf in flat:
            path = "/".join(
                str(getattr(k, "key", getattr(k, "idx", k)))
                for k in key_path)
            pairs.append((tree_name, path,
                          flax_to_keras_name(path, mapper, min_l, max_l)))
    return pairs


def module_of(tree_name, path):
    if tree_name == "batch_stats":
        return "bn_stats"
    return path.split("/")[0]


def delta_fingerprint(prev, curr, keys_by_module):
    """keys -> values dicts -> per-module L2 of (curr - prev)."""
    out = {}
    for module, keys in keys_by_module.items():
        sq = 0.0
        for k in keys:
            d = curr[k].astype(np.float64) - prev[k].astype(np.float64)
            sq += float(np.sum(d * d))
        out[module] = float(np.sqrt(sq))
    return out


# -------------------------------------------------------------------- driver

def perturb_params(variables, rel=1e-7, seed=99):
    """1-ulp-scale multiplicative noise on params (batch_stats untouched):
    the noise-floor twin. f32 has ~1.2e-7 ulp, so rel=1e-7 models the
    rounding-order freedom two correct implementations legitimately have.
    The spread between the exact and perturbed OUR-side trajectories is
    the chaotic-amplification floor: any ref-vs-ours gap inside it is
    numeric conditioning (BN batch-stats feedback at train=True), not a
    semantic difference."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)

    def bump(x):
        noise = rng.choice([-1.0, 1.0], size=x.shape).astype(np.float32)
        return x * (1.0 + rel * jnp.asarray(noise))

    out = dict(variables)
    out["params"] = jax.tree_util.tree_map(bump, variables["params"])
    return out


def state_distance(ref_snap, our_snap, keys_by_module):
    """Cross-framework ABSOLUTE state agreement: per-module
    ||ref - ours|| / ||ref|| over the shared keras-name coordinate
    system. This is the metric the per-step delta fingerprints cannot
    see — slow systematic drift (BN running stats under momentum 0.99,
    velocity-buffer divergence across LR boundaries) accumulates HERE."""
    out = {}
    for module, keys in keys_by_module.items():
        num, den = 0.0, 0.0
        for k in keys:
            d = ref_snap[k].astype(np.float64) - our_snap[k].astype(
                np.float64)
            num += float(np.sum(d * d))
            den += float(np.sum(ref_snap[k].astype(np.float64) ** 2))
        out[module] = float(np.sqrt(num) / max(np.sqrt(den), 1e-12))
    return out


def detection_agreement(ref_det, our_det, iou_thresh=0.5):
    """Greedy one-to-one match of two detection sets. Returns
    (matched_fraction, mean matched-pair IoU, mean |score delta|)."""
    from retinanet_tpu.data.box_utils import corners_iou

    total_ref, matched, ious, dscores = 0, 0, [], []
    for b in range(ref_det["boxes"].shape[0]):
        n_r = int(ref_det["valid_detections"][b])
        n_o = int(our_det["valid_detections"][b])
        total_ref += n_r
        if n_r == 0 or n_o == 0:
            continue
        rb = np.asarray(ref_det["boxes"][b][:n_r], np.float32)
        ob = np.asarray(our_det["boxes"][b][:n_o], np.float32)
        iou = np.asarray(corners_iou(rb, ob))
        cls_ok = (np.asarray(ref_det["classes"][b][:n_r])[:, None]
                  == np.asarray(our_det["classes"][b][:n_o])[None, :])
        iou = np.where(cls_ok, iou, 0.0)
        used = np.zeros(n_o, bool)
        for r in range(n_r):
            cand = np.where(~used, iou[r], -1.0)
            j = int(np.argmax(cand))
            if cand[j] >= iou_thresh:
                used[j] = True
                matched += 1
                ious.append(float(cand[j]))
                dscores.append(abs(float(ref_det["scores"][b][r])
                                   - float(our_det["scores"][b][j])))
    frac = matched / max(total_ref, 1)
    return (frac,
            float(np.mean(ious)) if ious else 0.0,
            float(np.mean(dscores)) if dscores else 0.0)


def _run_reference_postprocess(ref_model, ref_cfg, size, images,
                               score_threshold):
    """The reference's full export postprocess graph, eager, on the
    (now-trained) reference model (reference model/builder.py:153-190)."""
    from retinanet.model.layers import (FuseDetections, FilterTopKDetections,
                                        GenerateDetections,
                                        TransformBoxesAndScores)
    rp = EasyDict(json.loads(json.dumps(ref_cfg)))
    rp.input.input_shape = [size, size]
    rp.inference.score_threshold = score_threshold
    raw = ref_model(images, training=False)
    x = FuseDetections(
        min_level=rp.architecture.feature_fusion.min_level,
        max_level=rp.architecture.feature_fusion.max_level)(raw)
    x = TransformBoxesAndScores(params=rp)(x)
    x = FilterTopKDetections(
        top_k=rp.inference.pre_nms_top_k,
        filter_per_class=rp.inference.filter_per_class)(x)
    det = GenerateDetections(
        iou_threshold=rp.inference.iou_threshold,
        score_threshold=rp.inference.score_threshold,
        max_detections=rp.inference.max_detections,
        soft_nms_sigma=rp.inference.soft_nms_sigma,
        num_classes=rp.architecture.head.num_classes,
        mode=rp.inference.mode)(x)
    return {k: np.asarray(v) for k, v in det.items()}


def _run_our_inference(params_cfg, model, st, images, score_threshold):
    """Our serving path with the exact-parity knobs on trained state."""
    import jax
    import jax.numpy as jnp
    from retinanet_tpu.core.config import from_dict
    from retinanet_tpu.data import anchors as anchor_lib
    from retinanet_tpu.ops.postprocess import make_inference_fn

    cfg = json.loads(json.dumps(params_cfg.to_dict()))
    cfg["inference"]["score_threshold"] = score_threshold
    cfg["inference"]["nms_top_k"] = cfg["inference"]["pre_nms_top_k"]
    cfg["inference"]["use_approx_top_k"] = False
    pc = from_dict(cfg)
    anchors = anchor_lib.from_params(pc)
    infer = jax.jit(make_inference_fn(
        model, pc, anchors, normalizer=lambda im: im,
        compute_dtype=jnp.float32))
    det = jax.device_get(infer(st.params, st.batch_stats, images))
    return {k: np.asarray(v) for k, v in det.items()}


def run_lockstep(mode="plain", n_steps=10, size=256, batch=4,
                 config_path=FLAGSHIP_CONFIG, noise_floor=True,
                 depth=None, lr_override=None, sample_every=1,
                 final_detections=False):
    """Lockstep both frameworks for `n_steps`.

    Long-horizon knobs (round-5, closing the last gap in the mAP-parity
    chain — the 10-step window could not see BN running-stat drift under
    momentum 0.99, LR warmup/boundary crossings under Keras velocity
    semantics, or slow trajectory divergence):

      * depth: backbone depth override (resnet18 keeps 300-500 step CPU
        runs tractable; the step/loss/optimizer semantics under test are
        depth-independent).
      * lr_override: lr_params dict placed in BOTH configs — long runs
        put warmup AND a piecewise boundary inside the window.
      * sample_every: losses are recorded every step; the (expensive)
        full-weight fingerprints — per-module delta over the sample
        interval, and the cross-framework ABSOLUTE state distance that
        detects cumulative drift — only at sampled steps.
      * final_detections: end with detection-set agreement of the two
        TRAINED models on a held-out batch (the reference export graph
        vs our serving path), reported next to the noise-floor twin's
        agreement (exact-vs-1ulp-perturbed) so chaotic divergence is not
        misread as semantic divergence.
    """
    import jax

    freeze = ["backbone"] if mode == "freeze" else []

    with open(config_path) as f:
        ref_cfg = json.load(f)
    ref_cfg["floatx"]["precision"] = "float32"
    if depth is not None:
        ref_cfg["architecture"]["backbone"]["depth"] = int(depth)
    if lr_override is not None:
        ref_cfg["training"]["optimizer"]["lr_params"] = dict(lr_override)
        ref_cfg["training"]["train_steps"] = max(
            int(ref_cfg["training"]["train_steps"]), n_steps)

    ref_model, ref_step = build_reference_trainer(ref_cfg, size,
                                                  freeze=freeze)
    weights = keras_weight_dict(ref_model)

    from retinanet_tpu.core.config import from_dict
    cfg = json.loads(json.dumps(ref_cfg))
    cfg["input"]["input_shape"] = [size, size]
    cfg["architecture"]["backbone"]["checkpoint"] = ""
    if freeze:
        cfg["training"]["freeze_variables"] = freeze
    params_cfg = from_dict(cfg)

    model, variables = transplant(params_cfg, weights, size)
    state, flax_step = build_flax_trainer(params_cfg, variables,
                                          freeze=freeze)
    pert_state = None
    if noise_floor:
        pert_state, _ = build_flax_trainer(
            params_cfg, perturb_params(variables), freeze=freeze)

    pairs = flax_keras_pairs(params_cfg, variables, size)
    keys_by_module: dict = {}
    for tree_name, path, kname in pairs:
        keys_by_module.setdefault(
            module_of(tree_name, path), []).append(kname)

    def keras_snapshot():
        return {name: np.asarray(v) for name, v in
                keras_weight_dict(ref_model).items()}

    def flax_snapshot(st):
        snap = {}
        for tree_name, path, kname in pairs:
            node = st.params if tree_name == "params" else st.batch_stats
            for part in path.split("/"):
                node = node[part]
            snap[kname] = np.asarray(node)
        return snap

    batches = make_batches(n_steps, batch, size, seed=11)
    rows = []
    ref_prev = keras_snapshot()
    flax_prev = flax_snapshot(state)
    pert_prev = flax_snapshot(pert_state) if pert_state is not None else None

    for i, b in enumerate(batches):
        images_tf, targets_tf = reference_targets(ref_cfg, size, b)
        ref_losses = {k: float(v) for k, v in
                      ref_step(images_tf, targets_tf).items()}

        flax_batch = {
            "image": b["images"],
            "boxes": b["centers"],
            "classes": b["classes"],
            "valid": np.ones(b["classes"].shape, bool),
        }
        dev_batch = {k: jax.numpy.asarray(v) for k, v in flax_batch.items()}
        state, metrics = flax_step(state, dev_batch)
        flax_losses = {k: float(v) for k, v in metrics.items()}
        pert_losses = None
        if pert_state is not None:
            pert_state, pmetrics = flax_step(pert_state, dev_batch)
            pert_losses = {k: float(v) for k, v in pmetrics.items()}

        row = {"step": i}
        for key in ("total-loss", "class-loss", "box-loss",
                    "l2-regularization", "gradient-norm",
                    "num-anchors-matched"):
            rk = ref_losses.get(key)
            fk = flax_losses.get(key)
            row[key] = (rk, fk,
                        abs(rk - fk) / max(abs(rk), 1e-12)
                        if rk is not None and fk is not None else None)
        if pert_losses is not None:
            row["noise_floor"] = {
                k: abs(flax_losses[k] - pert_losses[k])
                / max(abs(flax_losses[k]), 1e-12)
                for k in ("total-loss", "class-loss", "box-loss")
                if k in flax_losses and k in pert_losses}

        if (i + 1) % sample_every == 0 or i == n_steps - 1:
            ref_curr = keras_snapshot()
            flax_curr = flax_snapshot(state)
            ref_fp = delta_fingerprint(ref_prev, ref_curr, keys_by_module)
            flax_fp = delta_fingerprint(flax_prev, flax_curr,
                                        keys_by_module)
            row["delta_fp"] = {
                m: (ref_fp[m], flax_fp[m],
                    abs(ref_fp[m] - flax_fp[m]) / max(ref_fp[m], 1e-12))
                for m in sorted(keys_by_module)}
            row["state_fp"] = state_distance(ref_curr, flax_curr,
                                             keys_by_module)
            if pert_state is not None:
                pert_curr = flax_snapshot(pert_state)
                row["state_fp_floor"] = state_distance(
                    flax_curr, pert_curr, keys_by_module)
                pert_fp = delta_fingerprint(pert_prev, pert_curr,
                                            keys_by_module)
                row["delta_fp_floor"] = {
                    m: abs(flax_fp[m] - pert_fp[m]) / max(flax_fp[m], 1e-12)
                    for m in sorted(keys_by_module)}
                pert_prev = pert_curr
            ref_prev, flax_prev = ref_curr, flax_curr
        rows.append(row)

    result = {"rows": rows}
    if final_detections:
        held = make_batches(1, batch, size, seed=4242)[0]
        thr = 0.005

        # Raw per-level forward agreement of the TRAINED models on the
        # held-out batch — robust to the score-tie noise that makes
        # detection matching of a noise-trained model uninformative (the
        # 1-ulp twin itself mismatches on ties); judged against that twin.
        def _our_raw(st):
            import jax
            out = model.apply({"params": st.params,
                               "batch_stats": st.batch_stats},
                              held["images"], train=False)
            return {kind: {str(lvl): np.asarray(t, np.float64)
                           for lvl, t in out[kind].items()}
                    for kind in ("box-predictions", "class-predictions")}

        ref_raw = ref_model(held["images"], training=False)
        ref_raw = {kind: {str(lvl): np.asarray(t, np.float64)
                          for lvl, t in ref_raw[kind].items()}
                   for kind in ("box-predictions", "class-predictions")}
        our_raw = _our_raw(state)

        def _rel(a, b):
            return {kind: {lvl: float(
                np.max(np.abs(a[kind][lvl] - b[kind][lvl]))
                / max(float(np.max(np.abs(a[kind][lvl]))), 1e-12))
                for lvl in a[kind]} for kind in a}

        result["outputs"] = {"ref_vs_ours": _rel(ref_raw, our_raw)}
        if pert_state is not None:
            result["outputs"]["floor"] = _rel(our_raw, _our_raw(pert_state))

        ref_det = _run_reference_postprocess(
            ref_model, ref_cfg, size, held["images"], thr)
        our_det = _run_our_inference(params_cfg, model, state,
                                     held["images"], thr)
        frac, miou, dscore = detection_agreement(ref_det, our_det)
        result["detections"] = {
            "ref_count": int(np.sum(ref_det["valid_detections"])),
            "our_count": int(np.sum(our_det["valid_detections"])),
            "matched_fraction": frac, "mean_matched_iou": miou,
            "mean_abs_score_delta": dscore}
        if pert_state is not None:
            pert_det = _run_our_inference(params_cfg, model, pert_state,
                                          held["images"], thr)
            pfrac, pmiou, pdscore = detection_agreement(our_det, pert_det)
            result["detections_floor"] = {
                "pert_count": int(np.sum(pert_det["valid_detections"])),
                "matched_fraction": pfrac, "mean_matched_iou": pmiou,
                "mean_abs_score_delta": pdscore}
    return result if final_detections else rows


def print_rows(rows, markdown=False, only_sampled=False):
    loss_keys = ("total-loss", "class-loss", "box-loss",
                 "l2-regularization", "gradient-norm")
    if markdown:
        print("| step | " + " | ".join(
            f"{k} (ref / ours / rel)" for k in loss_keys) + " |")
        print("|" + "---|" * (len(loss_keys) + 1))
    worst_loss = 0.0
    worst_fp = 0.0
    for row in rows:
        if only_sampled and "delta_fp" not in row:
            for k in loss_keys:
                worst_loss = max(worst_loss, row[k][2])
            continue
        cells = []
        for k in loss_keys:
            r, f, rel = row[k]
            worst_loss = max(worst_loss, rel)
            cells.append(f"{r:.6f} / {f:.6f} / {rel:.2e}")
        if markdown:
            print(f"| {row['step']} | " + " | ".join(cells) + " |")
        else:
            print(f"step {row['step']}:")
            for k, c in zip(loss_keys, cells):
                print(f"  {k:<20} {c}")
        if "delta_fp" in row:
            fps = row["delta_fp"]
            fp_str = "  ".join(f"{m}:{rel:.2e}" for m, (_, _, rel)
                               in fps.items())
            worst_fp = max(worst_fp,
                           max(rel for _, _, rel in fps.values()))
            print(("  " if not markdown else "") +
                  f"  delta-fp rel err: {fp_str}")
        if "state_fp" in row:
            st_str = "  ".join(f"{m}:{v:.2e}"
                               for m, v in row["state_fp"].items())
            print(("  " if not markdown else "") +
                  f"  state distance (ref vs ours): {st_str}")
        if "state_fp_floor" in row:
            fl_str = "  ".join(f"{m}:{v:.2e}"
                               for m, v in row["state_fp_floor"].items())
            print(("  " if not markdown else "") +
                  f"  state distance 1-ulp floor:   {fl_str}")
        if row.get("noise_floor"):
            nf_str = "  ".join(f"{k}:{v:.2e}"
                               for k, v in row["noise_floor"].items())
            print(("  " if not markdown else "") +
                  f"  1-ulp noise floor: {nf_str}")
    print(f"worst loss rel err: {worst_loss:.3e}   "
          f"worst delta-fingerprint rel err: {worst_fp:.3e}")
    return worst_loss, worst_fp


# LR schedule for long runs: warmup AND a 10x piecewise boundary INSIDE
# the lockstep window (reference
# optimizers/piecewise_constant_decay_with_warmup.py:4-35), at a bs-4-safe
# magnitude. Boundary placement (60% in) leaves ~40% of the horizon to
# observe post-drop trajectory agreement under Keras velocity semantics.
def long_lr_params(n_steps):
    return {"schedule_type": "piecewise_constant_decay",
            "warmup_learning_rate": 0.001,
            "warmup_steps": max(n_steps // 16, 2),
            "values": [0.01, 0.001],
            "boundaries": [int(n_steps * 0.6)]}


def main():
    # Lockstep parity is a CPU experiment by construction: the reference
    # side executes TF on CPU, so our side must use the same f32 CPU
    # numerics — and the installed TPU plugin OVERRIDES the JAX_PLATFORMS
    # env var, so pin the platform via config before first jax use.
    import jax
    jax.config.update("jax_platforms",
                      os.environ.get("PARITY_JAX_PLATFORM", "cpu"))

    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--mode", default="all",
                    choices=["plain", "freeze", "all"])
    ap.add_argument("--markdown", action="store_true")
    ap.add_argument("--long", action="store_true",
                    help="long-horizon preset: resnet18, 400 steps @160^2, "
                    "warmup + LR boundary inside the window, sampled "
                    "fingerprints, final detection-set agreement")
    ap.add_argument("--depth", type=int, default=None)
    ap.add_argument("--sample_every", type=int, default=1)
    ap.add_argument("--out", default=None,
                    help="write the full result JSON here")
    args = ap.parse_args()

    if args.long:
        n = args.steps if args.steps != 10 else 400
        # size must be divisible by 2^max_level = 128 (the flagship config
        # has max_level 7); 256 is the smallest that exercises all levels
        size = args.size
        depth = args.depth or 18
        sample = args.sample_every if args.sample_every != 1 else 25
        print(f"=== long-horizon lockstep: {n} steps, resnet{depth} "
              f"@{size}^2, bs{args.batch}, sample_every={sample} ===")
        result = run_lockstep(
            "plain", n, size, args.batch, depth=depth,
            lr_override=long_lr_params(n), sample_every=sample,
            final_detections=True)
        print_rows(result["rows"], markdown=args.markdown,
                   only_sampled=True)
        print("\nfinal raw-output agreement on held-out batch "
              "(max|diff|/max|ref| per level):")
        for tag in ("ref_vs_ours", "floor"):
            if tag in result.get("outputs", {}):
                for kind, lv in result["outputs"][tag].items():
                    worst = max(lv.values())
                    print(f"  {tag:<12} {kind:<18} worst={worst:.3e}  "
                          + "  ".join(f"P{k}:{v:.1e}"
                                      for k, v in sorted(lv.items())))
        print("\nfinal detection-set agreement (held-out batch):")
        print("  ref vs ours:", json.dumps(result["detections"]))
        if "detections_floor" in result:
            print("  1-ulp floor:", json.dumps(result["detections_floor"]))
        if args.out:
            with open(args.out, "w") as f:
                json.dump(result, f, indent=1)
            print(f"wrote {args.out}")
        return

    modes = ["plain", "freeze"] if args.mode == "all" else [args.mode]
    for mode in modes:
        print(f"\n=== mode: {mode} (steps={args.steps}, size={args.size}, "
              f"batch={args.batch}) ===")
        rows = run_lockstep(mode, args.steps, args.size, args.batch,
                            depth=args.depth,
                            sample_every=args.sample_every)
        print_rows(rows, markdown=args.markdown)
        if args.out:
            with open(args.out, "w") as f:
                json.dump({"rows": rows}, f, indent=1)
            print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
