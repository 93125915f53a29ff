"""On-chip smoke of the full shipped config corpus: one real train step
plus one batched inference per config, at the config's REAL resolution.

The unit suite exercises tiny shapes on CPU; this drives every shipped
experiment config (ResNet50 640/1024/1280, EfficientNet-B2/B3/lite2/3,
MobileDet-GPU, ...) end to end on the TPU at its production input shape:
device label encode -> fwd -> bwd -> SGD update (finite losses) and the
serving path (valid detection contract). Batch sizes are scaled down to
fit one chip; resolution and architecture are exactly the config's.

Usage: PYTHONPATH=/root/.axon_site:. python tools/config_corpus_smoke.py
       [name-filter]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import retinanet_tpu.core.cache  # noqa: F401

import glob
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def smoke(path: str) -> dict:
    from retinanet_tpu.core.config import from_dict
    from retinanet_tpu.data import anchors as anchor_lib
    from retinanet_tpu.data.label_encoder import make_batched_encoder
    from retinanet_tpu.data.preprocessing import make_device_normalizer
    from retinanet_tpu.data.synthetic import synthetic_train_batch
    from retinanet_tpu.losses.losses import RetinaNetLoss
    from retinanet_tpu.models.retinanet import build_model
    from retinanet_tpu.ops.postprocess import make_inference_fn
    from retinanet_tpu.optimizers.builder import build_optimizer
    from retinanet_tpu.train import step as step_lib
    from retinanet_tpu.train.train_state import create_train_state

    params = from_dict(json.load(open(path)))
    h, w = params.input.input_shape
    bs = max(1, min(4, int((640 * 640 * 8) / (h * w))))

    model = build_model(params)
    anchors = anchor_lib.from_params(params)
    encoder = make_batched_encoder(anchors, params.encoder_params)
    normalizer = make_device_normalizer(params)
    num_classes = int(params.architecture.head.num_classes)
    loss_fn = RetinaNetLoss(num_classes, params.loss)
    tx, schedule = build_optimizer(
        params.training.optimizer, params.training.train_steps)

    variables = jax.jit(lambda k: model.init(
        k, jnp.zeros((1, h, w, 3)), train=False))(jax.random.PRNGKey(0))
    state = create_train_state(variables, tx)
    step = jax.jit(step_lib.make_train_step(
        model, loss_fn, encoder, normalizer, tx, schedule,
        use_weight_decay=True, weight_decay_alpha=1e-4,
        compute_dtype=jnp.bfloat16), donate_argnums=(0,))
    batch = {k: jnp.asarray(v) for k, v in synthetic_train_batch(
        bs, (h, w), 20, num_classes, seed=0).items()}
    t0 = time.time()
    state, metrics = step(state, batch)
    loss = float(metrics["total-loss"])
    compile_s = time.time() - t0
    assert np.isfinite(loss), f"{path}: non-finite loss"
    t0 = time.time()
    state, metrics = step(state, batch)
    loss2 = float(metrics["total-loss"])
    step_s = time.time() - t0
    assert np.isfinite(loss2)

    infer = jax.jit(make_inference_fn(
        model, params, anchors, normalizer, compute_dtype=jnp.bfloat16))
    images = jnp.asarray(np.random.default_rng(0).uniform(
        0, 255, (max(1, bs // 2), h, w, 3)), jnp.float32)
    det = jax.tree_util.tree_map(np.asarray, infer(
        state.params, state.batch_stats, images))
    md = int(params.inference.max_detections)
    assert det["boxes"].shape[1:] == (md, 4)
    assert np.all(np.isfinite(det["scores"]))

    return {"bs": bs, "shape": f"{h}x{w}", "loss": round(loss, 4),
            "train_step_s": round(step_s, 3),
            "compile_s": round(compile_s, 1)}


def main():
    pat = sys.argv[1] if len(sys.argv) > 1 else ""
    paths = sorted(glob.glob("configs/*/*.json"))
    seen = set()
    ok = 0
    for p in paths:
        name = p.split("/")[-1]
        if pat and pat not in name:
            continue
        if name in seen:            # v3-8 / v3-32 duplicates
            continue
        seen.add(name)
        res = smoke(p)
        ok += 1
        print(f"OK {name}: {res}", flush=True)
    print(f"{ok} configs smoked")


if __name__ == "__main__":
    main()
