"""Verify the Pallas TPU kernels COMPILED on the real chip against their
XLA references (the compiled counterpart of tests/test_pallas_nms.py and
tests/test_pallas_matching.py, which run in interpret mode).

Three sections (select with --only nms|matcher|step|all):
  * nms:     the Pallas NMS kernel, lane by lane, hard + soft.
  * matcher: the anchor-matching kernel on adversarial cases — exact-tie
    IoUs (duplicate GTs; GT midway between two same-shape anchors), padded
    GT rows, 0 valid GTs, and the flagship 640 anchor count (76,725 >
    65,536) — asserting exact `matches` equality and bit-level max-IoU
    agreement vs the XLA matcher, plus one full train-step loss equality
    pallas-vs-XLA on chip.
  * step:    flagship 640x640 bs16 train-step time with the Pallas
    matcher ON vs OFF — the measured delta that justifies default-on
    (data/label_encoder.py:_use_pallas_matcher).

Usage: python tools/verify_pallas_tpu.py [--only all]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import retinanet_tpu.core.cache  # noqa: F401,E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from retinanet_tpu.ops.nms import nms_select  # noqa: E402
from retinanet_tpu.ops.pallas.nms_kernel import pallas_nms  # noqa: E402


def verify_nms():
    rng = np.random.default_rng(3)
    lanes, k = 40, 1000
    xy = rng.uniform(0, 0.8, (lanes, k, 2))
    wh = rng.uniform(0.02, 0.3, (lanes, k, 2))
    boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32).clip(0, 1)
    scores = rng.uniform(0, 1, (lanes, k)).astype(np.float32)
    for soft, sigma in [(False, 0.0), (True, 0.25)]:
        idx, sc, valid = jax.device_get(pallas_nms(
            jnp.asarray(boxes), jnp.asarray(scores), 100,
            iou_threshold=1.0 if soft else 0.5, score_threshold=0.1,
            soft_nms_sigma=sigma, soft=soft))
        bad = 0
        for lane in range(lanes):
            ref = nms_select(
                jnp.asarray(boxes[lane]), jnp.asarray(scores[lane]), 100,
                iou_threshold=1.0 if soft else 0.5, score_threshold=0.1,
                soft_nms_sigma=sigma, soft=soft)
            n = int(ref.valid)
            if int(valid[lane]) != n or not np.array_equal(
                    idx[lane][:n], np.asarray(ref.indices)[:n]):
                bad += 1
        status = "OK" if bad == 0 else f"{bad} MISMATCHED"
        print(f"TPU pallas NMS soft={soft}: {lanes - bad}/{lanes} lanes "
              f"exact [{status}]")
        if bad:
            raise SystemExit(1)


# ------------------------------------------------------------ matcher A/B

def _flagship_anchors():
    from __graft_entry__ import _flagship_params
    from retinanet_tpu.data import anchors as anchor_lib
    return anchor_lib.from_params(_flagship_params())


def _matcher_cases(anchors):
    """Adversarial GT sets for the flagship 640 anchor grid (A=76,725)."""
    size = 640.0
    rng = np.random.default_rng(11)

    def boxes(n):
        w = rng.uniform(8, 280, n).astype(np.float32)
        h = rng.uniform(8, 280, n).astype(np.float32)
        cx = rng.uniform(0, 1, n).astype(np.float32) * (size - w) + w / 2
        cy = rng.uniform(0, 1, n).astype(np.float32) * (size - h) + h / 2
        return np.stack([cx, cy, w, h], -1)

    cases = {}

    g = boxes(100)
    cases["random-dense G=100"] = (g, np.ones(100, bool))

    g = boxes(100)
    v = np.zeros(100, bool)
    v[:13] = True
    cases["valid-prefix 13/100"] = (g, v)

    cases["zero-valid"] = (boxes(100), np.zeros(100, bool))

    # per-anchor argmax ties: every GT duplicated (identical rows compute
    # identical IoU against every anchor in BOTH implementations by
    # construction) — first/lowest GT index must win in each.
    base = boxes(16)
    dup = np.repeat(base, 2, axis=0)
    cases["ties: duplicated GTs"] = (dup, np.ones(32, bool))

    # per-GT force-match ties: GTs with anchor-identical shape (area 1024,
    # ratio 1, scale 1 at level 3 => exactly 32x32 on an 8-px grid) whose
    # center sits exactly midway between two adjacent anchor centers —
    # both neighbours see the same intersection/union in exact f32
    # arithmetic (all coordinates are binary fractions), so each GT's best
    # anchor is a true tie; lowest flat anchor index must win in both.
    mids = []
    for i in (4, 17, 40):
        # anchor centers at (i + 0.5) * 8 -> midpoint (i + 1) * 8
        mids.append([(i + 1) * 8.0, (i + 0.5) * 8.0, 32.0, 32.0])
        mids.append([(i + 0.5) * 8.0, (i + 1) * 8.0, 32.0, 32.0])
    cases["ties: GT midway between anchors"] = (
        np.asarray(mids, np.float32), np.ones(len(mids), bool))

    return cases


def verify_matcher():
    from retinanet_tpu.data import label_encoder

    anchors = _flagship_anchors()
    a = jnp.asarray(anchors.boxes)
    num_a = a.shape[0]
    print(f"flagship anchors: A={num_a} (>65536: {num_a > 65536})")

    fail = False
    for name, (gt, valid) in _matcher_cases(anchors).items():
        outs = {}
        for lane in (True, False):
            m, mi = jax.jit(
                lambda g, v, lane=lane: label_encoder.match_anchors(
                    a, g, v, 0.5, 0.5, use_pallas=lane)
            )(jnp.asarray(gt), jnp.asarray(valid))
            outs[lane] = (np.asarray(m), np.asarray(mi))
        m_eq = np.array_equal(outs[True][0], outs[False][0])
        iou_diff = float(np.max(np.abs(outs[True][1] - outs[False][1])))
        ok = m_eq and iou_diff <= 1e-7
        fail |= not ok
        n_mismatch = int(np.sum(outs[True][0] != outs[False][0]))
        print(f"matcher [{name}]: matches "
              f"{'EXACT' if m_eq else f'{n_mismatch} MISMATCHED'}, "
              f"max|dIoU|={iou_diff:.2e} "
              f"[{'OK' if ok else 'FAIL'}]")
    if fail:
        raise SystemExit(1)

    # one full train step, pallas vs XLA matcher, identical init/batch:
    # every loss metric must agree (targets are identical when the matcher
    # is exact; residual diff is XLA fusion reordering between the two
    # compiled programs).
    state_p, metrics_p = _one_step(use_pallas=True, size=256, bs=2)
    state_x, metrics_x = _one_step(use_pallas=False, size=256, bs=2)
    for k in ("total-loss", "class-loss", "box-loss", "weighted-loss"):
        if k not in metrics_p:
            continue
        dp, dx = float(metrics_p[k]), float(metrics_x[k])
        rel = abs(dp - dx) / max(abs(dx), 1e-12)
        print(f"train-step loss [{k}]: pallas={dp:.8f} xla={dx:.8f} "
              f"rel={rel:.2e} [{'OK' if rel <= 1e-5 else 'FAIL'}]")
        if rel > 1e-5:
            raise SystemExit(1)
    # parameter deltas after the step must agree too (gradient path).
    pl_flat = jax.tree_util.tree_leaves(state_p.params)
    xl_flat = jax.tree_util.tree_leaves(state_x.params)
    worst = max(float(jnp.max(jnp.abs(p.astype(jnp.float32)
                                      - x.astype(jnp.float32))))
                for p, x in zip(pl_flat, xl_flat))
    print(f"train-step params: max|dtheta| after 1 step = {worst:.2e} "
          f"[{'OK' if worst <= 1e-5 else 'FAIL'}]")
    if worst > 1e-5:
        raise SystemExit(1)


def _build_step(use_pallas, size, bs, seed=0):
    from __graft_entry__ import _flagship_params
    from retinanet_tpu.data import anchors as anchor_lib
    from retinanet_tpu.data.label_encoder import make_batched_encoder
    from retinanet_tpu.data.preprocessing import make_device_normalizer
    from retinanet_tpu.data.synthetic import synthetic_train_batch
    from retinanet_tpu.losses.losses import RetinaNetLoss
    from retinanet_tpu.models.retinanet import build_model
    from retinanet_tpu.optimizers.builder import build_optimizer
    from retinanet_tpu.train import step as step_lib
    from retinanet_tpu.train.train_state import create_train_state

    params = _flagship_params(input_shape=(size, size))
    model = build_model(params)
    anchors = anchor_lib.from_params(params)
    encoder = make_batched_encoder(anchors, params.encoder_params,
                                   use_pallas=use_pallas)
    normalizer = make_device_normalizer(params)
    loss_fn = RetinaNetLoss(80, params.loss)
    tx, schedule = build_optimizer(
        params.training.optimizer, params.training.train_steps)
    variables = jax.jit(lambda k: model.init(
        k, jnp.zeros((1, size, size, 3)), train=False))(
        jax.random.PRNGKey(7))
    state = create_train_state(variables, tx)
    step = jax.jit(step_lib.make_train_step(
        model, loss_fn, encoder, normalizer, tx, schedule,
        use_weight_decay=True, weight_decay_alpha=1e-4,
        compute_dtype=jnp.bfloat16), donate_argnums=(0,))
    # batch and state live ON DEVICE: timing must not re-ship the 78 MB
    # batch through the tunnel every iteration (bench.py shards the same
    # way; measured 3.3 s/step vs 105 ms when left on host)
    batch = jax.device_put(
        {k: jnp.asarray(v) for k, v in synthetic_train_batch(
            bs, (size, size), 100, 80, seed=seed).items()})
    state = jax.device_put(state)
    return step, state, batch


def _one_step(use_pallas, size, bs):
    step, state, batch = _build_step(use_pallas, size, bs)
    state, metrics = step(state, batch)
    metrics = jax.device_get(metrics)
    return state, metrics


def verify_step_time():
    from retinanet_tpu.utils.benchmark import chained_step_time

    times = {}
    for lane in (True, False):
        step, state, batch = _build_step(lane, 640, 16)
        state, m = step(state, batch)     # compile
        float(m["total-loss"])
        dt, state = chained_step_time(step, state, batch, iters=10)
        times[lane] = dt
        del state
        print(f"640x640 bs16 train step, pallas_matcher={lane}: "
              f"{dt * 1000:.2f} ms ({16 / dt:.1f} imgs/s)")
    delta = times[False] - times[True]
    print(f"pallas matcher saves {delta * 1000:.2f} ms/step "
          f"({times[False] / times[True]:.3f}x) -> default-on "
          f"{'JUSTIFIED' if delta > 0 else 'NOT justified'}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--only", default="all",
                   choices=["nms", "matcher", "step", "all"])
    args = p.parse_args()
    t0 = time.time()
    if args.only in ("nms", "all"):
        verify_nms()
    if args.only in ("matcher", "all"):
        verify_matcher()
    if args.only in ("step", "all"):
        verify_step_time()
    print(f"[verify_pallas_tpu] done in {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
