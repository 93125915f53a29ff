"""Class-loss formulation experiments on the real train step.

Round-2 xplane profiling attributed ~12-15 ms of the ~108 ms step to the
class-loss one-hot machinery: XLA materializes three [B,80,80,9,80]
broadcasts in layout {2,4,3,1,0} (0.64 ms each), relayouts their
[B,80,80,720] bitcasts to the logits' {3,0,2,1} (1.17 ms each), and the
loss fusion saves a pred + an f32 [B,80,80,720] residual pair for the
backward (~370 MB round-trip).

Variants measured here (full train step, chained timing):
  base : current one-hot form (losses.class_loss)
  A    : single-broadcast pred-select form — one broadcast of the f32
         target (vs 3), comparisons inline, mask folded into the select
  B    : A + jax.checkpoint on the class loss (backward recomputes the
         elementwise chain from bf16 logits instead of saving f32
         residuals; the loss path is HBM-bound so recompute is ~free)
  C    : B + jax.checkpoint on box loss too

Usage: PYTHONPATH=/root/.axon_site:. python tools/loss_experiments.py
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import retinanet_tpu.core.cache  # noqa: F401

import functools

import jax
import jax.numpy as jnp

from retinanet_tpu.losses import losses as losses_lib


def class_loss_select(targets, predictions, num_classes, alpha, gamma,
                      label_smoothing):
    """Variant A: same math as losses.class_loss, one broadcast source.

    focal = select(pos, alpha*(1-p)^g * ce, (1-alpha)*p^g * ce) with
    ce = softplus(l) - l*y_smooth computed from the pos predicate inline;
    the only expanded operand is the f32 target [B,H,W,A,1].
    """
    total = 0.0
    for key, tgt in targets.items():
        b, h, w, a = tgt.shape
        logits = predictions[key].astype(jnp.float32).reshape(
            b, h, w, a, num_classes)
        tgt5 = tgt[..., None]
        iota = jax.lax.broadcasted_iota(jnp.float32, (1, 1, 1, 1,
                                                      num_classes), 4)
        pos = tgt5 == iota
        y_smooth_pos = 1.0 - 0.5 * label_smoothing
        y_smooth_neg = 0.5 * label_smoothing
        softplus = jnp.logaddexp(logits, 0.0)
        ce = jnp.where(pos, softplus - logits * y_smooth_pos,
                       softplus - logits * y_smooth_neg)
        p = jax.nn.sigmoid(logits)
        focal = jnp.where(
            pos,
            alpha * jnp.power(1.0 - p, gamma) * ce,
            (1.0 - alpha) * jnp.power(p, gamma) * ce)
        valid = tgt5 != -2.0
        total = total + jnp.sum(jnp.where(valid, focal, 0.0))
    return total


def class_loss_custom_vjp(targets, predictions, num_classes, alpha, gamma,
                          label_smoothing):
    """Variant D: select-form class loss with an analytic custom VJP.

    XLA's autodiff backward saves a (pred, f32) residual pair of the full
    (B,H,W,A*K) shape per level (~370 MB round-trip at 640/bs16). The
    analytic backward recomputes everything elementwise from the logits:

      neg: d/dl [(1-a) p^g ce]   = (1-a) p^g [g(1-p) ce + p - ls/2]
      pos: d/dl [a (1-p)^g ce]   = a (1-p)^g [-g p ce + p - 1 + ls/2]
      with ce = softplus(l) - l*y_s, p = sigmoid(l).
    """
    a_, g_, ls = float(alpha), float(gamma), float(label_smoothing)
    nc = int(num_classes)

    @jax.custom_vjp
    def cv(t, p):
        return class_loss_select(t, p, nc, a_, g_, ls)

    def fwd(t, p):
        return cv(t, p), (t, p)

    def bwd(res, g):
        t_all, p_all = res
        dpred = {}
        for key, tgt in t_all.items():
            b, h, w, a = tgt.shape
            logits = p_all[key].astype(jnp.float32).reshape(
                b, h, w, a, nc)
            iota = jax.lax.broadcasted_iota(
                jnp.float32, (1, 1, 1, 1, nc), 4)
            tgt5 = tgt[..., None]
            pos = tgt5 == iota
            y_s = jnp.where(pos, 1.0 - 0.5 * ls, 0.5 * ls)
            softplus = jnp.logaddexp(logits, 0.0)
            ce = softplus - logits * y_s
            p = jax.nn.sigmoid(logits)
            dneg = (1.0 - a_) * jnp.power(p, g_) * (
                g_ * (1.0 - p) * ce + p - 0.5 * ls)
            dpos = a_ * jnp.power(1.0 - p, g_) * (
                -g_ * p * ce + p - 1.0 + 0.5 * ls)
            d = jnp.where(pos, dpos, dneg)
            d = jnp.where(tgt5 != -2.0, d, 0.0)
            dpred[key] = (g * d).reshape(
                b, h, w, a * nc).astype(p_all[key].dtype)
        zeros_t = jax.tree_util.tree_map(jnp.zeros_like, t_all)
        return (zeros_t, dpred)

    cv.defvjp(fwd, bwd)
    return cv(targets, predictions)


def main():
    from __graft_entry__ import _flagship_params
    from retinanet_tpu.data import anchors as anchor_lib
    from retinanet_tpu.data.label_encoder import make_batched_encoder
    from retinanet_tpu.data.preprocessing import make_device_normalizer
    from retinanet_tpu.data.synthetic import synthetic_train_batch
    from retinanet_tpu.models.retinanet import build_model
    from retinanet_tpu.optimizers.builder import build_optimizer
    from retinanet_tpu.train import step as step_lib
    from retinanet_tpu.train.train_state import create_train_state
    from retinanet_tpu.utils.benchmark import chained_step_time

    params = _flagship_params()
    model = build_model(params)
    anchors = anchor_lib.from_params(params)
    encoder = make_batched_encoder(anchors, params.encoder_params)
    normalizer = make_device_normalizer(params)
    tx, schedule = build_optimizer(
        params.training.optimizer, params.training.train_steps)
    batch = {k: jnp.asarray(v) for k, v in
             synthetic_train_batch(16, (640, 640), 100, 80, seed=0).items()}

    results = {}
    original_class_loss = losses_lib.class_loss

    def run(name, class_loss_fn, ckpt_class=False, ckpt_box=False):
        if ckpt_class:
            base_cls = class_loss_fn

            def class_loss_fn(t, p, n, a, g, s):  # noqa: F811
                return jax.checkpoint(
                    lambda tt, pp: base_cls(tt, pp, n, a, g, s))(t, p)
        losses_lib.class_loss = class_loss_fn
        original_box = losses_lib.box_loss
        if ckpt_box:
            losses_lib.box_loss = lambda t, p, d: jax.checkpoint(
                lambda tt, pp: original_box(tt, pp, d))(t, p)
        try:
            loss_fn = losses_lib.RetinaNetLoss(80, params.loss)
            step = jax.jit(
                step_lib.make_train_step(
                    model, loss_fn, encoder, normalizer, tx, schedule,
                    use_weight_decay=True, weight_decay_alpha=1e-4,
                    compute_dtype=jnp.bfloat16),
                donate_argnums=(0,))
            # donation consumes the state's buffers — fresh init per run
            variables = jax.jit(lambda k: model.init(
                k, jnp.zeros((1, 640, 640, 3)), train=False))(
                    jax.random.PRNGKey(0))
            state = create_train_state(variables, tx)
            state, metrics = step(state, batch)
            loss0 = float(metrics["total-loss"])
            gn = float(metrics["gradient-norm"])
            dt, state = chained_step_time(step, state, batch, iters=20)
            results[name] = (dt * 1000, loss0)
            print(f"{name:6s}  {dt*1000:7.2f} ms/step  loss0={loss0:.6f}  "
                  f"grad-norm={gn:.4f}  imgs/s={16/dt:.1f}", flush=True)
        finally:
            losses_lib.class_loss = original_class_loss
            losses_lib.box_loss = original_box

    # analytic-VJP gradient correctness on a small random instance
    rng = jax.random.PRNGKey(5)
    t_small = {"3": jnp.asarray(
        jax.random.randint(rng, (2, 4, 4, 9), -2, 5), jnp.float32)}
    p_small = {"3": jax.random.normal(rng, (2, 4, 4, 9 * 80), jnp.float32)}
    g_auto = jax.grad(lambda p: class_loss_select(
        t_small, p, 80, 0.25, 1.5, 0.0))(p_small)
    g_cv = jax.grad(lambda p: class_loss_custom_vjp(
        t_small, p, 80, 0.25, 1.5, 0.0))(p_small)
    import numpy as np
    err = float(jnp.max(jnp.abs(g_auto["3"] - g_cv["3"])))
    print(f"custom-vjp grad max err vs autodiff: {err:.2e}", flush=True)
    assert err < 2e-4, err

    run("base", original_class_loss)
    run("A", class_loss_select)
    run("B", class_loss_select, ckpt_class=True)
    run("C", class_loss_select, ckpt_class=True, ckpt_box=True)
    run("D", class_loss_custom_vjp)

    print("\nsummary:")
    for name, (ms, loss0) in results.items():
        print(f"  {name:6s} loss0={loss0:.6f}")


if __name__ == "__main__":
    main()
