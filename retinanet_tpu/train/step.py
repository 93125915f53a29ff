"""The jitted train / eval step factories.

TPU-native redesign of the reference's Executor._train_step
(reference executor.py:409-441) + distributed_train_step (443-453):

  * ONE jitted program contains: device-side image normalization, anchor
    matching / label encoding (moved off host CPU — the reference's
    per-sample cost center), forward, loss, backward, gradient clipping and
    the optimizer update. XLA fuses across all of it.
  * Data parallelism is pure GSPMD: the batch arrives sharded over the
    'data' mesh axis, params replicated; XLA inserts the gradient
    all-reduce, the loss-normalizer global sum (reference
    retinanet_loss.py:46-49's explicit all_reduce) and sync-BN moment
    reductions (reference model/utils.py:7-22) automatically.
  * `steps_per_execution` (reference executor.py:605-621's on-device
    multi-step loop) maps to `lax.scan` over a leading step axis —
    see make_multi_step.
  * The whole TrainState is donated — parameters are updated in place.
  * Weight decay: explicit L2 penalty over conv kernels added to the loss
    (reference executor.py:296-327 semantics, applied to every param whose
    path ends in 'kernel').
"""

from __future__ import annotations

import re
from typing import Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

from retinanet_tpu.losses.losses import RetinaNetLoss
from retinanet_tpu.train.train_state import TrainState


def _conv_kernel_mask(params, exclude_regexes=()) -> list:
    """Leaves (by path) subject to weight decay: conv/dense kernels only —
    never BN scale/bias or conv biases (reference executor.py:301-327).
    `exclude_regexes` drops FROZEN kernels: the reference collects decay
    variables only from layers that are still trainable
    (executor.py:305-309), so frozen kernels contribute neither to the
    l2-regularization value nor (trivially) to any update."""
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    mask = []
    for key_path, _leaf in flat:
        path = "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in key_path)
        mask.append(path.endswith("kernel")
                    and not any(r.search(path) for r in exclude_regexes))
    return mask


def weight_decay_loss(params, alpha: float,
                      exclude_regexes=()) -> jnp.ndarray:
    """alpha * sum(l2_loss(kernel)) with l2_loss(x) = sum(x^2)/2
    (reference executor.py:296-299)."""
    flat, _ = jax.tree_util.tree_flatten(params)
    mask = _conv_kernel_mask(params, exclude_regexes)
    total = jnp.float32(0.0)
    for use, leaf in zip(mask, flat):
        if use:
            total += 0.5 * jnp.sum(jnp.square(leaf.astype(jnp.float32)))
    return alpha * total


def fold_micro_batches(batch: Dict, k: int) -> Dict:
    """[B, ...] -> [K, B/K, ...] micro-batch fold for gradient accumulation.

    The single source of truth for the layout contract shared with
    ``make_train_step``'s scan (which consumes the leading K axis); the
    Executor, __graft_entry__ and tools must all fold through here so the
    contract cannot drift between producers and the consumer.
    """
    return {key: v.reshape((k, v.shape[0] // k) + v.shape[1:])
            for key, v in batch.items()}


def make_frozen_bn_interceptor(regexes):
    """Frozen layers run their BatchNorm in INFERENCE mode.

    The reference freezes layers by setting `layer.trainable = False`
    (executor.py:154-176), and Keras BatchNormalization special-cases
    trainable=False to forward with MOVING statistics and skip the
    moving-stat update — so a frozen backbone's BN neither normalizes by
    batch moments nor advances its running stats. Optimizer masking alone
    reproduces neither; this interceptor forces
    `use_running_average=True` on every BatchNorm whose module path
    matches a freeze regex (caught by the lockstep training-dynamics
    harness: without it the bn_stats parameter-delta fingerprint is ~5x
    off under freeze_variables=['backbone'])."""
    from retinanet_tpu.models.layers import BatchNorm

    def interceptor(next_fun, args, kwargs, context):
        mod = context.module
        if (isinstance(mod, BatchNorm)
                and context.method_name == "__call__"):
            path = getattr(mod, "path", None)
            if path is None and mod.scope is not None:
                path = mod.scope.path
            # Param-path regexes (FREEZE_VARS_REGEX) are written against
            # leaf paths like 'backbone/stem_bn/scale' — some (e.g.
            # 'resnet_initial' = '^backbone/(stem|stem_bn)/') require a
            # trailing slash that a bare module path 'backbone/stem_bn'
            # lacks. Append one so module-path matching agrees with the
            # optimizer's param-path freeze mask.
            path_str = "/".join(str(p) for p in (path or ())) + "/"
            if any(r.search(path_str) for r in regexes):
                kwargs = dict(kwargs)
                kwargs["use_running_average"] = True
        return next_fun(*args, **kwargs)

    return interceptor


def make_train_step(model,
                    loss_fn: RetinaNetLoss,
                    encoder: Callable,
                    normalizer: Callable,
                    tx: optax.GradientTransformation,
                    schedule: Callable,
                    use_weight_decay: bool,
                    weight_decay_alpha: float,
                    compute_dtype=jnp.bfloat16,
                    ema_decay: Optional[float] = None,
                    grad_accum_steps: int = 1,
                    clipnorm: Optional[float] = None,
                    freeze_keys: Sequence[str] = ()):
    """Returns step(state, batch) -> (state, metrics). Jit with
    donate_argnums=(0,).

    ``grad_accum_steps > 1`` (training.grad_accum_steps) runs the configured
    batch as K sequential micro-batches inside ONE jitted step: the batch
    arrives stacked [K, B/K, ...], a lax.scan accumulates gradients in the
    carry (one extra grads-sized buffer — micro-batch activations, the
    high-res memory wall, are K x smaller), and a single optimizer update
    applies the mean gradient. Effective-batch semantics are preserved: the
    optimizer sees one step, the LR schedule advances once, EMA updates
    once. Intentional micro-batch granularity (documented, standard
    practice): BN batch moments and the focal-loss normalizer are computed
    per micro-batch, and BN running stats advance K times per step. The
    reference had no equivalent — its memory lever was a smaller global
    batch (README batch-size tables); this is the TPU-native one for
    high-res configs where activations, not weights, bind per-chip memory.
    """

    if freeze_keys:
        from retinanet_tpu.models.retinanet import FREEZE_VARS_REGEX
        wd_exclude = tuple(FREEZE_VARS_REGEX[k] for k in freeze_keys)
        from retinanet_tpu.optimizers.builder import freeze_mask_fn
        _trainable_mask_fn = freeze_mask_fn(freeze_keys)
        _frozen_bn = make_frozen_bn_interceptor(wd_exclude)
    else:
        wd_exclude = ()
        _trainable_mask_fn = None
        _frozen_bn = None

    def _apply(variables, images):
        if _frozen_bn is None:
            return model.apply(variables, images, train=True,
                               mutable=["batch_stats"])
        import flax.linen as nn
        with nn.intercept_methods(_frozen_bn):
            return model.apply(variables, images, train=True,
                               mutable=["batch_stats"])

    def grads_and_losses(params, batch_stats, norm_ema, batch):
        images = normalizer(batch["image"]).astype(compute_dtype)
        targets = encoder(batch["boxes"], batch["classes"], batch["valid"])

        def compute_loss(p):
            preds, mutated = _apply(
                {"params": p, "batch_stats": batch_stats}, images)
            losses, new_norm_ema = loss_fn(targets, preds, norm_ema)
            total = losses["weighted-loss"]
            if use_weight_decay:
                # constant across micro-batches, so the accumulated mean
                # gradient is exact (sum(g + wd)/K == mean(g) + wd)
                l2 = weight_decay_loss(p, weight_decay_alpha, wd_exclude)
                losses["l2-regularization"] = l2
                total = total + l2
            losses["total-loss"] = total
            return total, (losses, mutated["batch_stats"], new_norm_ema)

        return jax.grad(compute_loss, has_aux=True)(params)

    if clipnorm is not None:
        from retinanet_tpu.optimizers.builder import (
            clip_per_tensor_then_global)
        _clip_metric_tx = clip_per_tensor_then_global(float(clipnorm))

    def step(state: TrainState, batch: Dict) -> Tuple[TrainState, Dict]:
        if grad_accum_steps <= 1:
            grads, (losses, new_batch_stats, new_norm_ema) = (
                grads_and_losses(state.params, state.batch_stats,
                                 state.normalizer_ema, batch))
            batch_size = batch["image"].shape[0]
        else:
            # Shapes are static under jit, so this check costs nothing at
            # runtime and closes a silent-corruption hole: a batch stacked
            # with K' != grad_accum_steps micro-batches would accumulate K'
            # gradients but scale by 1/K — training at a wrong effective LR
            # with no error. Fold batches via fold_micro_batches.
            if batch["image"].shape[0] != grad_accum_steps:
                raise ValueError(
                    f"stacked batch has {batch['image'].shape[0]} "
                    f"micro-batches but the step was built with "
                    f"grad_accum_steps={grad_accum_steps}; the applied "
                    "gradient would be silently mis-scaled")
            # Zero-seeded accumulators (structure from eval_shape — costs a
            # trace, not a compile) so the compiled program contains exactly
            # ONE fwd+bwd instance: the scan body. Seeding by unrolling the
            # first micro-batch inline would compile the entire
            # forward+backward twice. Adding to zeros is bitwise-exact for
            # finite floats, so this is numerically identical to seeding
            # with the first micro-batch. batch_stats / normalizer_ema
            # thread sequentially through the carry, exactly as across
            # ordinary steps.
            shapes = jax.eval_shape(
                grads_and_losses, state.params, state.batch_stats,
                state.normalizer_ema,
                jax.tree_util.tree_map(lambda x: x[0], batch))
            g_shape, (l_shape, _, _) = shapes
            zeros = lambda tree: jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), tree)

            def body(carry, micro):
                g_acc, l_acc, bs, ne = carry
                g, (l, new_bs, new_ne) = grads_and_losses(
                    state.params, bs, ne, micro)
                g_acc = jax.tree_util.tree_map(jnp.add, g_acc, g)
                l_acc = jax.tree_util.tree_map(jnp.add, l_acc, l)
                return (g_acc, l_acc, new_bs, new_ne), None

            (grads, losses, new_batch_stats, new_norm_ema), _ = jax.lax.scan(
                body, (zeros(g_shape), zeros(l_shape), state.batch_stats,
                       state.normalizer_ema), batch)
            inv_k = jnp.float32(1.0 / grad_accum_steps)
            grads = jax.tree_util.tree_map(lambda g: g * inv_k, grads)
            # mean over micro-batches; per-image metrics below then divide
            # by the micro size, i.e. report per-image over the EFFECTIVE
            # batch: (sum/K) / (B/K) == sum / B
            losses = jax.tree_util.tree_map(lambda l: l * inv_k, losses)
            batch_size = batch["image"].shape[1]

        updates, new_opt_state = tx.update(
            grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        new_ema = state.ema_params
        if state.ema_params is not None and ema_decay is not None:
            # tfa MovingAverage with dynamic_decay: min(decay, (1+t)/(10+t))
            t = state.step.astype(jnp.float32)
            decay = jnp.minimum(ema_decay, (1.0 + t) / (10.0 + t))
            new_ema = jax.tree_util.tree_map(
                lambda e, p: e * decay + p * (1.0 - decay),
                state.ema_params, new_params)

        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
            ema_params=new_ema,
            normalizer_ema=(new_norm_ema if new_norm_ema is not None
                            else state.normalizer_ema),
        )

        metrics = dict(losses)
        # per-image normalizer count (reference executor.py:438)
        metrics["num-anchors-matched"] = (
            losses["num-anchors-matched"] / batch_size)
        # The reference logs the POST-clip global norm
        # (executor.py:440: global_norm(clipped gradients) * num_replicas).
        # Recompute the same per-tensor-then-global clip here for the
        # metric; XLA CSEs it against the identical clip inside tx.update,
        # so it costs nothing. No *num_replicas factor: the reference's
        # per-replica grads differentiate loss/num_replicas, while these
        # grads are already global-batch grads.
        g_metric = grads
        if _trainable_mask_fn is not None:
            # The reference differentiates only TRAINABLE variables
            # (executor.py:427-428), so frozen grads enter neither the
            # clip's global norm nor the logged metric. The optimizer path
            # already matches (optax.masked exposes only trainable leaves
            # to the clip chain); mask the metric the same way.
            mask = _trainable_mask_fn(grads)
            g_metric = jax.tree_util.tree_map(
                lambda g, keep: g if keep else jnp.zeros_like(g),
                grads, mask)
        if clipnorm is not None:
            clipped, _ = _clip_metric_tx.update(
                g_metric, _clip_metric_tx.init(None))
            metrics["gradient-norm"] = optax.global_norm(clipped)
        else:
            metrics["gradient-norm"] = optax.global_norm(g_metric)
        metrics["learning-rate"] = schedule(state.step)
        return new_state, metrics

    return step


def make_multi_step(step_fn: Callable):
    """steps_per_execution analog: scan `step_fn` over batches stacked on a
    leading axis; returns the LAST step's metrics (the reference reports a
    strategy MEAN of the final inner step — executor.py:450-452)."""

    def multi_step(state: TrainState, stacked_batch: Dict):
        def body(carry, batch):
            new_state, metrics = step_fn(carry, batch)
            return new_state, metrics

        state, metrics_seq = jax.lax.scan(body, state, stacked_batch)
        metrics = jax.tree_util.tree_map(lambda m: m[-1], metrics_seq)
        return state, metrics

    return multi_step


def make_eval_forward(model, compute_dtype=jnp.bfloat16):
    """Forward pass with frozen batch stats (training=False) producing raw
    per-level predictions; postprocessing attaches separately
    (see ops/postprocess.py)."""

    def forward(params, batch_stats, images):
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            images.astype(compute_dtype), train=False)

    return forward
