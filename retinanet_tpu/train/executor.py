"""Executor: training / evaluation / continuous-eval driver.

Capability parity with reference retinanet/executor.py:17-778, redesigned
TPU-native:

  * ONE jitted, state-donating train step (forward+loss+backward+update and
    on-device label encoding fused by XLA) instead of strategy.run inside
    tf.function (ref:409-453). `steps_per_execution` is available via
    lax.scan multi-stepping (train/step.py:make_multi_step) but per-step
    dispatch already keeps the TPU busy thanks to JAX async dispatch.
  * GSPMD data parallelism over a 1-D mesh (parallel/mesh.py) instead of
    TPUStrategy (ref distribute.py) — gradient all-reduce, sync-BN and the
    loss-normalizer sum are inserted by the XLA partitioner.
  * Orbax checkpointing of the full TrainState {params, batch_stats,
    opt_state, step, EMA} (ref save_weights/restore, ref:221-253, 649-654);
    resume picks the latest step; the recovery path rewinds one
    save-interval (ref train() retry loop, ref:705-734).
  * Loss-inflection auto-recovery (ref:679-687 + loss_diagnostics.py).
  * EMA weight swap for eval (ref:255-267, 477-478).
  * Profiler window via jax.profiler (ref:547-560, 598-629).
  * Metrics: JSONL + TensorBoard scalars, EMA imgs/s + ETA console logs,
    optional Discord webhook (ref:346-383, 637-677).
"""

from __future__ import annotations

import json
import os
import signal
import threading
import time
from typing import Callable, Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
from absl import logging

from retinanet_tpu.core.config import ConfigDict
from retinanet_tpu.data import anchors as anchor_lib
from retinanet_tpu.data.label_encoder import make_batched_encoder
from retinanet_tpu.data.prefetch import DevicePrefetcher
from retinanet_tpu.data.preprocessing import make_device_normalizer
from retinanet_tpu.eval.coco_evaluator import COCOEvaluator
from retinanet_tpu.losses.losses import RetinaNetLoss
from retinanet_tpu.models.retinanet import build_model, _compute_dtype
from retinanet_tpu.ops.postprocess import make_inference_fn
from retinanet_tpu.optimizers.builder import build_optimizer
from retinanet_tpu.parallel import mesh as mesh_lib
from retinanet_tpu.train import step as step_lib
from retinanet_tpu.train.diagnostics import (
    AverageMeter, DiscordLogger, InflectionDetector, MetricsLogger,
    format_eta)
from retinanet_tpu.train.train_state import TrainState, create_train_state

_RUN_MODES = ("train", "val", "train_val", "continuous_eval", "export")


def agree_preemption(local_flag: bool) -> bool:
    """Cross-process OR of the per-host SIGTERM flag.

    Signal delivery on a pod is per-host and unsynchronized; every host
    must act on the SAME verdict at the SAME step boundary or one host
    exits into the collective checkpoint save while the rest dispatch
    the next step's all-reduce (distributed deadlock). Hosts call this
    at a deterministic cadence (see _training_trial), so the allgather
    itself lines up. Exposed at module level so the true 2-process
    harness (tools/multiprocess_smoke.py) exercises the production
    agreement path.
    """
    from jax.experimental import multihost_utils
    return bool(np.any(multihost_utils.process_allgather(
        np.asarray([bool(local_flag)]))))


class Executor:
    def __init__(self,
                 params: ConfigDict,
                 run_mode: str,
                 model_dir: Optional[str] = None,
                 resume_from: Optional[str] = None,
                 is_multi_host: bool = False,
                 train_input_fn: Optional[Callable[[], Iterator]] = None,
                 val_input_fn: Optional[Callable[[], Iterator]] = None,
                 max_boxes: Optional[int] = None,
                 enable_tensorboard: bool = True,
                 enable_weights_info: bool = False):
        if run_mode not in _RUN_MODES:
            raise ValueError(f"run_mode must be one of {_RUN_MODES}")
        self.params = params
        self.run_mode = run_mode
        self.is_multi_host = is_multi_host
        self.train_input_fn = train_input_fn
        self.val_input_fn = val_input_fn
        # padded-GT row count: ctor override wins, else the config's
        # encoder_params.max_boxes (a schema key this framework added —
        # static GT shapes are a TPU need the reference didn't have)
        self.max_boxes = int(max_boxes if max_boxes is not None
                             else params.encoder_params.get("max_boxes", 100))

        self.model_dir = os.path.abspath(
            model_dir or os.path.join(
                params.experiment.get("model_dir", "model_files"),
                params.experiment.name))
        os.makedirs(self.model_dir, exist_ok=True)
        self.resume_from = resume_from
        # dump the validated config next to the checkpoints so a run is
        # self-describing (reference executor.py:283-288); chief only on
        # multi-process so hosts don't race the write
        if jax.process_index() == 0:
            cfg_path = os.path.join(
                self.model_dir, f"{params.experiment.name}.json")
            with open(cfg_path, "w") as f:
                json.dump(params.to_dict(), f, indent=4)

        t = params.training
        self.train_steps = int(t.train_steps)
        self.steps_per_execution = int(t.get("steps_per_execution", 1))
        self.grad_accum = max(1, int(t.get("grad_accum_steps", 1)))
        self.save_every = int(t.save_every)
        self.val_freq = int(t.get("validation_freq", -1))
        self.validation_samples = int(t.get("validation_samples", -1))
        self.batch_size = dict(t.batch_size)
        self.use_ema = bool(t.optimizer.get("use_moving_average", False))
        self.ema_decay = float(t.optimizer.get("moving_average_decay", 0.0))
        # per-leg wall-clock breakdown of the most recent evaluate() call
        self.last_eval_timing: Optional[Dict[str, float]] = None

        mesh_lib.resolve_strategy(t.get("strategy", {}))
        self.mesh = mesh_lib.create_mesh(
            spatial=int(t.get("spatial_partition", 1)))
        if self.grad_accum > 1:
            local_bs = mesh_lib.local_batch_size(
                int(self.batch_size["train"]))
            if local_bs % self.grad_accum:
                raise ValueError(
                    f"per-host train batch {local_bs} not divisible by "
                    f"grad_accum_steps={self.grad_accum}")
            # The MICRO batch must still split over this host's device
            # share, or shard_batch silently replicates it onto every chip
            # — inflating per-chip activation memory by n_dev x instead of
            # shrinking it by K, the exact opposite of what the user
            # configured grad accumulation for. Fail at init, not at the
            # first batch (multi-process) or silently (single-process).
            micro = local_bs // self.grad_accum
            dev_share = max(1, self.mesh.shape[mesh_lib.DATA_AXIS]
                            // jax.process_count())
            if micro % dev_share:
                raise ValueError(
                    f"micro-batch {micro} (per-host train batch {local_bs}"
                    f" / grad_accum_steps={self.grad_accum}) not divisible"
                    f" by this host's data-axis device share ({dev_share});"
                    " the micro-batch could not be sharded and would be"
                    " replicated on every chip, inflating per-chip memory"
                    " instead of reducing it")
        self.compute_dtype = _compute_dtype(params.floatx.precision)

        # -- model / loss / optimizer ----------------------------------------
        self.model = build_model(params)
        self.anchors = anchor_lib.from_params(params)
        self.encoder = make_batched_encoder(
            self.anchors, params.encoder_params,
            use_iou_targets=bool(
                params.architecture.auxillary_head.use_auxillary_head))
        self.normalizer = make_device_normalizer(params)
        self.loss_fn = RetinaNetLoss(
            int(params.architecture.head.num_classes), params.loss)
        self.tx, self.schedule = build_optimizer(
            t.optimizer, self.train_steps,
            freeze_variables=list(t.get("freeze_variables", [])),
            precision=params.floatx.precision)

        base_step = step_lib.make_train_step(
            self.model, self.loss_fn, self.encoder, self.normalizer,
            self.tx, self.schedule,
            use_weight_decay=bool(t.use_weight_decay),
            weight_decay_alpha=float(t.weight_decay_alpha),
            compute_dtype=self.compute_dtype,
            ema_decay=self.ema_decay if self.use_ema else None,
            grad_accum_steps=self.grad_accum,
            clipnorm=t.optimizer.get("clipnorm", None),
            freeze_keys=list(t.get("freeze_variables", [])))
        # steps_per_execution > 1: one on-device lax.scan dispatch over a
        # stack of host batches (reference executor.py:605-621's multi-step
        # tf.function loop). One host->device transfer + one metrics fetch
        # per `spe` optimizer steps.
        if self.steps_per_execution > 1:
            self._train_step = jax.jit(
                step_lib.make_multi_step(base_step), donate_argnums=(0,))
            for knob, value in (("save_every", self.save_every),
                                ("validation_freq", self.val_freq)):
                if value > 0 and value % self.steps_per_execution:
                    logging.warning(
                        "%s=%d is not a multiple of steps_per_execution=%d;"
                        " it will trigger on the next multiple", knob, value,
                        self.steps_per_execution)
        else:
            self._train_step = jax.jit(base_step, donate_argnums=(0,))

        self._inference_fn = None  # built lazily for eval
        # background AOT compile of the eval inference fn (see
        # _prestart_eval_compile): the XLA compile of the full
        # inference pipeline takes minutes on tunneled runtimes, and the
        # reference paid it as a chief stall at the FIRST in-loop eval
        # (reference executor.py:472-545 compiles serving graphs at first
        # use). Overlapping it with early training steps removes the
        # stall entirely.
        self._inference_aot = None
        self._eval_compile_thread: Optional[threading.Thread] = None

        # -- checkpointing -----------------------------------------------------
        import orbax.checkpoint as ocp
        self._ocp = ocp
        self.ckpt_dir = os.path.join(self.model_dir, "checkpoints")
        self.ckpt_manager = ocp.CheckpointManager(
            self.ckpt_dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=10, create=True,
                # periodic saves overlap the disk write with training
                # (_save_checkpoint blocking=False); durability-critical
                # saves (preemption/final/rewind) wait explicitly
                enable_async_checkpointing=True))

        # -- observability ------------------------------------------------------
        # chief-only sinks: on a pod every host runs this loop against one
        # shared model_dir — P hosts appending to one JSONL / TB event file
        # would interleave garbage, and P identical Discord posts per eval
        # would spam (the reference never hit this: its TF2 pod runs had a
        # single coordinator process writing summaries)
        is_chief = jax.process_index() == 0
        tb_root = str(params.experiment.get("tensorboard_dir", "") or "")
        self.metrics = MetricsLogger(
            os.path.join(self.model_dir, "logs"), "train",
            use_tensorboard=enable_tensorboard, enabled=is_chief,
            tensorboard_dir=os.path.join(
                tb_root, params.experiment.name, "train") if tb_root else "")
        self.discord = DiscordLogger(enabled_flag=is_chief)
        rec = t.recovery
        self._use_inflection = bool(rec.use_inflection_detector)
        self._inflection = InflectionDetector(
            rec.metric_key, float(rec.threshold)) if self._use_inflection \
            else None
        self._max_trials = int(rec.get("max_trials", 1))
        self._current_trial = 1
        self._profile_start_step = int(
            os.environ.get("PROFILE_START_STEP", 10))
        self._profile_end_step = int(os.environ.get("PROFILE_END_STEP", 12))
        self._profiling = False
        self.enable_weights_info = enable_weights_info

        self.state: Optional[TrainState] = None
        self._setup_state()

    # ------------------------------------------------------------------ state

    def _init_state(self) -> TrainState:
        h, w = self.params.input.input_shape
        dummy = jnp.zeros((1, int(h), int(w),
                           int(self.params.input.channels)), jnp.float32)
        variables = jax.jit(
            lambda k: self.model.init(k, dummy, train=False))(
                jax.random.PRNGKey(
                    int(self.params.experiment.get("seed", 0))))
        state = create_train_state(
            variables, self.tx, use_ema=self.use_ema,
            use_normalizer_ema=self.loss_fn.use_moving_average)
        return jax.device_put(state, mesh_lib.replicated(self.mesh))

    def _setup_state(self) -> None:
        self.state = self._init_state()
        restored = False
        if self.resume_from is not None:
            self._restore_checkpoint(step=int(self.resume_from))
            restored = True
        elif (self.params.training.restore_checkpoint
                and self.latest_checkpoint_step() is not None):
            self._restore_checkpoint(step=self.latest_checkpoint_step())
            restored = True
        if not restored:
            self._maybe_load_pretrained()

    def _maybe_load_pretrained(self) -> None:
        """Backbone-checkpoint init (reference resnet.py:403-409) and
        fine-tuning from a full pretrained artifact with skip-mismatch
        semantics (reference executor.py:115-121)."""
        import flax.serialization

        bb_ckpt = self.params.architecture.backbone.get("checkpoint", "")
        ft = self.params.fine_tuning
        src = None
        if ft.get("fine_tune", False) and ft.get("pretrained_checkpoint"):
            src, scope = ft.pretrained_checkpoint, None
        elif bb_ckpt:
            src, scope = bb_ckpt, "backbone"
        if not src:
            return
        path = src if src.endswith(".msgpack") else os.path.join(
            src, "params.msgpack")
        if not os.path.exists(path):
            raise FileNotFoundError(f"pretrained weights not found: {path}")
        with open(path, "rb") as f:
            loaded = flax.serialization.msgpack_restore(f.read())

        def _merge(dst, srct, prefix=""):
            merged = dict(dst)
            matched, skipped = 0, 0
            for key, value in srct.items():
                if key not in dst:
                    skipped += 1
                    continue
                if isinstance(value, dict) and isinstance(dst[key], dict):
                    merged[key], m, s = _merge(dst[key], value,
                                               f"{prefix}{key}/")
                    matched += m
                    skipped += s
                elif (hasattr(value, "shape")
                        and getattr(dst[key], "shape", None) == value.shape):
                    merged[key] = value.astype(dst[key].dtype)
                    matched += 1
                else:
                    skipped += 1  # shape mismatch: skip (load by-name)
            return merged, matched, skipped

        params = jax.device_get(self.state.params)
        stats = jax.device_get(self.state.batch_stats)
        src_params = loaded.get("params", loaded)
        src_stats = loaded.get("batch_stats", {})
        if scope == "backbone":
            src_params = {"backbone": src_params.get("backbone", src_params)}
            src_stats = {"backbone": src_stats.get("backbone", src_stats)}
        params, m1, s1 = _merge(params, src_params)
        stats, m2, s2 = _merge(stats, src_stats)
        logging.info(
            "Loaded pretrained weights from %s: %d tensors matched, "
            "%d skipped", path, m1 + m2, s1 + s2)
        self.state = self.state.replace(
            params=jax.device_put(
                params, mesh_lib.replicated(self.mesh)),
            batch_stats=jax.device_put(
                stats, mesh_lib.replicated(self.mesh)))

    def latest_checkpoint_step(self) -> Optional[int]:
        # an async save may still be committing its metadata — settle first
        # so "latest" never names a partially-written step
        self.ckpt_manager.wait_until_finished()
        return self.ckpt_manager.latest_step()

    def _save_checkpoint(self, step: int, blocking: bool = True) -> None:
        """Checkpoint the full TrainState (reference save_weights,
        ref:649-654).

        Periodic in-loop saves run with ``blocking=False``: the device
        snapshot (``jax.device_get`` — mandatory, the step donates the
        state buffers) stays synchronous but orbax serializes it to disk
        on a background thread, so the train loop only stalls for the
        D2H fetch instead of the full disk write. Preemption, rewind and
        final saves stay blocking — those paths exit or restore
        immediately after, so the write must be durable first.
        """
        self.ckpt_manager.save(
            step, args=self._ocp.args.StandardSave(
                jax.device_get(self.state)))
        if blocking:
            self.ckpt_manager.wait_until_finished()

    def _restore_checkpoint(self, step: int) -> None:
        self.ckpt_manager.wait_until_finished()  # settle in-flight saves
        # Abstract tree from array metadata only: shapes/dtypes are known
        # without forcing the freshly-initialized device state to the host
        # (a full-TrainState D2H is ~275 MB for the flagship — minutes
        # over a thin-transport runtime — and its VALUES are about to be
        # overwritten by the restore anyway).
        abstract = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(
                jnp.shape(x), getattr(x, "dtype", None)
                or np.asarray(x).dtype),
            self.state)
        restored = self.ckpt_manager.restore(
            step, args=self._ocp.args.StandardRestore(abstract))
        self.state = jax.device_put(
            restored, mesh_lib.replicated(self.mesh))
        logging.info("Restored checkpoint at step %d from %s",
                     step, self.ckpt_dir)

    # ------------------------------------------------------------------ train

    def run(self):
        if self.run_mode in ("train", "train_val"):
            return self.train()
        if self.run_mode == "val":
            return self.evaluate()
        if self.run_mode == "continuous_eval":
            return self.continuous_evaluate()
        raise ValueError(f"run() not supported for mode {self.run_mode}")

    def _maybe_profile(self, step: int) -> None:
        spe = self.steps_per_execution
        if step == spe * self._profile_start_step and not self._profiling:
            profile_dir = os.path.join(self.model_dir, "profile")
            logging.info("Starting profiler at step %d -> %s",
                         step, profile_dir)
            jax.profiler.start_trace(profile_dir)
            self._profiling = True
        elif step >= spe * self._profile_end_step and self._profiling:
            jax.profiler.stop_trace()
            self._profiling = False
            logging.info("Stopped profiler at step %d", step)

    def _run_training_loop(self) -> bool:
        """Body of one training trial, wrapped in a SIGTERM trap.

        Cloud TPU / GCE maintenance and spot preemption deliver SIGTERM
        with a grace window before the VM dies. The trap checkpoints at
        the next step boundary and returns cleanly so a relaunch resumes
        exactly where the run stopped — the reference had no handler and
        lost up to `save_every` steps on every preemption (reference
        executor.py:280-281 restores only whatever the periodic save
        left). Each pod host traps its own signal; multi-process runs
        agree on the flag via a scheduled allgather before acting (see
        the loop body), so every host enters the collective orbax save
        at the same step.
        """
        self._preempt_requested = False

        def _on_sigterm(signum, frame):
            del signum, frame
            self._preempt_requested = True
            logging.warning(
                "SIGTERM: will checkpoint at the next step boundary "
                "and exit cleanly")

        try:
            prev_sigterm = signal.signal(signal.SIGTERM, _on_sigterm)
        except ValueError:  # not on the main thread (embedded/test use)
            prev_sigterm = None
        try:
            return self._training_trial()
        finally:
            if prev_sigterm is not None:
                signal.signal(signal.SIGTERM, prev_sigterm)

    def _training_trial(self) -> bool:
        state = self.state
        current = int(state.step)
        if current >= self.train_steps:
            logging.info("Training already completed at step %d", current)
            return True

        train_iter = iter(self.train_input_fn())
        meter = AverageMeter()
        global_bs = int(self.batch_size["train"])

        # overlap the eval-inference compile with the first training
        # steps so the first validation_freq eval doesn't stall the chief
        if self.val_input_fn is not None and self.val_freq > 0:
            self._prestart_eval_compile()

        logging.info(
            "Starting training from step %d for %d steps (trial %d/%d)",
            current, self.train_steps, self._current_trial, self._max_trials)

        spe = max(self.steps_per_execution, 1)
        multi_step = self.steps_per_execution > 1
        # Metric-fetch cadence: with spe == 1, fetching every step would
        # block on a device round trip per step and serialize async
        # dispatch (round-2 review weak #5). `training.log_every` decouples
        # it (default 20); multi-step configs already fetch once per scan.
        log_every = spe if multi_step else max(
            1, int(self.params.training.get("log_every", 20)))
        if self._use_inflection and not multi_step:
            # the detector samples the watched metric at the log cadence;
            # the reference checked EVERY outer step (spe=1 -> every
            # step). A 20-step cadence would miss short divergence spikes
            # entirely, so detector users pay the per-step fetch.
            log_every = 1
        accum = self.grad_accum

        def _fold_accum(b):
            # grad accumulation: [B, ...] -> [K, B/K, ...]; the step scans
            # the K micro-batches and applies one optimizer update
            return step_lib.fold_micro_batches(b, accum)

        def make_batch():
            if multi_step:
                # one scan dispatch over `spe` stacked host batches
                host_batches = [next(train_iter) for _ in range(spe)]
                if accum > 1:
                    host_batches = [_fold_accum(b) for b in host_batches]
                stacked = {k: np.stack([b[k] for b in host_batches])
                           for k in host_batches[0]}
                return mesh_lib.shard_batch(
                    stacked, self.mesh,
                    leading_dims=2 if accum > 1 else 1)
            if accum > 1:
                return mesh_lib.shard_batch(
                    _fold_accum(next(train_iter)), self.mesh, leading_dims=1)
            return mesh_lib.shard_batch(next(train_iter), self.mesh)

        # device prefetch: stage sharded batches onto the devices a few
        # deep in a background thread so the H2D copy of batch N+1 rides
        # under the device step for batch N (tf.data prefetch + infeed
        # analog; see data/prefetch.py)
        depth = int(self.params.training.get("device_prefetch", 2))
        batches = (DevicePrefetcher(make_batch, depth) if depth > 0
                   else iter(make_batch, None))
        try:
            return self._trial_loop(batches, state, meter, global_bs,
                                    current, spe, multi_step, log_every)
        finally:
            if isinstance(batches, DevicePrefetcher):
                batches.close()

    def _trial_loop(self, batches, state, meter, global_bs, current,
                    spe, multi_step, log_every) -> bool:
        while current < self.train_steps:
            t0 = time.time()
            sharded = next(batches)
            state, metrics = self._train_step(state, sharded)
            self._maybe_profile(current)
            prev = current
            current += spe
            self.state = state

            # Fetch metrics to host only at logging cadence — each fetch is
            # a device round trip and would otherwise serialize the async
            # dispatch pipeline (the reference's steps_per_execution solved
            # the same problem on the TF side, executor.py:605-621).
            should_log = (current % log_every == 0
                          or current >= self.train_steps)

            # Preemption: signal delivery is per-host and unsynchronized —
            # acting on the local flag alone would have one host exit into
            # the collective save while others dispatch the next step's
            # all-reduce (distributed deadlock). Multi-process runs agree
            # on the flag with a tiny allgather at a DETERMINISTIC cadence
            # (every outer step when spe > 1, else the log cadence, so
            # spe=1 async dispatch is not serialized by a per-step host
            # collective); hosts are in lockstep on `current`, so every
            # host then saves the same step. Worst-case reaction latency
            # is one log interval — well inside a preemption grace window.
            if jax.process_count() > 1:
                preempt = (agree_preemption(self._preempt_requested)
                           if (multi_step or should_log) else False)
            else:
                preempt = self._preempt_requested
            if preempt:
                if self._profiling:
                    jax.profiler.stop_trace()
                    self._profiling = False
                current = int(state.step)  # sync: step actually applied
                self._save_checkpoint(current)
                logging.warning(
                    "Preemption checkpoint saved at step %d; exiting "
                    "cleanly (relaunch resumes from here)", current)
                return True
            if should_log:
                metrics = jax.device_get(metrics)
                current = int(state.step)
            dt = time.time() - t0
            meter.accumulate(1.0 / dt)
            imgs_per_sec = meter.averaged_value * global_bs * spe
            eta = format_eta(
                (self.train_steps - current)
                / max(meter.averaged_value * spe, 1e-6))

            if should_log:
                metrics["execution-time"] = round(dt, 4)
                self.metrics.log(current, metrics)
                logging.info(
                    "[trial %d/%d][step %d/%d][ETA %s][%.1f imgs/s] %s",
                    self._current_trial, self._max_trials, current,
                    self.train_steps, eta, imgs_per_sec,
                    {k: round(float(v), 4) for k, v in metrics.items()})

            def _crossed(interval: int) -> bool:
                # robust to `spe`-sized step jumps that skate over the
                # exact multiple
                return interval > 0 and (current // interval) > (
                    prev // interval)

            if self.save_every and _crossed(self.save_every):
                self._save_checkpoint(current, blocking=False)

            if (self.enable_weights_info
                    and _crossed(50 * max(self.steps_per_execution, 1))):
                self._write_weights_info(current)

            if self._use_inflection and should_log:
                # checked at the same cadence as the reference's outer step
                value = float(metrics.get(self._inflection.name, 0.0))
                if self._inflection.is_value_anomalous(value):
                    logging.warning(
                        "Inflection detected in %s; recent: %s",
                        self._inflection.name, self._inflection.data[-5:])
                    self._current_trial += 1
                    return False

            if (self.val_freq > 0 and _crossed(self.val_freq)
                    and "val" in self.run_mode):
                self.evaluate()

        logging.info("Saving final checkpoint at step %d", current)
        self._save_checkpoint(current)
        if "val" in self.run_mode and self.val_freq <= 0:
            self.evaluate()
        return True

    def train(self):
        """Training with inflection-recovery retries: on anomaly, rewind to
        the checkpoint one save-interval before latest
        (reference executor.py:705-734)."""
        if self.train_input_fn is None:
            raise ValueError("train_input_fn is required for training")
        done = self._run_training_loop()
        while not done and self._current_trial <= self._max_trials:
            latest = self.latest_checkpoint_step()
            if latest is not None:
                rewind = self.save_every * ((latest // self.save_every) - 1)
                if rewind <= 0:
                    break
                steps = self.ckpt_manager.all_steps()
                target = max((s for s in steps if s <= rewind), default=None)
                if target is None:
                    break
                self._restore_checkpoint(step=target)
            if self._inflection is not None:
                self._inflection.reset()
            done = self._run_training_loop()
        if not done:
            logging.warning("Training failed after %d trials",
                            self._current_trial)
        return done

    # ------------------------------------------------------------------- eval

    def _build_inference(self):
        if self._inference_fn is None:
            infer = make_inference_fn(
                self.model, self.params, self.anchors, self.normalizer,
                compute_dtype=self.compute_dtype)
            self._inference_fn = jax.jit(infer)
        return self._inference_fn

    def _eval_image_aval(self):
        """ShapeDtypeStruct (with sharding) of one staged eval batch."""
        h, w = (int(self.params.input.input_shape[0]),
                int(self.params.input.input_shape[1]))
        bs = int(self.batch_size["val"])
        # materialize one zeros batch through the real staging path to
        # read the exact sharding the eval loop will use (transient
        # bs*h*w*3 bytes on device, freed immediately)
        probe = mesh_lib.shard_global_batch(
            {"image": np.zeros((bs, h, w, 3), np.uint8)}, self.mesh)["image"]
        aval = jax.ShapeDtypeStruct(probe.shape, probe.dtype,
                                    sharding=probe.sharding)
        del probe
        return aval

    def _prestart_eval_compile(self) -> None:
        """Kick off the eval-inference XLA compile in a background thread.

        Called at the start of a training trial when in-loop evaluation
        is configured: the AOT compile (jit.lower().compile()) runs
        concurrently with the first training steps, so the first
        `validation_freq` eval dispatches a ready executable instead of
        stalling the chief for the full compile (minutes on tunneled
        runtimes; the reference paid this stall at first eval). Uses
        only abstract avals — no device memory, no reference to live
        (donated) state buffers. On any failure the eval path falls back
        to the ordinary jit compile."""
        if self._inference_aot is not None or (
                self._eval_compile_thread is not None
                and self._eval_compile_thread.is_alive()):
            return
        infer = self._build_inference()
        try:
            params_aval, stats_aval = jax.tree_util.tree_map(
                lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype,
                                               sharding=a.sharding),
                (self._eval_params(), self.state.batch_stats))
            image_aval = self._eval_image_aval()
        except Exception:
            logging.exception("eval precompile: aval construction failed; "
                              "first eval will compile inline")
            return

        def _work():
            try:
                t0 = time.perf_counter()
                self._inference_aot = infer.lower(
                    params_aval, stats_aval, image_aval).compile()
                logging.info("eval inference precompiled in %.1fs "
                             "(overlapped with training)",
                             time.perf_counter() - t0)
            except Exception:
                logging.exception("eval precompile failed; first eval "
                                  "will compile inline")

        self._eval_compile_thread = threading.Thread(
            target=_work, name="eval-precompile", daemon=True)
        self._eval_compile_thread.start()

    def _eval_params(self):
        """EMA swap-in for evaluation when configured (ref:255-267)."""
        if self.use_ema and self.state.ema_params is not None:
            return self.state.ema_params
        return self.state.params

    def evaluate(self) -> Dict[str, float]:
        """Run COCO evaluation over the validation set.

        Multi-host design: every host iterates the SAME full val set
        (deterministic order) and contributes its 1/P slice of each batch
        via `shard_global_batch` — each image enters the global batch
        exactly once. Detections are gathered back to every host, but only
        process 0 accumulates, writes predictions and computes/logs scores
        (the reference distributed one val dataset and gathered on the
        chief: reference executor.py:178-202, 393-399). Non-chief
        processes return {}.
        """
        if self.val_input_fn is None:
            raise ValueError("val_input_fn is required for evaluation")
        # prefer the background-precompiled executable (see
        # _prestart_eval_compile); join first so an in-flight compile
        # finishes rather than racing a second inline compile of the
        # same program
        if (self._eval_compile_thread is not None
                and self._eval_compile_thread.is_alive()):
            self._eval_compile_thread.join()
        aot = [self._inference_aot]
        if aot[0] is None:
            self._build_inference()  # trace once, ahead of the loop

        def infer(p, s, im):
            if aot[0] is not None:
                try:
                    return aot[0](p, s, im)
                except Exception:
                    logging.exception(
                        "precompiled eval executable rejected inputs; "
                        "falling back to jit")
                    aot[0] = None
            return self._build_inference()(p, s, im)
        is_chief = jax.process_index() == 0
        evaluator = COCOEvaluator(
            input_shape=self.params.input.input_shape,
            annotation_file_path=(
                self.params.training.annotation_file_path),
            prediction_file_path=os.path.join(
                self.model_dir, "predictions.json"),
            remap_class_ids=bool(
                self.params.training.get("remap_class_ids", False))) \
            if is_chief else None

        # validation_samples bounds the eval loop (reference
        # executor.py:48,58: val_steps = validation_samples // val batch)
        max_batches = None
        if self.validation_samples > 0:
            max_batches = max(
                self.validation_samples // int(self.batch_size["val"]), 1)

        params = self._eval_params()
        n_batches = 0
        # per-leg wall-clock accounting (seconds, cumulative across the
        # eval): producer legs (host_decode, h2d_shard) run in the
        # prefetcher thread; consumer legs (staged_wait = time blocked on
        # the producer, dispatch, gather, accumulate) on the main thread.
        # Published as self.last_eval_timing so eval cost is attributable
        # instead of one opaque wall-clock number.
        timing = {"host_decode_s": 0.0, "h2d_shard_s": 0.0,
                  "staged_wait_s": 0.0, "dispatch_s": 0.0,
                  "gather_s": 0.0, "accumulate_s": 0.0}
        pipe = self.val_input_fn()
        # per-host-sharded val decode: each host's pipeline yields only its
        # contiguous 1/P slice of every global batch (P x less host decode,
        # reference executor.py:178-202 sharded the val dataset the same
        # way), so image metadata must ride the same cross-host gather as
        # the detections. Unsharded pipelines (every host decodes the full
        # set) keep the round-2 exactly-once slicing path.
        host_sharded = getattr(pipe, "val_shard_count", 1) > 1

        def _gather_and_accumulate(detections, meta) -> None:
            """Fetch one batch's detections to the host and score it —
            called AFTER the next batch's inference is dispatched, so the
            blocking gather/accumulate overlaps device compute."""
            if jax.process_count() > 1:
                # cross-host gather (reference strategy.gather,
                # executor.py:393-399); returns the full global batch's
                # detections on every process. tiled=True is REQUIRED for
                # global (non-fully-addressable) arrays — the default
                # raises at runtime; caught by the real 2-process harness
                # (tools/multiprocess_smoke.py), which the mocked layout
                # tests could not.
                from jax.experimental import multihost_utils
                t0 = time.perf_counter()
                detections = multihost_utils.process_allgather(
                    detections, tiled=True)
                if host_sharded:
                    # each host only holds its slice's metadata — gather it
                    # in the same process order the image batch was
                    # assembled in (make_array_from_process_local_data)
                    meta = multihost_utils.process_allgather(
                        meta, tiled=True)
                timing["gather_s"] += time.perf_counter() - t0
            else:
                t0 = time.perf_counter()
                detections = jax.device_get(detections)
                timing["gather_s"] += time.perf_counter() - t0
            if is_chief:
                t0 = time.perf_counter()
                evaluator.accumulate_results({
                    "image_id": meta["image_id"],
                    "detections": detections,
                    "resize_scale": meta["resize_scale"],
                })
                timing["accumulate_s"] += time.perf_counter() - t0

        # Stage val batches onto the devices through the same background
        # prefetcher the train loop uses (data/prefetch.py): the H2D copy
        # of batch N+1 rides under inference for batch N instead of
        # serializing [upload -> infer -> gather] per batch. The producer
        # enforces max_batches so no extra host decode/upload happens past
        # the validation_samples bound.
        batch_iter = iter(pipe)
        produced = [0]

        def make_eval_batch():
            """Returns the next staged batch, or None at end-of-stream.

            The None sentinel (instead of raising StopIteration) keeps the
            consumer loop free of a broad `except StopIteration` that would
            also swallow one escaping from infer()/_gather_and_accumulate()
            and silently truncate the evaluation."""
            if max_batches is not None and produced[0] >= max_batches:
                return None
            t0 = time.perf_counter()
            try:
                batch = next(batch_iter)
            except StopIteration:
                return None
            timing["host_decode_s"] += time.perf_counter() - t0
            produced[0] += 1
            shard = (mesh_lib.shard_batch if host_sharded
                     else mesh_lib.shard_global_batch)
            t0 = time.perf_counter()
            images = shard({"image": batch["image"]}, self.mesh)["image"]
            timing["h2d_shard_s"] += time.perf_counter() - t0
            meta = {"image_id": batch["image_id"],
                    "resize_scale": batch["resize_scale"]}
            return images, meta

        def _producer():
            # DevicePrefetcher's end-of-stream contract is StopIteration;
            # translate the None sentinel at the producer boundary only.
            item = make_eval_batch()
            if item is None:
                raise StopIteration
            return item

        depth = int(self.params.training.get("device_prefetch", 2))
        staged = (DevicePrefetcher(_producer, max(depth, 1))
                  if depth > 0 else iter(make_eval_batch, None))
        pending = None  # one-deep inference pipeline
        t_eval0 = time.perf_counter()
        staged_it = iter(staged)
        try:
            while True:
                t0 = time.perf_counter()
                try:
                    images, meta = next(staged_it)
                except StopIteration:
                    break
                timing["staged_wait_s"] += time.perf_counter() - t0
                t0 = time.perf_counter()
                detections = infer(params, self.state.batch_stats, images)
                timing["dispatch_s"] += time.perf_counter() - t0
                if pending is not None:
                    _gather_and_accumulate(*pending)
                pending = (detections, meta)
                n_batches += 1
        finally:
            if isinstance(staged, DevicePrefetcher):
                staged.close()
        if pending is not None:
            _gather_and_accumulate(*pending)
        timing["total_s"] = time.perf_counter() - t_eval0
        timing["n_batches"] = n_batches
        # host_decode/h2d_shard run inside the prefetcher thread, so they
        # OVERLAP the consumer legs — the attribution identity is
        # total ~= staged_wait + dispatch + gather + accumulate (+ scoring),
        # with staged_wait itself explained by producer legs exceeding the
        # device rate.
        self.last_eval_timing = dict(timing)
        logging.info("Evaluated %d batches (timing: %s)", n_batches,
                     {k: round(v, 3) for k, v in timing.items()})
        if not is_chief:
            return {}
        scores = evaluator.evaluate()
        step = int(self.state.step)
        self.metrics.log(step, {f"evaluation/{k}": v
                                for k, v in scores.items()})
        if self.discord.enabled:
            self.discord.log(f"[step {step}] eval: {scores}")
        logging.info("Evaluation at step %d: %s", step, scores)
        return scores

    def _write_weights_info(self, step: int) -> None:
        """Per-weight L2 norms (reference _write_weights_info,
        executor.py:329-344) computed in one jitted reduction."""
        norms = jax.jit(
            lambda p: jax.tree_util.tree_map(
                lambda x: jnp.sqrt(jnp.sum(jnp.square(
                    x.astype(jnp.float32)))), p))(self.state.params)
        flat, _ = jax.tree_util.tree_flatten_with_path(
            jax.device_get(norms))
        scalars = {}
        for key_path, value in flat:
            name = "/".join(
                str(getattr(k, "key", getattr(k, "idx", k)))
                for k in key_path)
            scalars[f"weights/{name}"] = float(value)
        self.metrics.log(step, scalars)
        # value histograms too (reference executor.py:329-344); histograms
        # are TensorBoard-only, so skip the whole-model device_get (100+ MB
        # over a tunneled link) when no TB writer exists
        if self.metrics.has_tensorboard:
            flat_p, _ = jax.tree_util.tree_flatten_with_path(
                jax.device_get(self.state.params))
            self.metrics.log_histograms(step, {
                "weights-hist/" + "/".join(
                    str(getattr(k, "key", getattr(k, "idx", k)))
                    for k in key_path): value
                for key_path, value in flat_p})

    # -------------------------------------------------------- introspection

    def get_flops(self, batch_size: int = 1) -> float:
        """MACs/FLOPs of the batch-`batch_size` eval forward pass via XLA
        cost analysis (reference executor.py:754-770 used the TF graph
        profiler)."""
        h, w = self.params.input.input_shape
        images = jnp.zeros((batch_size, int(h), int(w),
                            int(self.params.input.channels)), jnp.float32)
        fwd = step_lib.make_eval_forward(self.model, self.compute_dtype)
        compiled = jax.jit(fwd).lower(
            self.state.params, self.state.batch_stats, images).compile()
        analysis = compiled.cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        return float(analysis.get("flops", -1.0))

    def dump_forward_hlo(self, path: Optional[str] = None) -> str:
        """Write the optimized forward-pass HLO next to checkpoints (the
        analog of the reference's one-shot graph trace summary,
        executor.py:736-752)."""
        h, w = self.params.input.input_shape
        images = jnp.zeros((1, int(h), int(w),
                            int(self.params.input.channels)), jnp.float32)
        fwd = step_lib.make_eval_forward(self.model, self.compute_dtype)
        text = jax.jit(fwd).lower(
            self.state.params, self.state.batch_stats, images).as_text()
        path = path or os.path.join(self.model_dir, "forward.hlo.txt")
        with open(path, "w") as f:
            f.write(text)
        return path

    def continuous_evaluate(self, sleep_time: int = 60,
                            max_iterations: Optional[int] = None):
        """Poll for new checkpoints and evaluate each
        (reference executor.py:455-470)."""
        # compile the eval fn while waiting for the first checkpoint to
        # appear (same overlap as the in-loop path; evaluate() joins)
        self._prestart_eval_compile()
        current = None
        iterations = 0
        while max_iterations is None or iterations < max_iterations:
            latest = self.latest_checkpoint_step()
            if latest is not None and latest != current:
                self._restore_checkpoint(step=latest)
                self.evaluate()
                current = latest
            if int(self.state.step) >= self.train_steps:
                return
            iterations += 1
            logging.info("Sleeping %ds before checking for new checkpoint",
                         sleep_time)
            time.sleep(sleep_time)
