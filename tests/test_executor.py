"""End-to-end Executor tests on the 8-device virtual CPU mesh: training,
checkpoint/resume, inflection recovery, evaluation."""

import os

import jax
import numpy as np
import pytest

from retinanet_tpu.core import config as cfg
from retinanet_tpu.data.pipeline import InputPipeline
from retinanet_tpu.data.synthetic import (synthetic_train_iterator,
                                          write_synthetic_tfrecords)
from retinanet_tpu.train.executor import Executor


def _tiny_params(tmp_path, pattern, ann_path=None, train_steps=6,
                 save_every=3, bs=8):
    tree = {
        "experiment": {"name": "exec_test",
                       "model_dir": str(tmp_path / "models")},
        "input": {"input_shape": [64, 64], "channels": 3},
        "floatx": {"precision": "float32"},
        "architecture": {
            "backbone": {"type": "resnet", "depth": 10},
            "feature_fusion": {"type": "fpn", "filters": 16,
                               "min_level": 3, "max_level": 5,
                               "backbone_max_level": 5},
            "head": {"num_convs": 1, "filters": 16, "num_classes": 6,
                     "num_anchors": 9},
        },
        "anchor_params": {"areas": [1024.0, 4096.0, 16384.0],
                          "aspect_ratios": [0.5, 1.0, 2.0],
                          "scales": [1.0, 2 ** (1 / 3), 2 ** (2 / 3)]},
        "training": {
            "train_steps": train_steps, "save_every": save_every,
            # per-step logging in tests (production default decouples the
            # metric fetch from spe=1 at a 20-step cadence)
            "log_every": 1,
            "batch_size": {"train": bs, "val": bs},
            "annotation_file_path": ann_path or "",
            "optimizer": {
                "name": "sgd", "momentum": 0.9, "clipnorm": 10.0,
                "lr_params": {"schedule_type": "piecewise_constant_decay",
                              "warmup_learning_rate": 0.001,
                              "warmup_steps": 2,
                              "values": [0.01, 0.001], "boundaries": [4]}},
        },
        "dataloader_params": {
            "tfrecords": {"train": pattern, "val": pattern},
            "shuffle_buffer_size": 8},
        "inference": {"pre_nms_top_k": 200, "max_detections": 10},
    }
    return cfg.from_dict(tree)


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    d = tmp_path_factory.mktemp("data")
    pattern, ann = write_synthetic_tfrecords(
        str(d), "train", num_shards=2, samples_per_shard=8,
        num_classes=6, write_annotations=True)
    return pattern, ann


def test_train_checkpoint_resume(tmp_path, data):
    pattern, _ = data
    params = _tiny_params(tmp_path, pattern)
    ex = Executor(params, run_mode="train",
                  train_input_fn=lambda: InputPipeline(
                      "train", params, max_boxes=20),
                  enable_tensorboard=False)
    assert ex.train()
    assert int(ex.state.step) == 6
    assert ex.ckpt_manager.all_steps() == [3, 6]
    # metrics were logged
    log = tmp_path / "models" / "exec_test" / "logs" / "train_metrics.jsonl"
    assert log.exists() and len(log.read_text().splitlines()) >= 6

    # a fresh executor resumes from step 6 and does nothing
    ex2 = Executor(params, run_mode="train",
                   train_input_fn=lambda: InputPipeline(
                       "train", params, max_boxes=20),
                   enable_tensorboard=False)
    assert int(ex2.state.step) == 6
    assert ex2.train()  # already complete


def test_loss_decreases_on_fixed_batch(tmp_path, data):
    """Overfit one synthetic batch for a few steps: total loss must drop."""
    pattern, _ = data
    params = _tiny_params(tmp_path, pattern, train_steps=8, save_every=100)
    batch = next(synthetic_train_iterator(8, (64, 64), 20, 6, seed=3))

    def fixed_iter():
        while True:
            yield batch

    ex = Executor(params, run_mode="train",
                  train_input_fn=fixed_iter, enable_tensorboard=False)
    losses = []
    state = ex.state
    from retinanet_tpu.parallel import mesh as mesh_lib
    sharded = mesh_lib.shard_batch(batch, ex.mesh)
    for _ in range(8):
        state, metrics = ex._train_step(state, sharded)
        losses.append(float(metrics["total-loss"]))
    assert losses[-1] < losses[0], losses


def test_evaluate_end_to_end(tmp_path, data):
    pattern, ann = data
    params = _tiny_params(tmp_path, pattern, ann_path=ann)
    ex = Executor(params, run_mode="val",
                  val_input_fn=lambda: InputPipeline("val", params),
                  enable_tensorboard=False)
    scores = ex.evaluate()
    assert set(scores) == {"AP-IoU=0.50:0.95", "AP-IoU=0.50", "AP-IoU=0.75",
                           "AR-(all)-IoU=0.50:0.95", "AR-(L)-IoU=0.50:0.95"}
    # random model: tiny-but-valid numbers
    for v in scores.values():
        assert -1.0 <= v <= 1.0


def test_validation_samples_bounds_eval(tmp_path, data, monkeypatch):
    """training.validation_samples caps the eval loop (reference
    executor.py:48,58: val_steps = validation_samples // val batch)."""
    pattern, ann = data
    params = _tiny_params(tmp_path, pattern, ann_path=ann)
    params.training.validation_samples = 8  # data has 16 samples, bs=8

    accumulated = []
    from retinanet_tpu.train import executor as executor_mod
    real = executor_mod.COCOEvaluator

    class SpyEvaluator(real):
        def accumulate_results(self, results):
            accumulated.append(np.asarray(results["image_id"]))
            return super().accumulate_results(results)

    monkeypatch.setattr(executor_mod, "COCOEvaluator", SpyEvaluator)
    ex = Executor(params, run_mode="val",
                  val_input_fn=lambda: InputPipeline("val", params),
                  enable_tensorboard=False)
    ex.evaluate()
    assert len(accumulated) == 1  # 8 // 8 = 1 batch, not 2


def test_eval_accumulates_each_image_once(tmp_path, data, monkeypatch):
    """Regression for the multi-host duplication bug: across the whole
    evaluation, every image_id is accumulated exactly once."""
    pattern, ann = data
    params = _tiny_params(tmp_path, pattern, ann_path=ann)

    accumulated = []
    from retinanet_tpu.train import executor as executor_mod
    real = executor_mod.COCOEvaluator

    class SpyEvaluator(real):
        def accumulate_results(self, results):
            accumulated.append(np.asarray(results["image_id"]))
            return super().accumulate_results(results)

    monkeypatch.setattr(executor_mod, "COCOEvaluator", SpyEvaluator)
    ex = Executor(params, run_mode="val",
                  val_input_fn=lambda: InputPipeline("val", params),
                  enable_tensorboard=False)
    ex.evaluate()
    ids = np.concatenate(accumulated)
    real_ids = ids[ids >= 0]  # drop pad sentinels
    assert len(real_ids) == 16
    assert len(np.unique(real_ids)) == 16


def test_eval_precompile_serves_every_batch(tmp_path, data, monkeypatch):
    """_prestart_eval_compile AOT-compiles the inference fn in the
    background; evaluate() must then serve every batch from the compiled
    executable (identical scores) without ever touching the jit path."""
    pattern, ann = data
    params = _tiny_params(tmp_path, pattern, ann_path=ann)
    ex = Executor(params, run_mode="val",
                  val_input_fn=lambda: InputPipeline("val", params),
                  enable_tensorboard=False)
    baseline = ex.evaluate()

    ex2 = Executor(params, run_mode="val",
                   val_input_fn=lambda: InputPipeline("val", params),
                   enable_tensorboard=False)
    ex2._prestart_eval_compile()
    assert ex2._eval_compile_thread is not None
    ex2._eval_compile_thread.join(timeout=300)
    assert ex2._inference_aot is not None
    # any fallback to the jit path would blow up loudly
    monkeypatch.setattr(
        ex2, "_build_inference",
        lambda: (_ for _ in ()).throw(AssertionError("jit fallback used")))
    scores = ex2.evaluate()
    assert scores == baseline


def test_steps_per_execution_multi_step(tmp_path, data):
    """spe>1 wires make_multi_step: one scan dispatch per spe steps, with
    checkpoints landing on the configured interval."""
    pattern, _ = data
    params = _tiny_params(tmp_path, pattern, train_steps=6, save_every=3)
    params.training.steps_per_execution = 2
    ex = Executor(params, run_mode="train",
                  train_input_fn=lambda: InputPipeline(
                      "train", params, max_boxes=20),
                  enable_tensorboard=False)
    assert ex.train()
    assert int(ex.state.step) == 6
    # save_every=3 is not a multiple of spe=2: saves fire when the step
    # counter crosses each interval boundary (steps 4 and 6)
    assert ex.ckpt_manager.all_steps() == [4, 6]
    log = tmp_path / "models" / "exec_test" / "logs" / "train_metrics.jsonl"
    assert log.exists() and len(log.read_text().splitlines()) >= 3


def test_mesh_uses_all_devices():
    assert jax.device_count() == 8  # conftest forces the 8-device CPU mesh


def test_inflection_recovery(tmp_path, data):
    pattern, _ = data
    params = _tiny_params(tmp_path, pattern, train_steps=4, save_every=2)
    params.training.recovery.use_inflection_detector = True
    params.training.recovery.metric_key = "total-loss"
    params.training.recovery.threshold = 1e9  # never triggers
    ex = Executor(params, run_mode="train",
                  train_input_fn=lambda: InputPipeline(
                      "train", params, max_boxes=20),
                  enable_tensorboard=False)
    assert ex.train()
    # the detector must sample EVERY step at spe=1 (reference checked each
    # outer step) — the log_every fetch cadence must not starve it of
    # short divergence spikes (round-3 review finding)
    assert len(ex._inflection.data) == 4


def test_weights_info_norms_and_histograms(data, tmp_path):
    """_write_weights_info logs per-weight L2 norms (JSONL + TB) and value
    histograms (TB; reference executor.py:329-344 wrote both)."""
    import glob
    import json as _json
    pattern, _ = data
    params = _tiny_params(tmp_path, pattern, train_steps=2, save_every=2)
    ex = Executor(params, run_mode="train",
                  train_input_fn=lambda: InputPipeline(
                      "train", params, max_boxes=20),
                  enable_tensorboard=True)
    ex._write_weights_info(1)
    ex.metrics.flush()
    log_dir = tmp_path / "models" / "exec_test" / "logs"
    lines = (log_dir / "train_metrics.jsonl").read_text().splitlines()
    rec = _json.loads(lines[-1])
    weight_keys = [k for k in rec if k.startswith("weights/")]
    assert len(weight_keys) > 10
    assert all(v >= 0 for k, v in rec.items() if k in weight_keys)
    # TB event files exist (histograms are TB-only)
    assert glob.glob(str(log_dir / "train" / "events.out.tfevents.*"))


def test_sigterm_preemption_checkpoints_and_resumes(tmp_path, data):
    """SIGTERM mid-training (Cloud TPU/GCE preemption) must checkpoint at
    the next step boundary and return cleanly; a fresh Executor resumes
    from that off-interval step and finishes. The reference had no
    handler and lost up to save_every steps on preemption."""
    import signal as _signal
    import threading

    pattern, _ = data
    # save_every larger than train_steps: the ONLY checkpoint that can
    # exist mid-run is the preemption one.
    params = _tiny_params(tmp_path, pattern, train_steps=500,
                          save_every=10_000)
    ex = Executor(params, run_mode="train",
                  train_input_fn=lambda: InputPipeline(
                      "train", params, max_boxes=20),
                  enable_tensorboard=False)
    # deliver a real SIGTERM while train() is inside the loop (handlers
    # run on the main thread between steps)
    timer = threading.Timer(3.0, _signal.raise_signal, (_signal.SIGTERM,))
    timer.start()
    try:
        assert ex.train()  # clean return, not a crash
    finally:
        timer.cancel()
    step = ex.latest_checkpoint_step()
    assert step is not None and 0 < step < 500, step
    # the trap restored the previous SIGTERM disposition on exit
    assert _signal.getsignal(_signal.SIGTERM) is _signal.SIG_DFL

    # resume: a fresh Executor picks up at the preemption step
    params.training.train_steps = step + 2
    ex2 = Executor(params, run_mode="train",
                   train_input_fn=lambda: InputPipeline(
                       "train", params, max_boxes=20),
                   enable_tensorboard=False)
    assert int(ex2.state.step) == step
    assert ex2.train()
    assert int(ex2.state.step) == step + 2
