"""TRUE multi-process distributed smoke: 2 JAX processes, one global mesh.

The multi-host mechanisms (mesh bring-up, per-process batch assembly,
the exactly-once eval-slice invariant, cross-process collectives) are
unit-tested against mocked layouts in tests/; this harness runs them for
real: the parent spawns two processes that each own 4 virtual CPU
devices, `jax.distributed.initialize` stitches them into one 8-device
platform, and both run the SAME jitted SPMD program over a global batch
assembled from distinct per-process shards.

Checks:
  * global device/process topology (8 devices, 2 processes)
  * psum over the mesh sees every process's contribution exactly once
  * shard_global_batch + process_allgather round-trips the deterministic
    global batch with no duplication (the multi-host eval invariant)
  * a real (tiny) train step produces a finite loss, bit-identical on
    both processes
  * the Executor's eval gather sequence (shard_global_batch -> jitted
    inference -> process_allgather) — this check caught TWO real bugs
    the mocked layouts couldn't: shard_batch's global-vs-local
    divisibility fallback, and process_allgather requiring tiled=True
    for global arrays (the default raises on a real pod)
  * preemption agreement: a SIGTERM flag raised on one host is seen by
    ALL hosts through the production agree_preemption collective
  * a REAL Executor run across both processes: multi-host train loop
    (device prefetch on), preemption raised on ONE host mid-run -> both
    hosts checkpoint the SAME step via the agreement collective, a fresh
    Executor resumes and finishes, then full multi-host evaluation
    (sharded val decode + detection/metadata gather + chief-only COCO
    scoring + chief-only metrics sink)

Topology is parameterized: MPSMOKE_PROCS=4 runs 4 processes x 2 devices.
Measured: the loss is bit-identical across BOTH topologies (2x4 and 4x2)
and across all processes — the SPMD program is invariant to the process
layout, as GSPMD promises.

Usage: PYTHONPATH=. python tools/multiprocess_smoke.py        # parent
"""

from __future__ import annotations

import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:  # the parent imports retinanet_tpu itself now
    sys.path.insert(0, _REPO)

PORT = int(os.environ.get("MPSMOKE_PORT", "38571"))
NPROC = int(os.environ.get("MPSMOKE_PROCS", "2"))
DEV_PER_PROC = 8 // NPROC


def child(process_id: int) -> None:
    import jax
    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass  # older/newer jax: default implementation
    jax.distributed.initialize(
        coordinator_address=f"localhost:{PORT}",
        num_processes=NPROC, process_id=process_id)

    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils

    from retinanet_tpu.parallel import mesh as mesh_lib

    assert jax.process_count() == NPROC, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == DEV_PER_PROC

    mesh = mesh_lib.create_mesh()

    # 1. the global sum sees each process's contribution exactly once
    local = np.full((DEV_PER_PROC, 1), float(process_id + 1), np.float32)
    arr = mesh_lib.shard_batch({"x": local}, mesh)["x"]

    @jax.jit
    def total(x):
        return jnp.sum(x)

    t = float(total(arr))
    expect = DEV_PER_PROC * sum(range(1, NPROC + 1))
    assert t == expect, (t, expect)

    # 2. exactly-once eval-slice invariant
    full = np.arange(16, dtype=np.float32).reshape(16, 1)  # same everywhere
    garr = mesh_lib.shard_global_batch({"x": full}, mesh)["x"]
    gathered = multihost_utils.process_allgather(garr, tiled=True)
    np.testing.assert_array_equal(np.sort(gathered.ravel()),
                                  np.arange(16, dtype=np.float32))

    # 3. real tiny train step over the global mesh
    from retinanet_tpu.core.config import from_dict
    from retinanet_tpu.data import anchors as anchor_lib
    from retinanet_tpu.data.label_encoder import make_batched_encoder
    from retinanet_tpu.data.preprocessing import make_device_normalizer
    from retinanet_tpu.data.synthetic import synthetic_train_batch
    from retinanet_tpu.losses.losses import RetinaNetLoss
    from retinanet_tpu.models.retinanet import build_model
    from retinanet_tpu.optimizers.builder import build_optimizer
    from retinanet_tpu.train import step as step_lib
    from retinanet_tpu.train.train_state import create_train_state

    params = from_dict({
        "experiment": {"name": "mp"},
        "input": {"input_shape": [64, 64], "channels": 3},
        "floatx": {"precision": "float32"},
        "architecture": {
            "backbone": {"type": "resnet", "depth": 10},
            "feature_fusion": {"type": "fpn", "filters": 16, "min_level": 3,
                               "max_level": 5, "backbone_max_level": 5},
            "head": {"num_convs": 1, "filters": 16, "num_classes": 4,
                     "num_anchors": 9},
        },
        "anchor_params": {"areas": [1024.0, 4096.0, 16384.0],
                          "aspect_ratios": [0.5, 1.0, 2.0],
                          "scales": [1.0, 2 ** (1 / 3), 2 ** (2 / 3)]},
        "training": {
            "train_steps": 10,
            "batch_size": {"train": 8, "val": 8},
            "optimizer": {
                "name": "sgd", "momentum": 0.9, "clipnorm": 10.0,
                "lr_params": {"schedule_type": "cosine_decay",
                              "initial_learning_rate": 0.01,
                              "warmup_learning_rate": 0.001,
                              "warmup_steps": 2}},
        },
    })
    model = build_model(params)
    encoder = make_batched_encoder(
        anchor_lib.from_params(params), params.encoder_params)
    normalizer = make_device_normalizer(params)
    loss_fn = RetinaNetLoss(4, params.loss)
    tx, schedule = build_optimizer(
        params.training.optimizer, params.training.train_steps)
    variables = jax.jit(lambda k: model.init(
        k, jnp.zeros((1, 64, 64, 3)), train=False))(jax.random.PRNGKey(0))
    state = jax.device_put(create_train_state(variables, tx),
                           mesh_lib.replicated(mesh))
    train_step = jax.jit(step_lib.make_train_step(
        model, loss_fn, encoder, normalizer, tx, schedule,
        use_weight_decay=True, weight_decay_alpha=1e-4,
        compute_dtype=jnp.float32), donate_argnums=(0,))

    # each process contributes its DISTINCT local half of the global batch
    gb = synthetic_train_batch(8, (64, 64), 10, 4, seed=7)
    local_batch = {k: mesh_lib.process_slice(np.asarray(v),
                                             jax.process_index(), NPROC)
                   for k, v in gb.items()}
    batch = mesh_lib.shard_batch(local_batch, mesh)
    state, metrics = train_step(state, batch)
    loss = float(metrics["total-loss"])
    assert np.isfinite(loss), loss

    # 3b. gradient accumulation across hosts: each process stacks its SAME
    # local batch as two micro-batches ([2, local, ...], sharded on dim 1).
    # The reported loss is (l + l) / 2 == l exactly in binary fp, so it
    # must reproduce check 3's loss bit-for-bit at the original params and
    # agree bit-for-bit across all processes.
    accum_step = jax.jit(step_lib.make_train_step(
        model, loss_fn, encoder, normalizer, tx, schedule,
        use_weight_decay=True, weight_decay_alpha=1e-4,
        compute_dtype=jnp.float32, grad_accum_steps=2), donate_argnums=(0,))
    variables_ga = jax.jit(lambda k: model.init(
        k, jnp.zeros((1, 64, 64, 3)), train=False))(jax.random.PRNGKey(0))
    state_ga = jax.device_put(create_train_state(variables_ga, tx),
                              mesh_lib.replicated(mesh))
    batch_ga = mesh_lib.shard_batch(
        {k: np.stack([np.asarray(v)] * 2) for k, v in local_batch.items()},
        mesh, leading_dims=1)
    state_ga, m_ga = accum_step(state_ga, batch_ga)
    ga_loss = float(m_ga["total-loss"])
    assert ga_loss == loss, ("grad-accum loss != plain loss", ga_loss, loss)
    ga_all = np.asarray(
        multihost_utils.process_allgather(jnp.float32(ga_loss)))
    assert np.all(ga_all == ga_loss), ga_all
    assert int(state_ga.step) == 1
    del state_ga, batch_ga

    # 4. the Executor's multi-host eval gather sequence, verbatim:
    # identical deterministic val batch on every host -> each contributes
    # its 1/P slice -> jitted inference over the global batch ->
    # process_allgather -> chief receives one detection set per image
    from retinanet_tpu.ops.postprocess import make_inference_fn
    infer = jax.jit(make_inference_fn(
        model, params, anchor_lib.from_params(params), normalizer,
        compute_dtype=jnp.float32))
    val = synthetic_train_batch(8, (64, 64), 10, 4, seed=11)  # same seed
    gimages = mesh_lib.shard_global_batch(
        {"image": np.asarray(val["image"])}, mesh)["image"]
    dets = infer(state.params, state.batch_stats, gimages)
    # tiled=True: required for global arrays (the executor does the same;
    # the tiled=False default RAISES here — a real-runtime behavior the
    # mocked multi-host tests could not observe)
    dets = multihost_utils.process_allgather(dets, tiled=True)
    md = int(params.inference.max_detections)
    assert dets["boxes"].shape == (8, md, 4), dets["boxes"].shape
    assert dets["valid_detections"].shape == (8,)
    assert np.all(np.isfinite(dets["scores"]))
    # chief-only accumulation is exercised at the executor level by
    # tests/test_executor.py; here the contract is: every process holds
    # the SAME global detections after the gather
    digest = float(np.sum(dets["scores"])) + float(
        np.sum(dets["valid_detections"]))

    # 5. round-3 per-host val-decode sharding: each host feeds only its
    # LOCAL slice (shard_batch assembly) and the metadata rides the same
    # tiled allgather as the detections — the detections must be
    # bit-identical to the round-2 shard_global_batch path above, and the
    # gathered metadata must reproduce the full id/scale set in order.
    local_val = {k: mesh_lib.process_slice(np.asarray(v),
                                           jax.process_index(), NPROC)
                 for k, v in val.items()}
    sharded_images = mesh_lib.shard_batch(
        {"image": local_val["image"]}, mesh)["image"]
    dets2 = infer(state.params, state.batch_stats, sharded_images)
    dets2 = multihost_utils.process_allgather(dets2, tiled=True)
    for k in dets:
        np.testing.assert_array_equal(
            np.asarray(dets[k]), np.asarray(dets2[k]),
            err_msg=f"sharded-decode eval diverged on {k}")
    ids_local = np.arange(8)[jax.process_index() * (8 // NPROC):
                             (jax.process_index() + 1) * (8 // NPROC)]
    meta = multihost_utils.process_allgather(
        {"image_id": ids_local,
         "resize_scale": np.ones((8 // NPROC, 2), np.float32)}, tiled=True)
    np.testing.assert_array_equal(meta["image_id"], np.arange(8))
    assert meta["resize_scale"].shape == (8, 2)

    # 6. round-3 spatial partitioning across REAL processes: 2-D
    # (data, spatial) mesh — data axis spans both processes, each
    # process's local devices form whole spatial groups. Same step, same
    # per-process batch halves; the loss must match the 1-D run (the
    # spatial axis changes the collective schedule, not the math).
    mesh_sp = mesh_lib.create_mesh(spatial=2)
    assert mesh_sp.shape == {"data": 8 // 2, "spatial": 2}
    # `variables`' buffers were donated with the 1-D state above —
    # re-init deterministically (same PRNGKey -> identical values)
    variables_sp = jax.jit(lambda k: model.init(
        k, jnp.zeros((1, 64, 64, 3)), train=False))(jax.random.PRNGKey(0))
    state_sp = jax.device_put(create_train_state(variables_sp, tx),
                              mesh_lib.replicated(mesh_sp))
    batch_sp = mesh_lib.shard_batch(local_batch, mesh_sp)
    img_shards = {s.data.shape
                  for s in batch_sp["image"].addressable_shards}
    assert img_shards == {(2, 32, 64, 3)}, img_shards  # B/4, H/2
    _, metrics_sp = train_step(state_sp, batch_sp)
    loss_sp = float(metrics_sp["total-loss"])
    assert abs(loss_sp - loss) <= 1e-5 * abs(loss), (loss_sp, loss)

    # 7. preemption agreement (round-3 review fix): SIGTERM lands on ONE
    # host; every host must reach the same verdict before entering the
    # collective checkpoint save. Exercise the production helper with an
    # asymmetric flag (only process 0 "received" the signal), then with
    # no signal anywhere.
    from retinanet_tpu.train.executor import agree_preemption
    assert agree_preemption(process_id == 0) is True
    assert agree_preemption(False) is False

    # 8. a REAL Executor across both processes (workdir prepared by the
    # parent): train with device prefetch, one-host preemption ->
    # same-step collective checkpoint, fresh-Executor resume to
    # completion, then full multi-host evaluation.
    workdir = os.environ["MPSMOKE_WORKDIR"]
    from retinanet_tpu.core.config import Config
    from retinanet_tpu.data.pipeline import InputPipeline
    from retinanet_tpu.train.executor import Executor

    params2 = Config(os.path.join(workdir, "config.json")).params

    def train_fn():
        return InputPipeline(
            "train", params2, is_multi_host=True,
            process_index=jax.process_index(), process_count=NPROC, seed=7)

    def val_fn():
        return InputPipeline(
            "val", params2, is_multi_host=False,
            batch_size=int(params2.training.batch_size.val) // NPROC,
            seed=7, val_shard_index=jax.process_index(),
            val_shard_count=NPROC)

    ex = Executor(params2, run_mode="train", is_multi_host=True,
                  train_input_fn=train_fn, val_input_fn=val_fn,
                  enable_tensorboard=False)
    # non-chief metrics sinks must be disabled (shared model_dir on pods)
    assert (ex.metrics._jsonl is not None) == (process_id == 0)
    # deterministic preemption injection: "SIGTERM" lands on process 0
    # only, during the 3rd step's dispatch; with log_every=2 both
    # processes must agree and checkpoint at the SAME boundary (step 4)
    orig_step, seen = ex._train_step, {"n": 0}

    def counting_step(state, batch):
        seen["n"] += 1
        if seen["n"] == 3 and jax.process_index() == 0:
            ex._preempt_requested = True
        return orig_step(state, batch)

    ex._train_step = counting_step
    assert ex.train() is True
    preempt_step = ex.latest_checkpoint_step()
    assert preempt_step == 4, preempt_step
    assert int(ex.state.step) == 4

    # fresh Executor resumes from the preemption checkpoint and finishes;
    # train_val runs the full multi-host evaluation at the end
    ex2 = Executor(params2, run_mode="train", is_multi_host=True,
                   train_input_fn=train_fn, val_input_fn=val_fn,
                   enable_tensorboard=False)
    assert ex2.train() is True
    assert int(ex2.state.step) == int(params2.training.train_steps)
    scores = ex2.evaluate()
    if process_id == 0:
        assert scores and all(np.isfinite(v) for v in scores.values()), \
            scores
    else:
        assert scores == {}, scores

    print(f"proc{process_id}: devices=8 ok, psum ok, allgather ok, "
          f"gradaccum ok, shardedval ok, spatial ok, preempt-agree ok, "
          f"executor ok, loss={loss:.6f} evaldigest={digest:.6f}",
          flush=True)


def _prepare_workdir() -> str:
    """Dataset + config for the real-Executor leg (check 8), written once
    by the parent so both children see identical files."""
    import json
    import tempfile

    from retinanet_tpu.data.synthetic import write_synthetic_tfrecords

    workdir = tempfile.mkdtemp(prefix="mpsmoke_exec_")
    data = os.path.join(workdir, "data")
    # 4 shards so every process owns >= 1 file under per-host file-list
    # sharding in both topologies (2 and 4 processes)
    pattern, ann = write_synthetic_tfrecords(
        data, "train", num_shards=4, samples_per_shard=4, num_classes=4,
        write_annotations=True)
    cfg = {
        "experiment": {"name": "mpexec", "run_mode": "train",
                       "model_dir": os.path.join(workdir, "models"),
                       "tensorboard_dir": os.path.join(workdir, "tb")},
        "input": {"input_shape": [64, 64], "channels": 3},
        "floatx": {"precision": "float32"},
        "architecture": {
            "backbone": {"type": "resnet", "depth": 10},
            "feature_fusion": {"type": "fpn", "filters": 16, "min_level": 3,
                               "max_level": 5, "backbone_max_level": 5},
            "head": {"num_convs": 1, "filters": 16, "num_classes": 4,
                     "num_anchors": 9}},
        "anchor_params": {"areas": [1024.0, 4096.0, 16384.0],
                          "aspect_ratios": [0.5, 1.0, 2.0],
                          "scales": [1.0, 2 ** (1 / 3), 2 ** (2 / 3)]},
        "training": {
            "train_steps": 8, "save_every": 100, "log_every": 2,
            "batch_size": {"train": 8, "val": 8},
            "annotation_file_path": ann,
            "remap_class_ids": False,
            "optimizer": {
                "name": "sgd", "momentum": 0.9, "clipnorm": 10.0,
                "lr_params": {"schedule_type": "cosine_decay",
                              "initial_learning_rate": 0.01,
                              "warmup_learning_rate": 0.001,
                              "warmup_steps": 2}}},
        "dataloader_params": {
            "tfrecords": {"train": pattern, "val": pattern},
            "augmentations": {"use_augmentation": False,
                              "horizontal_flip": False},
            "shuffle_buffer_size": 8},
        "inference": {"mode": "PerClassHardNMS", "score_threshold": 0.05,
                      "pre_nms_top_k": 256, "max_detections": 25},
    }
    with open(os.path.join(workdir, "config.json"), "w") as f:
        json.dump(cfg, f, indent=1)
    return workdir


def parent() -> None:
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS":
            f"--xla_force_host_platform_device_count={DEV_PER_PROC}",
        "PYTHONPATH": _REPO + os.pathsep + env.get("PYTHONPATH", ""),
        "MPSMOKE_WORKDIR": _prepare_workdir(),
    })
    procs = [subprocess.Popen(
        [sys.executable, __file__, str(i)], env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(NPROC)]
    timeout_s = int(os.environ.get("MPSMOKE_TIMEOUT", "900"))
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout_s)
            outs.append((p.returncode, out))
    finally:
        # never orphan children (a leaked child keeps the coordinator
        # port held and wedges every subsequent run)
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.communicate()
    ok = all(rc == 0 for rc, _ in outs)
    losses = set()
    for rc, out in outs:
        tail = [ln for ln in out.strip().splitlines() if "loss=" in ln]
        print(out.strip().splitlines()[-1] if out.strip() else "(no output)")
        for ln in tail:
            losses.add(ln.split("loss=")[1])  # includes the eval digest
    if not ok:
        for rc, out in outs:
            if rc != 0:
                print("=== child failure ===")
                print(out[-3000:])
        sys.exit(1)
    assert len(losses) == 1, f"losses differ across processes: {losses}"
    print(f"MULTIPROCESS SMOKE OK ({NPROC} procs x {DEV_PER_PROC} "
          "devices, identical loss)")


if __name__ == "__main__":
    if len(sys.argv) > 1:
        child(int(sys.argv[1]))
    else:
        parent()
