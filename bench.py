"""Benchmark: flagship RetinaNet ResNet50-FPN 640x640 on the attached TPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Primary metric: training images/sec/chip at 640x640 (full step: on-device
label encode + fwd + bwd + SGD update, bf16). Baseline: the reference's
v3-32 steady state of ~40.3 imgs/s/chip (README.md:74-76, BASELINE.md).
Extras report batched-inference FPS (decode+top-k+NMS included) vs the
>90 FPS single-chip target.
"""

from __future__ import annotations

import retinanet_tpu.core.cache  # noqa: F401,E402  persistent XLA cache

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

_T0 = time.time()


def _mark(msg: str) -> None:
    """Progress marker on stderr so stalled runs are diagnosable (the
    tunneled TPU runtime can be slow; stdout stays one JSON line)."""
    print(f"[bench +{time.time() - _T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)

BASELINE_TRAIN_IMGS_PER_SEC_PER_CHIP = 40.3
BASELINE_INFER_FPS = 90.0


def main():
    from __graft_entry__ import _flagship_params
    from retinanet_tpu.data import anchors as anchor_lib
    from retinanet_tpu.data.label_encoder import make_batched_encoder
    from retinanet_tpu.data.preprocessing import make_device_normalizer
    from retinanet_tpu.data.synthetic import synthetic_train_batch
    from retinanet_tpu.losses.losses import RetinaNetLoss
    from retinanet_tpu.models.retinanet import build_model
    from retinanet_tpu.ops.postprocess import make_inference_fn
    from retinanet_tpu.optimizers.builder import build_optimizer
    from retinanet_tpu.parallel import mesh as mesh_lib
    from retinanet_tpu.train import step as step_lib
    from retinanet_tpu.train.train_state import create_train_state

    n_chips = jax.device_count()
    params = _flagship_params()
    train_bs = 16 * n_chips
    infer_bs = 8

    _mark("building model")
    model = build_model(params)
    anchors = anchor_lib.from_params(params)
    encoder = make_batched_encoder(anchors, params.encoder_params)
    normalizer = make_device_normalizer(params)
    loss_fn = RetinaNetLoss(80, params.loss)
    tx, schedule = build_optimizer(
        params.training.optimizer, params.training.train_steps)

    mesh = mesh_lib.create_mesh()
    variables = jax.jit(lambda k: model.init(
        k, jnp.zeros((1, 640, 640, 3)), train=False))(jax.random.PRNGKey(0))
    state = jax.device_put(
        create_train_state(variables, tx), mesh_lib.replicated(mesh))

    train_step = jax.jit(
        step_lib.make_train_step(
            model, loss_fn, encoder, normalizer, tx, schedule,
            use_weight_decay=True, weight_decay_alpha=1e-4,
            compute_dtype=jnp.bfloat16),
        donate_argnums=(0,))

    batch = mesh_lib.shard_batch(
        synthetic_train_batch(train_bs, (640, 640), 100, 80, seed=0), mesh)

    # Timing notes: block_until_ready is unreliable on the tunneled TPU
    # runtime, so we chain N steps through the donated state and force
    # completion with one scalar fetch (utils/benchmark.py).
    from retinanet_tpu.utils.benchmark import chained_step_time, device_time

    _mark("compiling train step")
    state, metrics = train_step(state, batch)  # compile
    float(metrics["total-loss"])
    _mark("timing train step")
    dt, state = chained_step_time(train_step, state, batch, iters=20)
    train_imgs_per_sec = train_bs / dt
    train_imgs_per_sec_per_chip = train_imgs_per_sec / n_chips

    # ---- roofline accounting: XLA-cost-analysis FLOPs, achieved TFLOP/s,
    # MFU vs the chip's bf16 peak, and a measured HBM stream rate — so
    # every perf claim here is auditable against the roofline at a glance.
    PEAK_BF16_TFLOPS = 197.0  # TPU v5e MXU peak (public spec)
    _mark("cost analysis")
    train_an = train_step.lower(state, batch).compile().cost_analysis()
    if isinstance(train_an, list):
        train_an = train_an[0]
    train_flops_step = float(train_an.get("flops", -1.0))
    fwd_an = jax.jit(step_lib.make_eval_forward(
        model, jnp.bfloat16)).lower(
        state.params, state.batch_stats,
        jnp.zeros((1, 640, 640, 3), jnp.float32)).compile().cost_analysis()
    if isinstance(fwd_an, list):
        fwd_an = fwd_an[0]
    fwd_flops_img = float(fwd_an.get("flops", -1.0))
    achieved_tflops_train = train_flops_step / dt / 1e12
    # streaming read+write of a 1 GiB f32 array (per-direction rate is
    # half of the sum; tools/membw_experiments.py probes this in depth)
    big = jnp.zeros((256, 1024, 1024), jnp.float32)
    bw_dt = device_time(jax.jit(lambda x: x * 1.000001), big, iters=10)
    hbm_gbps = 2 * big.size * 4 / bw_dt / 1e9
    del big

    # ---- input-bound end-to-end: real host pipeline feeding the step -------
    # JPEG decode -> geometric preprocess -> shard -> device train step; the
    # number reflects the whole system, not just the device (the reference's
    # tf.data pipeline kept pods fed — input_pipeline.py:57-92 — so the host
    # path must not be the bottleneck).
    import tempfile
    from retinanet_tpu.data.pipeline import InputPipeline
    from retinanet_tpu.data.synthetic import write_synthetic_tfrecords

    data_dir = os.path.join(tempfile.gettempdir(), "bench_tfrecords_640")
    pattern = os.path.join(data_dir, "bench-*")
    if not os.path.isdir(data_dir):
        write_synthetic_tfrecords(data_dir, "bench", num_shards=4,
                                  samples_per_shard=32)
    params.dataloader_params.tfrecords = {"train": pattern, "val": pattern}
    # host-only rate (decode+preprocess+collate, no device in the loop).
    # Best of 3 passes: on this 1-core sandbox the first pass after device
    # work is contended with the tunnel client's threads (measured 158 vs
    # 323/350/297 imgs/s across consecutive passes) — the steady-state
    # capacity is the quantity the cores-per-chip feed ratio needs.
    _mark("host pipeline passes")
    host_imgs_per_sec = 0.0
    for _ in range(3):
        host_iter = iter(InputPipeline("train", params, batch_size=train_bs))
        for _ in range(4):
            next(host_iter)
        t0 = time.time()
        for _ in range(8):
            next(host_iter)
        host_imgs_per_sec = max(
            host_imgs_per_sec, 8 * train_bs / (time.time() - t0))
        del host_iter

    _mark("e2e input-bound path")
    pipe_iter = iter(InputPipeline("train", params, batch_size=train_bs))
    warm = mesh_lib.shard_batch(next(pipe_iter), mesh)
    state, m = train_step(state, warm)  # uint8-input variant compile
    float(m["total-loss"])
    # production path: device prefetch overlaps the H2D copy with the step
    # (Executor default, training.device_prefetch=2)
    from retinanet_tpu.data.prefetch import DevicePrefetcher
    batches = DevicePrefetcher(
        lambda: mesh_lib.shard_batch(next(pipe_iter), mesh), depth=2)
    for _ in range(3):                  # pipeline worker-pool warmup
        state, m = train_step(state, next(batches))
    float(m["total-loss"])
    # best of 2 passes: the tunnel's H2D throughput has a heavy tail
    # (measured 0.03-0.10 GB/s across runs, reports/e2e_breakdown.json);
    # the steady-state capacity is the quantity of interest
    n_e2e = 10
    e2e_imgs_per_sec = 0.0
    for _ in range(2):
        t0 = time.time()
        for _ in range(n_e2e):
            state, m = train_step(state, next(batches))
        float(m["total-loss"])
        e2e_imgs_per_sec = max(
            e2e_imgs_per_sec, n_e2e * train_bs / (time.time() - t0))
    batches.close()

    # ---- batched inference (full serving path incl. NMS) -------------------
    _mark("bf16 serving lane")
    infer = make_inference_fn(
        model, params, anchors, normalizer, compute_dtype=jnp.bfloat16)
    images = jnp.asarray(
        np.random.default_rng(0).uniform(0, 255, (infer_bs, 640, 640, 3)),
        jnp.float32)
    infer_dt = device_time(
        lambda im: infer(state.params, state.batch_stats, im),
        images, iters=20)
    infer_fps = infer_bs / infer_dt

    # ---- end-to-end eval path (Executor.evaluate loop shape) ---------------
    # host JPEG decode -> background-prefetched H2D -> device inference ->
    # one-deep pipelined detection gather. The residual vs the
    # device-resident rate above is pinned on tunnel transport
    # (reports/e2e_breakdown.json: H2D 0.08-0.10 GB/s, dispatch RTT ~27 ms);
    # real TPU hosts have PCIe-attached chips and multi-core feeds.
    _mark("e2e eval path")
    from retinanet_tpu.data.prefetch import DevicePrefetcher as _DP
    # make_inference_fn returns a plain fn (device_time jits internally
    # for the serving lanes above); the eval loop dispatches it directly,
    # so jit here — the raw fn would run op-by-op over the tunnel
    infer_j = jax.jit(infer)
    n_eval = 12

    def _eval_pass():
        legs = {"host_wait_s": 0.0, "dispatch_s": 0.0, "gather_s": 0.0}
        val_iter = iter(InputPipeline("val", params, batch_size=infer_bs))

        def _staged_val():
            b = next(val_iter)
            return mesh_lib.shard_global_batch(
                {"image": b["image"]}, mesh)["image"]

        staged = _DP(_staged_val, depth=2)
        pending = None
        for _ in range(3):  # warmup: first pass pays the jit compile
            x = next(staged)
            pending = infer_j(state.params, state.batch_stats, x)
        jax.device_get(pending)
        pending = None
        t0 = time.time()
        for _ in range(n_eval):
            t1 = time.perf_counter()
            x = next(staged)
            legs["host_wait_s"] += time.perf_counter() - t1
            t1 = time.perf_counter()
            det = infer_j(state.params, state.batch_stats, x)
            legs["dispatch_s"] += time.perf_counter() - t1
            if pending is not None:
                t1 = time.perf_counter()
                jax.device_get(pending)
                legs["gather_s"] += time.perf_counter() - t1
            pending = det
        jax.device_get(pending)
        rate = n_eval * infer_bs / (time.time() - t0)
        staged.close()
        return rate, legs

    # best of 2 passes (same tunnel-tail rationale as the train loop)
    eval_e2e_imgs_per_sec, eval_legs = max(
        (_eval_pass() for _ in range(2)), key=lambda t: t[0])

    # ---- int8-activation serving (s8xs8->s32 convs on the MXU) -------------
    # Speed-only here (minmax calibration on synthetic batches); the
    # quality delta on a trained model is measured separately
    # (tools/int8_quality_check.py: AP 0.7137 fp -> 0.7092 int8-entropy).
    from retinanet_tpu.export.calibration import calibrate_activations
    from retinanet_tpu.export.quantize import Int8Model
    _mark("int8 serving lane (calibrate + compile)")
    calib = [np.asarray(np.random.default_rng(i).uniform(
        0, 255, (4, 640, 640, 3)), np.float32) for i in range(2)]
    scales = calibrate_activations(
        model, {"params": state.params, "batch_stats": state.batch_stats},
        calib, mode="minmax",
        preprocess=lambda im: normalizer(im).astype(jnp.bfloat16))
    infer_q = make_inference_fn(
        Int8Model(model, scales), params, anchors, normalizer,
        compute_dtype=jnp.bfloat16)
    int8_dt = device_time(
        lambda im: infer_q(state.params, state.batch_stats, im),
        images, iters=20)
    int8_fps = infer_bs / int8_dt
    # peak-throughput serving point (reports/serving_sweep_640.json:
    # int8 FPS peaks at bs16 across the bs 1..32 sweep)
    _mark("int8 bs16 serving point")
    images16 = jnp.concatenate([images, images], axis=0)
    int8_dt16 = device_time(
        lambda im: infer_q(state.params, state.batch_stats, im),
        images16, iters=20)
    int8_fps16 = 16 / int8_dt16

    _mark("done; printing")
    print(json.dumps({
        "metric": "train images/sec/chip (640x640, bf16, full step)",
        "value": round(train_imgs_per_sec_per_chip, 2),
        "unit": "imgs/s/chip",
        "vs_baseline": round(
            train_imgs_per_sec_per_chip
            / BASELINE_TRAIN_IMGS_PER_SEC_PER_CHIP, 3),
        "train_batch_size": train_bs,
        "train_step_ms": round(dt * 1000, 2),
        "n_chips": n_chips,
        "infer_fps_bs8": round(infer_fps, 1),
        "infer_fps_vs_target90": round(infer_fps / BASELINE_INFER_FPS, 3),
        "infer_latency_ms": round(infer_dt * 1000, 2),
        "int8_infer_fps_bs8": round(int8_fps, 1),
        "int8_infer_fps_bs16": round(int8_fps16, 1),
        "flops_per_image_fwd_g": round(fwd_flops_img / 1e9, 1),
        "train_flops_per_step_g": round(train_flops_step / 1e9, 1),
        "achieved_tflops_train": round(achieved_tflops_train, 1),
        "achieved_tflops_infer": round(
            fwd_flops_img * infer_fps / 1e12, 1),
        # peak scales with attached chips: achieved_tflops_train is a
        # whole-job number (global batch / wall time)
        "mfu_train": round(
            achieved_tflops_train / (PEAK_BF16_TFLOPS * n_chips), 3),
        "measured_hbm_gbps": round(hbm_gbps, 1),
        "input_bound_imgs_per_sec": round(e2e_imgs_per_sec, 1),
        # full eval path: host decode -> prefetched H2D -> infer -> pipelined
        # gather (Executor.evaluate shape; see reports/eval_walltime.json for
        # the Executor-level number with COCOeval included, and
        # reports/e2e_breakdown.json for the transport decomposition)
        "eval_imgs_per_sec_e2e": round(eval_e2e_imgs_per_sec, 1),
        "eval_legs_ms_per_batch": {
            k[:-2]: round(v * 1000 / n_eval, 1)
            for k, v in eval_legs.items()},
        # host pipeline alone (native GIL-free JPEG decode -> native fused
        # resample/crop/flip/pad -> collate) on this sandbox's SINGLE core;
        # the gap between this and input_bound is CPU contention with the
        # tunnel client's transfer / dispatch threads, which disappears on
        # real multi-core TPU hosts
        "host_pipeline_imgs_per_sec": round(host_imgs_per_sec, 1),
        "host_cores": os.cpu_count(),
        # host CPU cores needed to keep ONE chip fed at the device rate
        # (reference fed 32 chips from tf.data on multi-core hosts;
        # real TPU hosts have dozens of cores per chip)
        "feed_cores_per_chip": round(
            train_imgs_per_sec_per_chip / host_imgs_per_sec, 2),
    }))


if __name__ == "__main__":
    main()
