"""Decompose the end-to-end train/eval gap with DIRECT measurements.

BENCH_r04 left a 3.5x train gap (device 152.4 vs input-bound 43.9
imgs/s) and a 46x eval gap (device 350 FPS vs e2e 7.6 imgs/s) attributed
to "tunnel contention" without measurements. This tool pins each leg on
this host:

  (a) per-dispatch round-trip latency of a trivial jitted fn (serial vs
      pipelined), and the cost of one tiny device_get — the fixed tax
      every dispatch/fetch pays on the tunneled runtime;
  (b) H2D upload time of one uint8 train batch (9.8 MB at bs8/640²) and
      one eval batch, plus a size sweep giving effective H2D bandwidth;
  (c) D2H fetch time of one detection pytree (the eval gather unit) and
      a 1.6 MB fetch giving D2H bandwidth;
  (d) device-resident inference rate (no transfers in the loop) vs
      fresh-H2D-per-batch inference, serial and with the production
      DevicePrefetcher;
  (e) host pipeline rate alone vs WHILE the device steps on a resident
      batch (separates CPU contention from transfer cost).

The reconciliation at the end must explain the observed e2e rates as a
sum/max of measured legs — anything unexplained is flagged, not
hand-waved. Reference comparison: the reference's tf.data + TPUStrategy
infeed kept pods fed (reference dataloader/input_pipeline.py:57-92) and
its eval loop was never transport-bound (reference executor.py:472-545);
on real TPU-VM hosts (dozens of cores, PCIe-attached chips) legs (a)-(c)
are orders of magnitude cheaper, so this decomposition states exactly
what is sandbox transport vs what the framework owns.

Usage: python tools/e2e_decomposition.py [--size 640] [--bs 8]
       [--out reports/e2e_breakdown.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def median_time(fn, reps=7):
    """Median wall seconds of fn() over reps calls (fn must block)."""
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--bs", type=int, default=8)
    ap.add_argument("--out", default="reports/e2e_breakdown.json")
    ap.add_argument("--skip_model", action="store_true",
                    help="transport probes only (no model build)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    report = {"size": args.size, "bs": args.bs,
              "platform": str(jax.devices()[0])}
    dev = jax.devices()[0]

    # ---- (a) dispatch round-trip + tiny fetch ------------------------------
    tiny = jax.device_put(jnp.zeros((8,), jnp.float32), dev)
    bump = jax.jit(lambda x: x + 1.0)
    bump(tiny).block_until_ready()

    def serial_dispatch():
        float(bump(tiny)[0])  # scalar fetch forces the full round trip

    rtt = median_time(serial_dispatch)
    report["dispatch_roundtrip_ms"] = round(rtt * 1000, 2)

    def pipelined_dispatch():
        outs = [bump(tiny) for _ in range(20)]
        float(outs[-1][0])

    piped = median_time(pipelined_dispatch, reps=3) / 20
    report["dispatch_pipelined_ms"] = round(piped * 1000, 3)

    def tiny_fetch():
        np.asarray(jax.device_get(tiny))

    report["tiny_device_get_ms"] = round(median_time(tiny_fetch) * 1000, 2)

    # ---- (b) H2D upload ----------------------------------------------------
    # device_put alone may return before the copy lands; chase it with a
    # dependent scalar reduction so the timing includes completion.
    reduce_u8 = jax.jit(lambda x: jnp.sum(x, dtype=jnp.int32))

    def h2d_time(arr):
        def once():
            x = jax.device_put(arr, dev)
            int(reduce_u8(x))
        # subtract the dispatch+fetch tax measured in (a)
        return max(median_time(once) - rtt, 0.0)

    img_train = np.zeros((args.bs, args.size, args.size, 3), np.uint8)
    train_batch_mb = img_train.nbytes / 1e6
    t_train = h2d_time(img_train)
    report["h2d_train_batch_uint8"] = {
        "mb": round(train_batch_mb, 1), "ms": round(t_train * 1000, 1),
        "gbps": round(img_train.nbytes / max(t_train, 1e-9) / 1e9, 3)}

    sweep = {}
    for mb in (1, 4, 16, 64):
        arr = np.zeros((mb * 1 << 20,), np.uint8)
        t = h2d_time(arr)
        sweep[f"{mb}MB"] = {"ms": round(t * 1000, 1),
                            "gbps": round(arr.nbytes / max(t, 1e-9) / 1e9,
                                          3)}
    report["h2d_sweep"] = sweep

    # ---- (c) D2H fetch -----------------------------------------------------
    # Arrays must be PRODUCED on device (via jit) — device_put keeps the
    # host buffer, making device_get of an uploaded array free and the
    # measurement meaningless.
    # jax.Array caches its fetched host copy, so each rep must fetch a
    # FRESH device-produced array (scalar-seeded jit output).
    mk_dets = jax.jit(lambda s: {
        "boxes": jnp.full((args.bs, 100, 4), s, jnp.float32),
        "scores": jnp.full((args.bs, 100), s, jnp.float32),
        "classes": jnp.zeros((args.bs, 100), jnp.int32),
        "valid_detections": jnp.zeros((args.bs,), jnp.int32)})
    jax.block_until_ready(mk_dets(0.0))
    seed = iter(range(1, 1000))

    def fetch_dets():
        jax.device_get(mk_dets(float(next(seed))))

    report["d2h_detection_pytree_ms"] = round(
        max(median_time(fetch_dets) - rtt, 0.0) * 1000, 2)

    mk_big = jax.jit(lambda s: jnp.full((400, 1024), s, jnp.float32))
    jax.block_until_ready(mk_big(0.0))

    def fetch_big():
        np.asarray(jax.device_get(mk_big(float(next(seed)))))

    t_big = max(median_time(fetch_big) - rtt, 1e-9)
    report["d2h_1p6mb_ms"] = round(t_big * 1000, 2)
    report["d2h_gbps"] = round(400 * 1024 * 4 / t_big / 1e9, 3)

    if args.skip_model:
        _finish(report, args)
        return

    # ---- model-level legs --------------------------------------------------
    import retinanet_tpu.core.cache  # noqa: F401
    from retinanet_tpu.core.config import Config
    from retinanet_tpu.data import anchors as anchor_lib
    from retinanet_tpu.data.preprocessing import make_device_normalizer
    from retinanet_tpu.models.retinanet import build_model
    from retinanet_tpu.ops.postprocess import make_inference_fn
    from retinanet_tpu.utils.benchmark import device_time

    cfg_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "configs", "v3-32", "mscoco-retinanet-resnet50-640x640-30x-256.json")
    params = Config(cfg_path).params
    params.input.input_shape = [args.size, args.size]
    model = build_model(params)
    anchors = anchor_lib.from_params(params)
    normalizer = make_device_normalizer(params)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, args.size, args.size, 3)),
                           train=False)
    infer = jax.jit(make_inference_fn(
        model, params, anchors, normalizer, compute_dtype=jnp.bfloat16))
    m_params, m_stats = variables["params"], variables.get("batch_stats", {})

    images_dev = jax.device_put(
        jnp.zeros((args.bs, args.size, args.size, 3), jnp.uint8), dev)
    jax.tree_util.tree_map(
        lambda x: x.block_until_ready(),
        infer(m_params, m_stats, images_dev))

    # (d1) device-resident inference rate (device_time amortizes the tunnel)
    dt_resident = device_time(
        lambda im: infer(m_params, m_stats, im),
        jnp.zeros((args.bs, args.size, args.size, 3), jnp.uint8), iters=20)
    report["infer_device_resident"] = {
        "ms_per_batch": round(dt_resident * 1000, 1),
        "imgs_per_sec": round(args.bs / dt_resident, 1)}

    # (d2) serial per-batch [H2D -> dispatch -> gather] — the naive eval loop
    host_img = np.zeros((args.bs, args.size, args.size, 3), np.uint8)

    def serial_eval_batch():
        x = jax.device_put(host_img, dev)
        jax.device_get(infer(m_params, m_stats, x))

    t_serial = median_time(serial_eval_batch, reps=5)
    report["eval_serial_h2d_infer_gather"] = {
        "ms_per_batch": round(t_serial * 1000, 1),
        "imgs_per_sec": round(args.bs / t_serial, 1)}

    # (d3) pipelined: prefetcher stages H2D; gather of batch N rides under
    # inference of batch N+1 (the production Executor.evaluate loop)
    from retinanet_tpu.data.prefetch import DevicePrefetcher
    n_batches = 16

    def make_batch():
        return jax.device_put(host_img, dev)

    staged = DevicePrefetcher(make_batch, depth=2)
    pending = None
    t0 = time.perf_counter()
    for i in range(n_batches):
        x = next(staged)
        det = infer(m_params, m_stats, x)
        if pending is not None:
            jax.device_get(pending)
        pending = det
    jax.device_get(pending)
    t_piped = (time.perf_counter() - t0) / n_batches
    staged.close()
    report["eval_pipelined_loop"] = {
        "ms_per_batch": round(t_piped * 1000, 1),
        "imgs_per_sec": round(args.bs / t_piped, 1)}

    # ---- (e) host pipeline alone vs concurrent with device stepping --------
    import tempfile
    from retinanet_tpu.data.pipeline import InputPipeline
    from retinanet_tpu.data.synthetic import write_synthetic_tfrecords

    data_dir = os.path.join(tempfile.gettempdir(),
                            f"bench_tfrecords_{args.size}")
    pattern = os.path.join(data_dir, "bench-*")
    if not os.path.isdir(data_dir):
        write_synthetic_tfrecords(data_dir, "bench", num_shards=4,
                                  samples_per_shard=32)
    params.dataloader_params.tfrecords = {"train": pattern, "val": pattern}

    def host_rate():
        it = iter(InputPipeline("train", params, batch_size=args.bs))
        for _ in range(4):
            next(it)
        t0 = time.perf_counter()
        for _ in range(8):
            next(it)
        return 8 * args.bs / (time.perf_counter() - t0)

    report["host_pipeline_alone_imgs_per_sec"] = round(
        max(host_rate() for _ in range(3)), 1)

    # device loop on resident data in a thread; measure host rate under it
    stop = threading.Event()
    dev_batches = [0]

    def device_loop():
        # block_until_ready can return early on this runtime; force
        # progress with a scalar fetch every 8 dispatches (the fetch RTT
        # amortizes to ~3 ms/batch, ~13% of the 23 ms device time)
        x = images_dev
        last = None
        while not stop.is_set():
            last = infer(m_params, m_stats, x)
            dev_batches[0] += 1
            if dev_batches[0] % 8 == 0:
                float(jax.tree_util.tree_leaves(last)[0].reshape(-1)[0])

    th = threading.Thread(target=device_loop, daemon=True)
    th.start()
    time.sleep(1.0)
    t0 = time.perf_counter()
    concurrent = max(host_rate() for _ in range(2))
    span = time.perf_counter() - t0
    stop.set()
    th.join(timeout=10)
    report["host_pipeline_under_device_load_imgs_per_sec"] = round(
        concurrent, 1)
    report["device_batches_during_host_run"] = dev_batches[0]
    report["device_imgs_per_sec_under_host_load"] = round(
        dev_batches[0] * args.bs / span, 1)

    # ---- reconciliation ----------------------------------------------------
    # eval: the pipelined loop's per-batch time should be ~max(device
    # inference, H2D, host decode, gather tax); flag the residual.
    legs_ms = {
        "device_infer": report["infer_device_resident"]["ms_per_batch"],
        "h2d_batch": report["h2d_train_batch_uint8"]["ms"],
        "host_decode": round(
            1000 * args.bs
            / report["host_pipeline_alone_imgs_per_sec"], 1),
        "dispatch_rtt": report["dispatch_roundtrip_ms"],
        "gather": report["d2h_detection_pytree_ms"],
    }
    report["eval_legs_ms"] = legs_ms
    report["eval_predicted_pipelined_ms"] = round(max(legs_ms.values()), 1)
    report["eval_predicted_serial_ms"] = round(sum(legs_ms.values()), 1)
    report["eval_measured_pipelined_ms"] = report[
        "eval_pipelined_loop"]["ms_per_batch"]
    report["eval_unexplained_ms"] = round(
        report["eval_measured_pipelined_ms"]
        - report["eval_predicted_serial_ms"], 1)

    _finish(report, args)


def _finish(report, args):
    print(json.dumps(report, indent=1))
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
