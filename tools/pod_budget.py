"""Pod step-time budget: measured all-reduce bytes + an ICI model.

BASELINE.md's third target is pod step time vs the reference's v3-32
steady state (~198 ms per 256-image step, reference README.md:74-76).
This sandbox has one chip, so the pod number cannot be measured — but
its ingredients can:

  1. BYTES ALL-REDUCED PER STEP, measured from the compiled HLO of the
     flagship train step on an 8-device virtual mesh (the gradient
     all-reduce the SPMD partitioner actually emits — op count, dtypes,
     and total bytes; a wrong sharding default would show up here as
     extra or oversized collectives).
  2. COLLECTIVE SCHEDULE SHAPE: whether XLA emitted one fused gradient
     all-reduce or many small ones, and whether async (start/done) pairs
     are present. NOTE: async collective overlap is a TPU-backend
     scheduling property — the CPU backend used for the virtual mesh
     compiles synchronous collectives, so presence/absence of async ops
     here says nothing about the TPU schedule; what IS portable is the
     count and size of the collectives (the SPMD partitioning decision).
  3. AN ICI-BANDWIDTH MODEL projecting the pod step time: ring
     all-reduce cost 2*B*(N-1)/N / bw_effective on top of the measured
     single-chip device step, swept over published-order ICI bandwidths.

What only a real pod can confirm: actual overlap of the gradient
all-reduce with the backward pass (XLA:TPU latency-hiding scheduler),
DCN behavior across slices, and host input scaling. The model below
brackets the collective cost at <6% of the step even fully serialized,
so the >=40% target does not hinge on the unconfirmable part.

Usage: python tools/pod_budget.py [--n_devices 8]
       [--out reports/pod_budget.json]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

# Reference pod baseline (reference README.md:74-76): v3-32, global batch
# 256, ~1259-1290 imgs/s steady state => ~198-203 ms/step.
REF_POD_IMGS_PER_SEC = 1259.0
REF_POD_STEP_MS = 256.0 / REF_POD_IMGS_PER_SEC * 1000.0

# Measured on the real chip (BENCH_r04): full train step, bs8@640, bf16.
MEASURED_CHIP_STEP_MS = 52.49
MEASURED_CHIP_BS = 8


def _analyze_hlo(n_devices: int) -> dict:
    """Compile the flagship-parameter train step on an n-device virtual
    mesh and account every collective in the optimized HLO."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    import __graft_entry__ as graft
    from retinanet_tpu.data import anchors as anchor_lib
    from retinanet_tpu.data.label_encoder import make_batched_encoder
    from retinanet_tpu.data.preprocessing import make_device_normalizer
    from retinanet_tpu.data.synthetic import synthetic_train_batch
    from retinanet_tpu.losses.losses import RetinaNetLoss
    from retinanet_tpu.models.retinanet import build_model
    from retinanet_tpu.optimizers.builder import build_optimizer
    from retinanet_tpu.train import step as step_lib
    from retinanet_tpu.train.train_state import create_train_state

    # Full flagship PARAMETER tree (depth 50, 256 filters, 4 head convs,
    # levels 3-7) at tiny input: all-reduce bytes depend on the gradient
    # tree, not the activations, and tiny input keeps the CPU compile fast.
    params = graft._flagship_params(input_shape=(128, 128), depth=50,
                                    max_level=7, filters=256)
    model = build_model(params)
    anchors = anchor_lib.from_params(params)
    encoder = make_batched_encoder(anchors, params.encoder_params)
    normalizer = make_device_normalizer(params)
    loss_fn = RetinaNetLoss(80, params.loss)
    tx, schedule = build_optimizer(params.training.optimizer, 1000)

    devices = jax.devices()[:n_devices]
    mesh = Mesh(np.asarray(devices), ("data",))
    batch = synthetic_train_batch(n_devices, (128, 128), 10, 80, seed=0)

    variables = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, 128, 128, 3)), train=False),
        jax.random.PRNGKey(0))
    n_params = sum(int(np.prod(v.shape)) for v in
                   jax.tree_util.tree_leaves(variables["params"]))

    def init_state(k):
        v = model.init(k, jnp.zeros((1, 128, 128, 3)), train=False)
        return create_train_state(v, tx)

    state = jax.jit(init_state,
                    out_shardings=NamedSharding(mesh, P()))(
        jax.random.PRNGKey(0))
    sharded_batch = {
        k: jax.device_put(np.asarray(v), NamedSharding(
            mesh, P("data", *[None] * (np.asarray(v).ndim - 1))))
        for k, v in batch.items()}

    train_step = jax.jit(
        step_lib.make_train_step(
            model, loss_fn, encoder, normalizer, tx, schedule,
            use_weight_decay=True, weight_decay_alpha=1e-4,
            compute_dtype=jnp.bfloat16),
        donate_argnums=(0,))
    compiled = train_step.lower(state, sharded_batch).compile()
    hlo = compiled.as_text()

    dtype_bytes = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
                   "f64": 8, "s8": 1, "u8": 1, "pred": 1}
    ops = []
    # all-reduce ops: "%all-reduce.N = TYPE all-reduce(...)" where TYPE is
    # a shape like f32[256,256,3,3] or a tuple of shapes
    pat = re.compile(
        r"=\s*((?:\([^)]*\))|(?:[a-z0-9]+\[[0-9,]*\]))[^=]*?"
        r"(all-reduce(?:-start)?)\(", re.M)
    for m in pat.finditer(hlo):
        shapes, kind = m.group(1), m.group(2)
        total = 0
        for sm in re.finditer(r"([a-z0-9]+)\[([0-9,]*)\]", shapes):
            dt, dims = sm.group(1), sm.group(2)
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            total += n * dtype_bytes.get(dt, 4)
        ops.append({"kind": kind, "bytes": total})

    n_async = len(re.findall(r"all-reduce-start", hlo))
    counts = {}
    for o in ops:
        counts[o["kind"]] = counts.get(o["kind"], 0) + 1
    sizes = sorted((o["bytes"] for o in ops), reverse=True)
    return {
        "n_devices": n_devices,
        "n_params": n_params,
        "top5_all_reduce_mb": [round(s / 1e6, 3) for s in sizes[:5]],
        "all_reduce_under_1kb": sum(1 for s in sizes if s < 1024),
        "all_reduce_ops": len(ops),
        "all_reduce_by_kind": counts,
        "all_reduce_total_mb": round(sum(o["bytes"] for o in ops) / 1e6, 2),
        "largest_all_reduce_mb": round(
            max((o["bytes"] for o in ops), default=0) / 1e6, 2),
        "async_start_ops": n_async,
        "other_collectives": {
            k: len(re.findall(rf"= [^=]*{k}\(", hlo))
            for k in ("all-gather", "reduce-scatter", "collective-permute",
                      "all-to-all")},
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_devices", type=int, default=8)
    ap.add_argument("--out", default="reports/pod_budget.json")
    ap.add_argument("--_child", action="store_true")
    args = ap.parse_args()

    import jax
    if not args._child and jax.device_count() < args.n_devices:
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                       env.get("XLA_FLAGS", "")).strip()
        env["XLA_FLAGS"] = (
            f"{flags} --xla_force_host_platform_device_count="
            f"{args.n_devices}").strip()
        code = (
            "import jax; jax.config.update('jax_platforms', 'cpu'); "
            "import sys; sys.argv += ['--_child']; "
            "from tools.pod_budget import main; main()")
        proc = subprocess.run(
            [sys.executable, "-c", code] , env=env, cwd=_REPO,
            capture_output=True, text=True)
        print(proc.stdout)
        if proc.returncode != 0:
            print(proc.stderr[-3000:], file=sys.stderr)
            raise SystemExit(proc.returncode)
        return

    hlo_stats = _analyze_hlo(args.n_devices)

    # ---- ICI model ----------------------------------------------------------
    # Ring all-reduce on N chips moves 2*B*(N-1)/N bytes per chip through
    # its ICI links. Effective bandwidth swept over published-order values
    # (TPU v3 ICI ~70-100 GB/s per link, 2-4 usable links on the 2-D torus)
    # — the model's job is bracketing, not precision.
    B = hlo_stats["all_reduce_total_mb"] * 1e6
    n_pod = 32
    projections = {}
    for bw_gbps in (45, 90, 180):
        t_ar_ms = 2 * B * (n_pod - 1) / n_pod / (bw_gbps * 1e9) * 1000
        serial = MEASURED_CHIP_STEP_MS + t_ar_ms
        projections[f"ici_{bw_gbps}gbps"] = {
            "all_reduce_ms": round(t_ar_ms, 2),
            "pod_step_ms_fully_serial": round(serial, 2),
            "pod_step_ms_overlapped": MEASURED_CHIP_STEP_MS,
            "pod_imgs_per_sec_serial": round(
                n_pod * MEASURED_CHIP_BS / serial * 1000, 0),
            "vs_reference_serial": round(REF_POD_STEP_MS / serial, 2),
        }

    report = {
        "hlo": hlo_stats,
        "measured_chip_step_ms_bs8_640": MEASURED_CHIP_STEP_MS,
        "reference_pod_step_ms": round(REF_POD_STEP_MS, 1),
        "reference_pod_imgs_per_sec": REF_POD_IMGS_PER_SEC,
        "pod_model_v3_32": projections,
        "notes": [
            "all-reduce bytes/ops measured from the compiled 8-device HLO "
            "(SPMD partitioning decision — portable to TPU)",
            "async overlap is decided by the XLA:TPU latency-hiding "
            "scheduler and cannot be compiled for in this sandbox; the "
            "serial projection is the worst case",
            "projection holds the measured single-chip step (52.49 ms "
            "bs8@640 bf16) fixed; host input scaling assumed non-binding "
            "on real multi-core TPU hosts (see reports/e2e_breakdown.json "
            "for this sandbox's transport-bound reality)",
        ],
    }
    print(json.dumps(report, indent=1))
    out = os.path.join(_REPO, args.out)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
