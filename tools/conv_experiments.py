"""Per-shape conv microbenchmark: the ACHIEVABLE floor for the step's convs.

Parses the compiled train-step HLO (tools/roofline_decomposition.py dumps
it), extracts every convolution's (lhs, rhs, window, dim_labels,
feature_group_count), de-duplicates, and times each spec standalone on
the chip. Summing count x standalone-ms gives the conv-class floor this
hardware can actually reach for these shapes — pure-FLOPs MXU floors are
unachievable for stride-2 / small-spatial / low-channel convs, so "x1.7
above FLOPs floor" alone does not prove headroom.

Usage:
  PYTHONPATH=/root/.axon_site:. python tools/roofline_decomposition.py 1  # writes nothing; or
  PYTHONPATH=/root/.axon_site:. python tools/conv_experiments.py [hlo.txt]
(default HLO path: /tmp/step_hlo.txt — regenerate via
 step.lower(...).compile().as_text() if stale)
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import retinanet_tpu.core.cache  # noqa: F401

import collections
import re
import sys

import jax
import jax.numpy as jnp
import numpy as np

from retinanet_tpu.utils.benchmark import device_time
from tools.roofline_decomposition import parse_hlo

_WINDOW = re.compile(r"window=\{([^}]*)\}")
_LABELS = re.compile(r"dim_labels=(\S+?)(?:,|$)")
_FGC = re.compile(r"feature_group_count=(\d+)")
_OPERANDS = re.compile(r"convolution\(([^)]*)\)")
_OUT = re.compile(r"= (f32|bf16)\[([0-9,]+)\]")


def _win_attr(win: str, key: str, default: str) -> str:
    m = re.search(key + r"=(\S+)", win)
    return m.group(1) if m else default


def extract_convs(hlo_text: str):
    """-> list of dicts describing every convolution instruction."""
    _, _, _, shape_map = parse_hlo(hlo_text)
    convs = []
    for line in hlo_text.splitlines():
        s = line.strip()
        if " convolution(" not in s:
            continue
        out = _OUT.search(s)
        ops = _OPERANDS.search(s)
        if not out or not ops:
            continue
        names = [o.strip().lstrip("%") for o in ops.group(1).split(",")]
        lhs = shape_map.get(names[0])
        rhs = shape_map.get(names[1])
        if lhs is None or rhs is None:
            continue
        win = _WINDOW.search(s)
        win = win.group(1) if win else ""
        labels = _LABELS.search(s)
        convs.append({
            "out_dtype": out.group(1),
            "out": tuple(int(d) for d in out.group(2).split(",")),
            "lhs": tuple(lhs), "rhs": tuple(rhs),
            "window": win,
            "labels": labels.group(1) if labels else "b01f_01io->b01f",
            "fgc": int(_FGC.search(s).group(1)) if _FGC.search(s) else 1,
            # lhs/rhs dtypes from the defining instructions are not carried
            # in shape_map; assume bf16 inputs (the step's compute dtype)
        })
    return convs


def _parse_pair(txt: str, default=(1, 1)):
    if not txt:
        return default
    return tuple(int(v) for v in txt.split("x"))


def _parse_pad(txt: str):
    if not txt:
        return ((0, 0), (0, 0))
    return tuple(tuple(int(v) for v in p.split("_")) for p in txt.split("x"))


def bench_conv(spec, iters=30):
    """Standalone jit conv with the exact HLO parameters."""
    size = _parse_pair(_win_attr(spec["window"], "size", "1x1"))
    stride = _parse_pair(_win_attr(spec["window"], "stride", "1x1"))
    pad = _parse_pad(_win_attr(spec["window"], "pad", ""))
    lhs_dil = _parse_pair(_win_attr(spec["window"], "lhs_dilate", "1x1"))
    rhs_dil = _parse_pair(_win_attr(spec["window"], "rhs_dilate", "1x1"))
    rev = "rhs_reversal=1x1" in spec["window"]

    lab = spec["labels"]
    lhs_spec, rhs_spec = lab.split("->")[0].split("_")
    out_spec = lab.split("->")[1]

    def to_str(s):
        # HLO dim chars -> jax spec letters (b=N batch, f=C feature,
        # i/o=I/O, digits=spatial). Wgrad convs carry exotic orders like
        # f01b_i01o->01bf; jax accepts any permutation string.
        table = {"b": "N", "f": "C", "i": "I", "o": "O"}
        return "".join(table[ch] if ch in table else "HW"[int(ch)]
                       for ch in s)

    dn = jax.lax.conv_dimension_numbers(
        spec["lhs"], spec["rhs"],
        (to_str(lhs_spec), to_str(rhs_spec), to_str(out_spec)))

    lhs = jnp.asarray(np.random.default_rng(0).normal(
        0, 1, spec["lhs"]), jnp.bfloat16)
    rhs = jnp.asarray(np.random.default_rng(1).normal(
        0, 1, spec["rhs"]), jnp.bfloat16)
    out_dtype = jnp.float32 if spec["out_dtype"] == "f32" else jnp.bfloat16

    def f(lhs, rhs):
        y = jax.lax.conv_general_dilated(
            lhs, rhs, window_strides=stride, padding=pad,
            lhs_dilation=lhs_dil, rhs_dilation=rhs_dil,
            dimension_numbers=dn,
            feature_group_count=spec["fgc"],
            preferred_element_type=out_dtype)
        if rev:
            # rhs reversal (dgrad): bake into the kernel outside the timer
            return y
        return y

    if rev:
        rhs = jnp.flip(rhs, axis=(rhs_spec.index("0"), rhs_spec.index("1")))
    fj = jax.jit(f)
    fj(lhs, rhs)  # compile
    dt = device_time(lambda l: fj(l, rhs), lhs, iters=iters)
    ksize = size[0] * size[1]
    cin = spec["rhs"][rhs_spec.index("i")] if "i" in rhs_spec else 1
    flops = 2.0 * np.prod(spec["out"]) * ksize * cin / spec["fgc"]
    return dt * 1e3, flops / dt / 1e12


def make_conv_callable(spec):
    """(lhs, rhs) -> conv output with the exact HLO parameters, plus the
    input builders. Returns (fn, lhs_shape, rhs_shape, flops)."""
    size = _parse_pair(_win_attr(spec["window"], "size", "1x1"))
    stride = _parse_pair(_win_attr(spec["window"], "stride", "1x1"))
    pad = _parse_pad(_win_attr(spec["window"], "pad", ""))
    lhs_dil = _parse_pair(_win_attr(spec["window"], "lhs_dilate", "1x1"))
    rhs_dil = _parse_pair(_win_attr(spec["window"], "rhs_dilate", "1x1"))
    lab = spec["labels"]
    lhs_spec, rhs_spec = lab.split("->")[0].split("_")
    out_spec = lab.split("->")[1]

    def to_str(s):
        table = {"b": "N", "f": "C", "i": "I", "o": "O"}
        return "".join(table[ch] if ch in table else "HW"[int(ch)]
                       for ch in s)

    dn = jax.lax.conv_dimension_numbers(
        spec["lhs"], spec["rhs"],
        (to_str(lhs_spec), to_str(rhs_spec), to_str(out_spec)))
    out_dtype = jnp.float32 if spec["out_dtype"] == "f32" else jnp.bfloat16

    def f(lhs, rhs):
        return jax.lax.conv_general_dilated(
            lhs, rhs, window_strides=stride, padding=pad,
            lhs_dilation=lhs_dil, rhs_dilation=rhs_dil,
            dimension_numbers=dn, feature_group_count=spec["fgc"],
            preferred_element_type=out_dtype)

    cin = spec["rhs"][rhs_spec.index("i")] if "i" in rhs_spec else 1
    flops = 2.0 * float(np.prod(spec["out"])) * size[0] * size[1] * cin \
        / spec["fgc"]
    return f, spec["lhs"], spec["rhs"], flops


def chained_total(groups, spec_of, iters=8):
    """ONE jitted program running every conv spec once, serialized by a
    data dependency — one compile instead of 2-per-spec, and the sum is
    the quantity of interest (the achievable conv floor). Inputs derive
    from the runtime carry (iota + carry) so nothing constant-folds.
    Each spec runs its per-step `count` times INSIDE the chain, so the
    returned time is the count-weighted total for one step's convs."""
    built = []
    for key, count in groups.items():
        spec = spec_of[key]
        try:
            f, lhs_shape, rhs_shape, flops = make_conv_callable(spec)
        except Exception as e:  # noqa: BLE001
            print(f"  SKIP {key}: {type(e).__name__}: {e}", flush=True)
            continue
        built.append((f, lhs_shape, rhs_shape, flops, count))

    # Real random inputs passed through the input pytree (iota-derived
    # inputs let XLA collapse the whole chain — measured 1756 "TFLOP/s").
    # Serialization rides a SCALAR carry injected into each (tiny) kernel:
    # rhs_i += carry*0 makes conv_i depend on conv_{i-1}'s output, and
    # carry += out[0]*0 keeps every output live (f32 x*0 is not foldable,
    # NaN semantics). A full-array carry (utils.benchmark.device_time's
    # trick) would add a 52 MB stream per conv and swamp sub-ms ops.
    rng = np.random.default_rng(0)
    lhs_args = []
    rhs_args = []
    for i, (f, lhs_shape, rhs_shape, _, _) in enumerate(built):
        lhs_args.append(jnp.asarray(
            rng.normal(0, 1, lhs_shape), jnp.bfloat16))
        rhs_args.append(jnp.asarray(
            rng.normal(0, 1, rhs_shape), jnp.bfloat16))

    def chain(args):
        lhss, rhss, seed = args["lhs"], args["rhs"], args["seed"]
        acc = seed
        for i, (f, _, _, _, count) in enumerate(built):
            for _ in range(count):
                rhs = rhss[i] + acc.astype(jnp.bfloat16) * 0
                out = f(lhss[i], rhs)
                # liveness via a RUNTIME-indexed element: a static slice
                # of a conv can be folded into a receptive-field mini-conv
                # by the simplifier; a data-dependent index cannot
                idx = jnp.asarray(acc, jnp.int32) % out.shape[0]
                val = jax.lax.dynamic_slice(
                    out, (idx,) + (0,) * (out.ndim - 1), (1,) * out.ndim)
                acc = acc + val.astype(jnp.float32).sum() * 0.0
        return acc

    import time as _time
    cj = jax.jit(chain)
    args = {"lhs": lhs_args, "rhs": rhs_args,
            "seed": jnp.zeros((), jnp.float32)}
    float(cj(args))  # compile
    t0 = _time.perf_counter()
    for _ in range(iters):
        out = cj(args)
    float(out)
    per_chain = (_time.perf_counter() - t0) / iters
    total_flops = sum(f * c for _, _, _, f, c in built)
    return per_chain * 1e3, total_flops


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/step_hlo.txt"
    with open(path) as f:
        text = f.read()
    convs = extract_convs(text)
    print(f"{len(convs)} convolution instructions")
    groups = collections.Counter()
    spec_of = {}
    for c in convs:
        key = (c["out_dtype"], c["out"], c["lhs"], c["rhs"], c["window"],
               c["labels"], c["fgc"])
        groups[key] += 1
        spec_of[key] = c

    if "--chain" in sys.argv:
        total_ms, total_flops = chained_total(groups, spec_of)
        print(f"count-weighted conv total (all step convs, chained): "
              f"{total_ms:.2f} ms "
              f"({total_flops / 1e12:.2f} TFLOP -> "
              f"{total_flops / (total_ms / 1e3) / 1e12:.1f} TFLOP/s)")
        return

    def est_flops(key):
        spec = spec_of[key]
        size = _parse_pair(_win_attr(spec["window"], "size", "1x1"))
        lab_rhs = spec["labels"].split("->")[0].split("_")[1]
        cin = spec["rhs"][lab_rhs.index("i")] if "i" in lab_rhs else 1
        return 2.0 * float(np.prod(key[1])) * float(np.prod(size)) * cin \
            / spec["fgc"]

    # bench specs by descending estimated FLOPs until 99% of total conv
    # FLOPs is covered — the long tail of tiny head/P6/P7 convs costs
    # compile time (~30s each on the tunneled chip) and proves nothing
    ordered = sorted(groups.items(), key=lambda kv: -est_flops(kv[0])
                     * kv[1])
    grand = sum(est_flops(k) * c for k, c in ordered)
    print(f"{'count':>5s} {'ms each':>8s} {'ms total':>9s} {'TFLOP/s':>8s}"
          f"  lhs x rhs (window)", flush=True)
    total_ms = 0.0
    total_flops = 0.0
    covered = 0.0
    skipped_flops = 0.0
    for key, count in ordered:
        if covered / grand > 0.99:
            skipped_flops += est_flops(key) * count
            continue
        spec = spec_of[key]
        try:
            ms, tflops = bench_conv(spec)
        except Exception as e:  # noqa: BLE001 - report and continue
            print(f"  SKIP {key}: {type(e).__name__}: {e}", flush=True)
            covered += est_flops(key) * count
            continue
        total_ms += count * ms
        total_flops += count * tflops * 1e12 * (ms / 1e3)
        covered += est_flops(key) * count
        print(f"{count:5d} {ms:8.3f} {count * ms:9.3f} {tflops:8.1f}  "
              f"{spec['lhs']} x {spec['rhs']} ({spec['window']}) "
              f"fgc={spec['fgc']} {spec['labels']}", flush=True)
    print(f"\nTOTAL standalone conv time: {total_ms:.2f} ms over "
          f"{100 * covered / grand:.1f}% of conv FLOPs "
          f"({total_flops / 1e12:.2f} TFLOP -> "
          f"{total_flops / max(total_ms, 1e-9) * 1e3 / 1e12:.1f} TFLOP/s "
          f"aggregate; {skipped_flops / 1e9:.1f} GFLOP tail skipped)")


if __name__ == "__main__":
    main()
