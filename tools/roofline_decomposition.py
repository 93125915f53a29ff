"""Full-step roofline decomposition of the flagship train step.

Three ingredients, merged per-op:
  * xplane per-op SELF times on the device (same capture as
    tools/profile_step.py),
  * the compiled HLO module, parsed so every fusion is attributed to the
    opcodes INSIDE its called computation (TPU fuses convolutions with
    their BN/activation epilogues — name-based classification sees only
    "fusion"),
  * analytic conv FLOPs per instruction (output shape x window x Cin),
    so conv classes get an MXU-time floor; memory-bound classes get an
    HBM floor from the tensor shapes in their signatures.

Output: a ms-by-op-class table with floors — the "is the remaining step
time at its roofline floor?" evidence VERDICT r2 #3 asked for.

Usage: PYTHONPATH=/root/.axon_site:. python tools/roofline_decomposition.py [steps]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import retinanet_tpu.core.cache  # noqa: F401

import collections
import re
import sys
import tempfile

import jax

from tools.profile_step import aggregate_xplane, build_step

# measured aggregate read+write stream rate on this chip
# (tools/membw_experiments.py: ~125 GB/s per direction)
HBM_GBPS = 250.0
PEAK_BF16_TFLOPS = 197.0  # TPU v5e MXU peak

_DTYPE_BYTES = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "s8": 1, "u8": 1,
                "pred": 1, "f16": 2, "s16": 2, "u16": 2, "s64": 8, "u64": 8}
_SHAPE_RE = re.compile(r"\b(f32|bf16|f16|s32|u32|s8|u8|s16|u16|s64|u64|pred)"
                       r"\[([0-9,]*)\]")
_OPCODE_RE = re.compile(r"\}? ([a-z][a-z0-9-]*)\(")
_CALLS_RE = re.compile(r"calls=%([\w.-]+)")
_WINDOW_SIZE = re.compile(r"window=\{[^}]*size=(\d+)x(\d+)")
_FGC_RE = re.compile(r"feature_group_count=(\d+)")


def _numel(dims: str) -> int:
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n


def op_bytes(text: str) -> int:
    """Sum of all tensor literals in an HLO one-liner — a proxy for the
    HBM traffic of memory-bound ops (each output and operand once)."""
    return sum(_numel(dims) * _DTYPE_BYTES[dt]
               for dt, dims in _SHAPE_RE.findall(text))


_CONV_OPERANDS = re.compile(r"convolution\(([^)]*)\)")


def conv_flops(line: str, shape_map) -> float:
    """2 * prod(output) * kh * kw * Cin / feature_group_count.

    Operands in optimized HLO are bare instruction names; `shape_map`
    (name -> dims list) resolves the rhs kernel's [kh, kw, cin, cout]."""
    head = line.split(" = ", 1)
    if len(head) != 2:
        return 0.0
    out = _SHAPE_RE.search(head[1])
    if not out:
        return 0.0
    ops = _CONV_OPERANDS.search(line)
    kh = kw = 1
    cin = 0
    if ops:
        names = [o.strip().lstrip("%") for o in ops.group(1).split(",")]
        if len(names) >= 2:
            rhs = shape_map.get(names[1])
            if rhs and len(rhs) == 4:
                # rhs layout follows dim_labels' io part; for 01io (the
                # only layout XLA emits here) dims are [kh, kw, cin, cout]
                kh, kw, cin = rhs[0], rhs[1], rhs[2]
    if cin == 0:
        w = _WINDOW_SIZE.search(line)
        if w:
            kh, kw = int(w.group(1)), int(w.group(2))
        cin = 1  # lower bound when the kernel shape is unresolvable
    fgc = int(_FGC_RE.search(line).group(1)) if _FGC_RE.search(line) else 1
    return 2.0 * _numel(out.group(2)) * kh * kw * cin / fgc


def parse_hlo(text: str):
    """-> {computation: (set(opcodes), conv_flops)} with fusion calls
    resolved transitively, and {entry_instruction_name: hlo_line}."""
    comp_ops = {}
    comp_flops = {}
    comp_calls = collections.defaultdict(set)
    entry_lines = {}
    # pass 1: every defined value's dims (instruction defs + computation
    # header parameters) so conv operand shapes resolve
    shape_map = {}
    _def_re = re.compile(
        r"%?([\w.-]+)[ :]+= ?\(?(?:f32|bf16|f16|s32|u32|s8|u8|s16|u16|s64|"
        r"u64|pred)\[([0-9,]*)\]")
    _param_re = re.compile(
        r"%?([\w.-]+): (?:f32|bf16|f16|s32|u32|s8|u8|s16|u16|s64|u64|pred)"
        r"\[([0-9,]*)\]")
    for line in text.splitlines():
        s = line.strip()
        if s.startswith("ROOT "):
            s = s[5:]
        m = _def_re.match(s)
        if m:
            shape_map[m.group(1)] = [int(d) for d in m.group(2).split(",")
                                     if d]
        if "->" in line and line.rstrip().endswith("{"):
            for name, dims in _param_re.findall(line):
                shape_map[name] = [int(d) for d in dims.split(",") if d]
    cur = None
    is_entry = False
    for line in text.splitlines():
        stripped = line.strip()
        if (not line.startswith(" ")) and "->" in line and \
                line.rstrip().endswith("{"):
            is_entry = stripped.startswith("ENTRY")
            cur = ("__entry__" if is_entry
                   else stripped.lstrip("%").split(" ")[0])
            comp_ops.setdefault(cur, set())
            comp_flops.setdefault(cur, 0.0)
            continue
        if cur is None or not stripped.startswith("%") \
                and not stripped.startswith("ROOT"):
            if stripped == "}":
                cur = None
                is_entry = False
            continue
        body = stripped[5:] if stripped.startswith("ROOT ") else stripped
        m = _OPCODE_RE.search(body)
        opcode = m.group(1) if m else "?"
        comp_ops[cur].add(opcode)
        if opcode == "convolution":
            comp_flops[cur] += conv_flops(body, shape_map)
        for callee in _CALLS_RE.findall(body):
            comp_calls[cur].add(callee)
        if is_entry:
            entry_lines[body.split(" = ")[0].lstrip("%")] = body
    # transitive closure of called computations
    def resolve(name, seen):
        if name in seen:
            return set(), 0.0
        seen.add(name)
        ops = set(comp_ops.get(name, ()))
        fl = comp_flops.get(name, 0.0)
        for callee in comp_calls.get(name, ()):
            o, f = resolve(callee, seen)
            ops |= o
            fl += f
        return ops, fl

    resolved = {}
    for name in comp_ops:
        resolved[name] = resolve(name, set())
    return resolved, comp_calls, entry_lines, shape_map


_FILTER_SHAPE = re.compile(r"= \(?(?:f32|bf16)\[(\d),(\d),(\d+),(\d+)\]")


def classify_entry(inst_name: str, line: str, resolved, comp_calls,
                   shape_map=None):
    """Class + conv_flops for one entry-computation instruction."""
    m = _OPCODE_RE.search(line)
    opcode = m.group(1) if m else "?"
    flops = 0.0
    inner = set()
    if opcode == "fusion":
        for callee in _CALLS_RE.findall(line):
            o, f = resolved.get(callee, (set(), 0.0))
            inner |= o
            flops += f
    if opcode == "convolution":
        flops = conv_flops(line, shape_map or {})
        inner = {"convolution"}

    if "convolution" in inner:
        fm = _FILTER_SHAPE.search(line)
        if fm and int(fm.group(1)) <= 7 and int(fm.group(2)) <= 7:
            return "conv wgrad (+fused ops)", flops
        return "conv fwd/dgrad (+fused ops)", flops
    if opcode in ("copy", "copy-start", "copy-done", "transpose", "bitcast",
                  "bitcast-convert"):
        return "copy/relayout", 0.0
    if opcode in ("all-reduce", "all-gather", "reduce-scatter",
                  "collective-permute", "all-to-all"):
        return "collective", 0.0
    if opcode == "custom-call":
        return "custom-call (pallas)", 0.0
    if opcode == "select-and-scatter" or "select-and-scatter" in inner:
        return "maxpool grad", 0.0
    if inner & {"scatter", "gather", "dynamic-slice",
                "dynamic-update-slice"} or opcode in (
            "scatter", "gather", "dynamic-slice", "dynamic-update-slice"):
        return "gather/scatter", 0.0
    if "sort" in inner or opcode == "sort":
        return "sort/topk", 0.0
    if "reduce" in inner or opcode in ("reduce", "reduce-window"):
        # distinguish per-channel stats reduces from big-output reduces
        head = line.split(" = ")[1] if " = " in line else ""
        outs = _SHAPE_RE.findall(head.split("(", 1)[0] + "(")
        outs = _SHAPE_RE.findall(head)
        small = [o for o in outs if o[1] and len(o[1].split(",")) == 1]
        if small:
            return "bn/loss-stats reduce", 0.0
        return "other reduce", 0.0
    if opcode in ("broadcast", "iota", "reshape", "slice", "concatenate",
                  "pad", "reverse"):
        return "data movement (broadcast/reshape/…)", 0.0
    if opcode == "fusion":
        return "elementwise fusion", 0.0
    if opcode == "while":
        return "while (host loop)", 0.0
    return f"other ({opcode})", 0.0


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    step, state, batch = build_step()
    state, metrics = step(state, batch)
    float(metrics["total-loss"])

    hlo_text = step.lower(state, batch).compile().as_text()
    resolved, comp_calls, entry_lines, shape_map = parse_hlo(hlo_text)
    print(f"HLO: {len(entry_lines)} entry instructions, "
          f"{len(resolved)} computations")

    trace_dir = tempfile.mkdtemp(prefix="xprof_roofline_")
    with jax.profiler.trace(trace_dir):
        for _ in range(steps):
            state, metrics = step(state, batch)
        float(metrics["total-loss"])

    totals, occ, _ = aggregate_xplane(trace_dir)

    cls_ms = collections.Counter()
    cls_bytes = collections.Counter()
    cls_flops = collections.Counter()
    cls_ops = collections.Counter()
    examples = {}
    unmatched_ms = 0.0
    step_total_ms = 0.0
    for (plane, line, name), ps in totals.items():
        if line != "XLA Ops" or "TPU" not in plane:
            continue
        ms = ps / 1e9 / steps
        step_total_ms += ms
        inst = name.split(" = ")[0].lstrip("%")
        full = entry_lines.get(inst)
        if full is None:
            # async wrappers (copy-start/done pairs) and renamed insts
            c, fl = classify_entry(inst, name, resolved, comp_calls,
                                   shape_map)
            unmatched_ms += ms
        else:
            c, fl = classify_entry(inst, full, resolved, comp_calls,
                                   shape_map)
        n_occ = max(occ[(plane, line, name)] // steps, 1)
        cls_ms[c] += ms
        cls_bytes[c] += op_bytes(full or name) * n_occ
        cls_flops[c] += fl * n_occ
        cls_ops[c] += n_occ
        if c not in examples or ms > examples[c][0]:
            examples[c] = (ms, (full or name)[:120])

    print(f"\nstep total (sum of XLA op self-times): {step_total_ms:.2f} ms"
          f" | unmatched-in-HLO share: {unmatched_ms:.2f} ms\n")
    hdr = (f"{'class':34s} {'ms/step':>8s} {'%':>5s} {'ops':>5s} "
           f"{'GB':>7s} {'GFLOP':>8s} {'floor ms':>9s} {'x floor':>8s}")
    print(hdr)
    rows = []
    for c, ms in cls_ms.most_common():
        gb = cls_bytes[c] / 1e9
        gflop = cls_flops[c] / 1e9
        floor = max(gb / HBM_GBPS * 1e3,
                    gflop / PEAK_BF16_TFLOPS)  # ms
        ratio = ms / floor if floor > 0 else float("inf")
        rows.append((c, ms, gb, gflop, floor, ratio))
        print(f"{c:34s} {ms:8.2f} {100 * ms / step_total_ms:5.1f} "
              f"{cls_ops[c]:5d} {gb:7.2f} {gflop:8.1f} {floor:9.2f} "
              f"{ratio:8.2f}")
    total_floor = sum(r[4] for r in rows)
    print(f"\n{'TOTAL':34s} {step_total_ms:8.2f} {'':5s} {'':5s} "
          f"{sum(r[2] for r in rows):7.2f} {sum(r[3] for r in rows):8.1f} "
          f"{total_floor:9.2f} {step_total_ms / total_floor:8.2f}")
    print("\nlargest op per class:")
    for c, (ms, name) in sorted(examples.items(), key=lambda kv: -kv[1][0]):
        print(f"  {ms:7.3f} ms  [{c}] {name}")


if __name__ == "__main__":
    main()
