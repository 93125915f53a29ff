"""Activation calibration for int8 post-training quantization.

Replaces the reference's TensorRT INT8 calibrators
(reference retinanet/tensorrt/calibrator.py:10-83 — IInt8EntropyCalibrator2
and MinMax over a stream of preprocessed images) with a TPU-native scheme:

  * A flax method interceptor observes the INPUT of every nn.Conv during
    normal jitted forward passes and `sow`s per-tensor statistics into the
    'intermediates' collection — no model rewrite, works for every backbone.
  * Two passes over the calibration stream: (1) running amax per conv,
    (2) 2048-bin histograms of |x| with the pass-1 range.
  * Scale selection: 'minmax' (amax/127), 'percentile' (99.99th of mass),
    or 'entropy' — the TRT-style KL-divergence sweep that picks the
    clipping threshold whose 128-level quantized distribution diverges
    least from the observed one.

The resulting {conv_path: scale} dict drives export/quantize.py's int8
activation serving path and is stored in the export artifact.
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

NUM_BINS = 2048
QUANT_LEVELS = 128  # int8 positive side


def _module_path(module) -> str:
    path = getattr(module, "path", None)
    if path is None and module.scope is not None:
        path = module.scope.path
    return "/".join(str(p) for p in (path or ()))


def _make_observer(amax_ranges: Optional[Dict[str, float]]) -> Callable:
    """Interceptor sowing conv-input stats.

    Pass 1 (amax_ranges=None): sows max|x| per conv.
    Pass 2: sows a NUM_BINS histogram of |x| over (0, amax) per conv.
    """

    def interceptor(next_fun, args, kwargs, context):
        module = context.module
        if (isinstance(module, nn.Conv)
                and context.method_name == "__call__" and args):
            x = jnp.abs(args[0].astype(jnp.float32))
            if amax_ranges is None:
                module.sow("intermediates", "calib_amax", jnp.max(x),
                           reduce_fn=lambda a, b: jnp.maximum(a, b),
                           init_fn=lambda: jnp.float32(0.0))
            else:
                rng = amax_ranges.get(_module_path(module))
                if rng:
                    hist = jnp.histogram(x, bins=NUM_BINS,
                                         range=(0.0, rng))[0]
                    module.sow("intermediates", "calib_hist", hist,
                               reduce_fn=lambda a, b: a + b,
                               init_fn=lambda: jnp.zeros(
                                   NUM_BINS, jnp.int32))
        return next_fun(*args, **kwargs)

    return interceptor


def _collect(model, variables, batches, amax_ranges, preprocess):
    """One pass over `batches`; returns {conv_path: merged stat}."""
    observer = _make_observer(amax_ranges)

    @jax.jit
    def run(images):
        with nn.intercept_methods(observer):
            _, inter = model.apply(
                variables, preprocess(images), train=False,
                mutable=["intermediates"])
        return inter["intermediates"]

    merged: Dict[str, np.ndarray] = {}
    for images in batches:
        inter = jax.device_get(run(jnp.asarray(images)))
        flat, _ = jax.tree_util.tree_flatten_with_path(inter)
        for key_path, value in flat:
            parts = [str(getattr(k, "key", k)) for k in key_path]
            # sow with reduce_fn stores a single merged value:
            # path = (module..., stat_name); without reduce_fn it would be
            # a tuple and end in a numeric index
            if parts[-1].isdigit():
                name, mod_parts = parts[-2], parts[:-2]
            else:
                name, mod_parts = parts[-1], parts[:-1]
            mod = "/".join(p for p in mod_parts if not p.isdigit())
            if name not in ("calib_amax", "calib_hist"):
                continue
            value = np.asarray(value)
            if mod not in merged:
                merged[mod] = value
            elif name == "calib_amax":
                merged[mod] = np.maximum(merged[mod], value)
            else:
                merged[mod] = merged[mod] + value
    return merged


def _entropy_threshold(hist: np.ndarray) -> int:
    """TRT-style KL sweep: best bin count i (>=QUANT_LEVELS) such that
    quantizing the first i bins to QUANT_LEVELS levels (with clipping mass
    folded into the last bin) minimizes KL(P || Q)."""
    hist = hist.astype(np.float64)
    best_i, best_kl = len(hist), np.inf
    total = hist.sum()
    if total == 0:
        return len(hist)
    for i in range(QUANT_LEVELS, len(hist) + 1, 16):
        p = hist[:i].copy()
        p[-1] += hist[i:].sum()  # clipped mass
        if p.sum() == 0:
            continue
        # quantize first i bins into QUANT_LEVELS groups
        edges = np.linspace(0, i, QUANT_LEVELS + 1).astype(int)
        q = np.zeros(i)
        ref = hist[:i]
        for b in range(QUANT_LEVELS):
            lo, hi = edges[b], edges[b + 1]
            mass = ref[lo:hi].sum()
            nonzero = (ref[lo:hi] > 0)
            n = nonzero.sum()
            if n:
                q[lo:hi][nonzero] = mass / n
        pn = p / p.sum()
        qn = q / max(q.sum(), 1e-12)
        mask = pn > 0
        kl = float(np.sum(pn[mask] * np.log(
            pn[mask] / np.maximum(qn[mask], 1e-12))))
        if kl < best_kl:
            best_kl, best_i = kl, i
    return best_i


def compute_scales(amax: Dict[str, float],
                   hists: Optional[Dict[str, np.ndarray]],
                   mode: str = "entropy",
                   percentile: float = 99.99) -> Dict[str, float]:
    scales: Dict[str, float] = {}
    for key, a in amax.items():
        a = float(a)
        if a <= 0:
            continue
        if mode == "minmax" or hists is None or key not in hists:
            thr = a
        elif mode == "percentile":
            h = hists[key].astype(np.float64)
            c = np.cumsum(h)
            idx = int(np.searchsorted(c, c[-1] * percentile / 100.0))
            thr = (idx + 1) / NUM_BINS * a
        elif mode == "entropy":
            # exclude the zero bin: post-ReLU activations put ~half their
            # mass exactly at 0, which needs no representation and otherwise
            # drags the KL optimum to a tiny threshold that clips the
            # information-carrying tail (measured: AP 0.71 -> 0.06 on a
            # trained model with bin 0 in; 0.71 -> ~0.71 with it out)
            h = hists[key].astype(np.float64).copy()
            h[0] = 0.0
            i = _entropy_threshold(h)
            thr = (i + 0.5) / NUM_BINS * a
        else:
            raise ValueError(f"unknown calibration mode: {mode}")
        scales[key] = min(thr, a) / 127.0
    return scales


def calibrate_activations(model, variables, batches: Iterable,
                          mode: str = "entropy",
                          preprocess: Callable = lambda x: x,
                          percentile: float = 99.99) -> Dict[str, float]:
    """Full calibration: returns {conv_path: activation_scale}.

    `batches` is an iterable of image arrays (consumed twice for
    percentile/entropy modes — pass a list, or a factory-backed sequence).
    """
    batches = list(batches)
    amax = _collect(model, variables, batches, None, preprocess)
    hists = None
    if mode != "minmax":
        ranges = {k: float(v) for k, v in amax.items()}
        hists = _collect(model, variables, batches, ranges, preprocess)
    return compute_scales(amax, hists, mode, percentile)
