"""Stem conv experiments: 7x7 s2 C=3 vs space-to-depth 4x4 s1 C=12.

The ResNet stem (reference resnet.py:289-307, conv2d_fixed_padding 7x7
stride 2 on 3 input channels) is the one conv XLA cannot tile well: 3
input channels waste the MXU's 8-deep (bf16 16-deep) contraction lanes,
and the profile shows it 2.3x above its HBM write floor. The classic
TPU fix (used by Google's TPU ResNet reference models as
"conv0_space_to_depth") re-expresses it exactly: pad by 3, 2x2
space-to-depth the input to (H/2, W/2, 12), and run the SAME dot
products as a 4x4 stride-1 conv whose kernel is the 7x7 kernel
scattered into a zero-padded 8x8 grid and 2x2-blocked. Numerically
identical contraction set (one extra all-zero tap row/col).

Usage: PYTHONPATH=/root/.axon_site:. python tools/stem_experiments.py

MEASURED NEGATIVE RESULT (this chip, do not integrate): the forward
s2d lane is consistently SLOWER — bs8 0.85x, bs16 0.75x — because the
2x2 space-to-depth transpose of the 640x640 input costs more than the
3-channel MXU inefficiency it removes (XLA:TPU evidently handles the
C=3 stem well, likely via internal channel padding). fwd+wgrad showed
bs8 1.72x but bs16 0.14x (XLA picks a pathological wgrad algorithm for
the blocked kernel). Net: keep the reference 7x7 s2 stem.
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import retinanet_tpu.core.cache  # noqa: F401

import jax
import jax.numpy as jnp
import numpy as np

from retinanet_tpu.utils.benchmark import device_time


def stem_ref(x, w):
    # reference semantics: explicit (3,3) pad then VALID 7x7 stride-2
    x = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
    return jax.lax.conv_general_dilated(
        x, w, (2, 2), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)


def s2d_kernel(w):
    """(7,7,3,64) -> (4,4,12,64): zero-pad taps to 8x8, 2x2-block."""
    w8 = jnp.pad(w, ((0, 1), (0, 1), (0, 0), (0, 0)))
    # tap (2*by+py, 2*bx+px, c) -> block tap (by, bx), channel (py, px, c)
    w8 = w8.reshape(4, 2, 4, 2, w.shape[2], w.shape[3])
    return w8.transpose(0, 2, 1, 3, 4, 5).reshape(
        4, 4, 4 * w.shape[2], w.shape[3])


def stem_s2d(x, w4):
    b, h, _, c = x.shape
    x = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
    hp = h + 6
    x = x.reshape(b, hp // 2, 2, hp // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp // 2, hp // 2, 4 * c)
    return jax.lax.conv_general_dilated(
        x, w4, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)


def main():
    rng = np.random.default_rng(0)
    for bs in (8, 16):
        x = jnp.asarray(rng.standard_normal((bs, 640, 640, 3)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((7, 7, 3, 64)) * 0.05,
                        jnp.bfloat16)
        w4 = s2d_kernel(w)

        a = jax.jit(stem_ref)(x, w)
        c = jax.jit(stem_s2d)(x, w4)
        err = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                    - c.astype(jnp.float32))))
        print(f"bs={bs} max|ref - s2d| = {err:.3e} "
              f"(shapes {a.shape} vs {c.shape})")
        assert a.shape == c.shape

        t_ref = device_time(lambda xx: stem_ref(xx, w), x)
        t_s2d = device_time(lambda xx: stem_s2d(xx, w4), x)
        print(f"bs={bs} 7x7s2: {t_ref * 1e3:.3f} ms   "
              f"s2d 4x4s1: {t_s2d * 1e3:.3f} ms   "
              f"speedup {t_ref / t_s2d:.2f}x")

        # backward (training): grads w.r.t. weights only (input is data).
        # all-bf16 (no preferred_element_type) so the transposed conv in
        # the VJP keeps matching dtypes; timing-equivalent.
        def conv_ref(w):
            xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
            return jax.lax.conv_general_dilated(
                xp, w, (2, 2), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        def conv_s2d(w4):
            b, h, _, c = x.shape
            xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
            hp = h + 6
            xp = xp.reshape(b, hp // 2, 2, hp // 2, 2, c)
            xp = xp.transpose(0, 1, 3, 2, 4, 5).reshape(
                b, hp // 2, hp // 2, 4 * c)
            return jax.lax.conv_general_dilated(
                xp, w4, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        def loss_ref(w):
            return jnp.sum(conv_ref(w) ** 2).astype(jnp.float32)

        def loss_s2d(w4):
            return jnp.sum(conv_s2d(w4) ** 2).astype(jnp.float32)

        gref = jax.grad(loss_ref)
        gs2d = jax.grad(loss_s2d)
        t_ref_b = device_time(lambda ww: gref(ww), w)
        t_s2d_b = device_time(lambda ww: gs2d(ww), w4)
        print(f"bs={bs} fwd+wgrad 7x7s2: {t_ref_b * 1e3:.3f} ms   "
              f"s2d: {t_s2d_b * 1e3:.3f} ms   "
              f"speedup {t_ref_b / t_s2d_b:.2f}x")


if __name__ == "__main__":
    main()
