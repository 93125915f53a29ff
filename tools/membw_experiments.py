"""HBM roofline microbenchmarks: what does this chip actually stream?

Round-1/2 concluded the BN-stat reduces were "HBM-bound at ~120-140 GB/s
effective". Round-2 xplane data contradicts that: materialized broadcasts
WRITE at ~460-740 GB/s while the convert_reduce_fusions (BN stats) move
only ~90-140 GB/s. This harness pins down the per-op-class streaming rate
on BN-shaped tensors so we know whether a custom reduction kernel has
headroom.

Each case reports achieved GB/s of *logical* traffic (input bytes read +
output bytes written, ignoring tile padding).

Usage: PYTHONPATH=/root/.axon_site:. python tools/membw_experiments.py
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import retinanet_tpu.core.cache  # noqa: F401

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from retinanet_tpu.utils.benchmark import device_time


def bench(name, fn, x, bytes_moved, iters=30):
    sec = device_time(fn, x, iters=iters)
    gbs = bytes_moved / sec / 1e9
    print(f"{name:42s} {sec*1e3:8.3f} ms  {gbs:8.1f} GB/s", flush=True)
    return sec


def pallas_channel_stats(x2d, tile_rows=2048):
    """Per-128-lane sum and sum-of-squares of a [N, 128] bf16 array.

    Accumulates f32 [8, 128] partials in VMEM across a 1-D grid of row
    chunks; caller folds the 8 sublanes (and any lane-duplicated channels).
    """
    n, c = x2d.shape
    assert c == 128 and n % tile_rows == 0

    def kernel(x_ref, sum_ref, sq_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            sum_ref[:] = jnp.zeros_like(sum_ref)
            sq_ref[:] = jnp.zeros_like(sq_ref)

        blk = x_ref[:].astype(jnp.float32)
        b3 = blk.reshape(-1, 8, 128)
        sum_ref[:] += jnp.sum(b3, axis=0)
        sq_ref[:] += jnp.sum(b3 * b3, axis=0)

    out_shape = [jax.ShapeDtypeStruct((8, 128), jnp.float32)] * 2
    grid = (n // tile_rows,)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((tile_rows, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((8, 128), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=out_shape,
    )(x2d)


def main():
    key = jax.random.PRNGKey(0)

    # BN-shaped: conv1 output of the flagship step.
    shape4 = (16, 320, 320, 64)
    n_el = int(np.prod(shape4))
    x4 = jax.random.normal(key, shape4, dtype=jnp.bfloat16)
    x2 = jnp.reshape(x4, (-1, 128))  # ideal 2-D view, 819200 x 128
    bytes_in = n_el * 2

    print(f"tensor: bf16{list(shape4)} = {bytes_in/1e6:.0f} MB logical")

    # 1. pure copy (read + write)
    bench("copy (y = x + 1)", lambda x: x + jnp.bfloat16(1.0), x4,
          bytes_in * 2)
    bench("copy 2-D view", lambda x: x + jnp.bfloat16(1.0), x2,
          bytes_in * 2)

    # 2. scalar full reduce
    bench("sum-to-scalar f32 (4-D)",
          lambda x: jnp.sum(x.astype(jnp.float32)), x4, bytes_in)
    bench("sum-to-scalar f32 (2-D)",
          lambda x: jnp.sum(x.astype(jnp.float32)), x2, bytes_in)

    # 3. per-channel reduce (BN stats shape)
    bench("per-C sum f32 (4-D, axes 0,1,2)",
          lambda x: jnp.sum(x.astype(jnp.float32), axis=(0, 1, 2)), x4,
          bytes_in)
    bench("per-C sum+sumsq f32 (4-D)",
          lambda x: (jnp.sum(x.astype(jnp.float32), axis=(0, 1, 2)),
                     jnp.sum(jnp.square(x.astype(jnp.float32)),
                             axis=(0, 1, 2))), x4, bytes_in)
    bench("per-lane sum f32 (2-D, axis 0)",
          lambda x: jnp.sum(x.astype(jnp.float32), axis=0), x2, bytes_in)

    # 4. matmul-with-ones on the MXU (2-D ideal layout)
    ones_row = jnp.ones((8, x2.shape[0]), jnp.bfloat16)
    bench("ones@x MXU reduce (2-D)",
          lambda x: jax.lax.dot_general(
              ones_row, x, (((1,), (0,)), ((), ())),
              preferred_element_type=jnp.float32), x2, bytes_in)

    # 5. Pallas per-channel stats kernel (ideal 2-D layout)
    for tile in (1024, 2048, 4096, 8192):
        bench(f"pallas sum+sumsq tile={tile}",
              functools.partial(pallas_channel_stats, tile_rows=tile), x2,
              bytes_in)

    # 6. Pallas on the 4-D tensor reshaped inside jit (layout cost visible)
    def pallas_from_4d(x):
        return pallas_channel_stats(x.reshape(-1, 128), tile_rows=2048)
    bench("pallas sum+sumsq from 4-D reshape", pallas_from_4d, x4, bytes_in)


if __name__ == "__main__":
    main()
