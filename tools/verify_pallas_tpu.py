"""Verify the Pallas NMS kernel compiled on real TPU against the XLA
reference, lane by lane (the compiled counterpart of
tests/test_pallas_nms.py which runs in interpret mode).

Usage: python tools/verify_pallas_tpu.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import retinanet_tpu.core.cache  # noqa: F401,E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from retinanet_tpu.ops.nms import nms_select  # noqa: E402
from retinanet_tpu.ops.pallas.nms_kernel import pallas_nms  # noqa: E402


def main():
    rng = np.random.default_rng(3)
    lanes, k = 40, 1000
    xy = rng.uniform(0, 0.8, (lanes, k, 2))
    wh = rng.uniform(0.02, 0.3, (lanes, k, 2))
    boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32).clip(0, 1)
    scores = rng.uniform(0, 1, (lanes, k)).astype(np.float32)
    for soft, sigma in [(False, 0.0), (True, 0.25)]:
        idx, sc, valid = jax.device_get(pallas_nms(
            jnp.asarray(boxes), jnp.asarray(scores), 100,
            iou_threshold=1.0 if soft else 0.5, score_threshold=0.1,
            soft_nms_sigma=sigma, soft=soft))
        bad = 0
        for lane in range(lanes):
            ref = nms_select(
                jnp.asarray(boxes[lane]), jnp.asarray(scores[lane]), 100,
                iou_threshold=1.0 if soft else 0.5, score_threshold=0.1,
                soft_nms_sigma=sigma, soft=soft)
            n = int(ref.valid)
            if int(valid[lane]) != n or not np.array_equal(
                    idx[lane][:n], np.asarray(ref.indices)[:n]):
                bad += 1
        status = "OK" if bad == 0 else f"{bad} MISMATCHED"
        print(f"TPU pallas soft={soft}: {lanes - bad}/{lanes} lanes exact "
              f"[{status}]")
        if bad:
            raise SystemExit(1)


if __name__ == "__main__":
    main()
