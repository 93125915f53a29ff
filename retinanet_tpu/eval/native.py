"""ctypes binding for the native COCO-eval matcher (native/cocoeval_native.cpp).

Reuses the build-on-first-use loader from data/native.py. The pure-Python
matcher in eval/coco.py remains the behavioral spec; tests cross-check both
(tests/test_coco_eval_native.py runs the differential suite through each).
"""

from __future__ import annotations

import ctypes
from typing import Optional

import numpy as np

from retinanet_tpu.data.native import _load_native_lib


def _configure(lib: ctypes.CDLL) -> None:
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.coco_match_groups.restype = ctypes.c_int
    lib.coco_match_groups.argtypes = [
        ctypes.c_int64, i64p, i64p,                # n_groups, dt_off, gt_off
        f64p,                                      # dt_boxes
        f64p, f64p, u8p, u8p,                      # gt boxes/areas/crowd/ign
        ctypes.c_int32, f64p, f64p,                # areas lo/hi
        ctypes.c_int32, f64p,                      # thresholds
        u8p, u8p, i32p,                            # dt_matched/dt_ignore/num_gt
    ]


def get_lib() -> Optional[ctypes.CDLL]:
    return _load_native_lib("cocoeval_native", [], _configure)


def available() -> bool:
    return get_lib() is not None


def match_groups(dt_off: np.ndarray, gt_off: np.ndarray,
                 dt_boxes: np.ndarray, gt_boxes: np.ndarray,
                 gt_areas: np.ndarray, gt_iscrowd: np.ndarray,
                 gt_ignore_base: np.ndarray,
                 area_lo: np.ndarray, area_hi: np.ndarray,
                 thrs: np.ndarray):
    """Run the C++ greedy matcher over all groups at once.

    Returns (dt_matched, dt_ignore, num_gt) with shapes
    ([A, T, sumD], [A, T, sumD], [A, n_groups]) or None when the native
    library is unavailable.
    """
    lib = get_lib()
    if lib is None:
        return None
    n_groups = len(dt_off) - 1
    sum_d = int(dt_off[-1])
    n_area, n_thr = len(area_lo), len(thrs)
    dt_matched = np.zeros((n_area, n_thr, sum_d), np.uint8)
    dt_ignore = np.zeros((n_area, n_thr, sum_d), np.uint8)
    num_gt = np.zeros((n_area, max(n_groups, 1)), np.int32)
    if n_groups == 0:
        return dt_matched, dt_ignore, num_gt[:, :0]
    rc = lib.coco_match_groups(
        n_groups,
        np.ascontiguousarray(dt_off, np.int64),
        np.ascontiguousarray(gt_off, np.int64),
        np.ascontiguousarray(dt_boxes, np.float64).reshape(-1),
        np.ascontiguousarray(gt_boxes, np.float64).reshape(-1),
        np.ascontiguousarray(gt_areas, np.float64),
        np.ascontiguousarray(gt_iscrowd, np.uint8),
        np.ascontiguousarray(gt_ignore_base, np.uint8),
        n_area,
        np.ascontiguousarray(area_lo, np.float64),
        np.ascontiguousarray(area_hi, np.float64),
        n_thr,
        np.ascontiguousarray(thrs, np.float64),
        dt_matched, dt_ignore, num_gt)
    if rc != 0:
        return None
    return dt_matched, dt_ignore, num_gt
