"""ctypes bindings for the native TFRecord fast path (native/*.cpp).

Compiles the shared library on first use (g++, ~2 s) and caches it next to
the source; falls back to the pure-Python codec in data/tfrecord.py when a
toolchain is unavailable. The Python implementation remains the behavioral
spec — tests cross-check both.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Dict, Iterator, List, Optional

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "native")


def _configure_tfrecord(lib: ctypes.CDLL) -> None:
    lib.tfr_index.restype = ctypes.c_int64
    lib.tfr_index.argtypes = [
        ctypes.c_char_p, ctypes.c_int64,
        np.ctypeslib.ndpointer(np.int64), np.ctypeslib.ndpointer(np.int64),
        ctypes.c_int64, ctypes.c_int]
    lib.tfr_parse_detection.restype = ctypes.c_int
    lib.tfr_parse_detection.argtypes = [
        ctypes.c_char_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
        np.ctypeslib.ndpointer(np.float32),
        np.ctypeslib.ndpointer(np.int64),
        ctypes.c_int64, ctypes.POINTER(ctypes.c_int64)]
    lib.tfr_masked_crc32c.restype = ctypes.c_uint32
    lib.tfr_masked_crc32c.argtypes = [ctypes.c_char_p, ctypes.c_int64]


def get_lib() -> Optional[ctypes.CDLL]:
    return _load_native_lib("tfrecord_native", [], _configure_tfrecord)


def available() -> bool:
    return get_lib() is not None


def read_records(path: str, verify_crc: bool = False) -> Iterator[bytes]:
    """Native-indexed record stream; drop-in for tfrecord.read_records."""
    lib = get_lib()
    if lib is None or "://" in path:
        from retinanet_tpu.data import tfrecord
        yield from tfrecord.read_records(path, verify_crc)
        return
    with open(path, "rb") as f:
        data = f.read()
    max_records = max(len(data) // 16, 1)
    offsets = np.zeros(max_records, np.int64)
    lengths = np.zeros(max_records, np.int64)
    n = lib.tfr_index(data, len(data), offsets, lengths, max_records,
                      1 if verify_crc else 0)
    if n < 0:
        raise IOError(f"corrupt crc in {path} (record {-n - 1})")
    for i in range(n):
        yield data[offsets[i]:offsets[i] + lengths[i]]


def parse_detection_example(record: bytes,
                            max_boxes: int = 512) -> Optional[Dict]:
    """Native parse; drop-in for tfrecord.parse_detection_example.
    Returns None when the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    image_off = ctypes.c_int64()
    image_len = ctypes.c_int64()
    image_id = ctypes.c_int64()
    nboxes = ctypes.c_int64()
    boxes = np.zeros((max_boxes, 4), np.float32)
    classes = np.zeros(max_boxes, np.int64)
    rc = lib.tfr_parse_detection(
        record, len(record), ctypes.byref(image_off),
        ctypes.byref(image_len), ctypes.byref(image_id), boxes, classes,
        max_boxes, ctypes.byref(nboxes))
    if rc != 0:
        raise ValueError("malformed detection example")
    n = nboxes.value
    return {
        "image": record[image_off.value:image_off.value + image_len.value],
        "image_id": int(image_id.value),
        "boxes": boxes[:n].copy(),
        "classes": classes[:n].copy(),
    }


# ---------------------------------------------------------------------------
# shared build-on-first-use loader for the optional native libs
# ---------------------------------------------------------------------------

_lib_cache: Dict[str, Optional[ctypes.CDLL]] = {}
_lib_lock = threading.Lock()


def _load_native_lib(basename: str, extra_link: List[str],
                     configure) -> Optional[ctypes.CDLL]:
    """Compile native/<basename>.cpp to a cached .so and dlopen it.

    Returns None (and caches the failure) when the toolchain, source, or a
    link dependency is unavailable — callers fall back to cv2/numpy.

    Concurrency-safe: a module lock serializes first-use from the input
    pipeline's worker threads, and the compile writes to a per-process
    temp file that is os.replace'd into place atomically, so concurrent
    PROCESSES (multi-host training, the 2-process harness) never dlopen a
    partially written .so."""
    with _lib_lock:
        if basename in _lib_cache:
            return _lib_cache[basename]
        src = os.path.join(_NATIVE_DIR, f"{basename}.cpp")
        lib_path = os.path.join(_NATIVE_DIR, f"lib{basename}.so")
        _lib_cache[basename] = None
        if not os.path.exists(lib_path) or (
                os.path.exists(src)
                and os.path.getmtime(src) > os.path.getmtime(lib_path)):
            if not os.path.exists(src):
                return None
            tmp = f"{lib_path}.tmp.{os.getpid()}"
            try:
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                     "-o", tmp, src] + extra_link,
                    check=True, capture_output=True, timeout=120)
                os.replace(tmp, lib_path)
            except Exception:
                return None
            finally:
                if os.path.exists(tmp):
                    os.unlink(tmp)
        try:
            lib = ctypes.CDLL(lib_path)
        except OSError:
            return None
        configure(lib)
        _lib_cache[basename] = lib
        return lib


# ---------------------------------------------------------------------------
# native JPEG decode (native/jpeg_native.cpp, links -ljpeg)
# ---------------------------------------------------------------------------


def get_jpeg_lib() -> Optional[ctypes.CDLL]:
    return _load_native_lib("jpeg_native", ["-ljpeg"], _configure_jpeg)


def _configure_jpeg(lib: ctypes.CDLL) -> None:
    lib.jpg_dims.restype = ctypes.c_int
    lib.jpg_dims.argtypes = [
        ctypes.c_char_p, ctypes.c_long,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.jpg_decode_rgb.restype = ctypes.c_int
    lib.jpg_decode_rgb.argtypes = [
        ctypes.c_char_p, ctypes.c_long,
        np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
        ctypes.c_long,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]


def decode_jpeg_rgb(data: bytes) -> Optional[np.ndarray]:
    """GIL-free libjpeg decode straight to C-contiguous RGB.

    Returns None for non-JPEG payloads (e.g. PNG) or when the native lib
    is unavailable — callers fall back to cv2/PIL."""
    lib = get_jpeg_lib()
    if lib is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    if lib.jpg_dims(data, len(data), ctypes.byref(w), ctypes.byref(h)) != 0:
        return None
    out = np.empty((h.value, w.value, 3), np.uint8)
    rc = lib.jpg_decode_rgb(data, len(data), out, out.nbytes,
                            ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        return None
    return out


# ---------------------------------------------------------------------------
# fused bilinear resample + crop + flip + pad (native/resample_native.cpp)
# ---------------------------------------------------------------------------


def _configure_resample(lib: ctypes.CDLL) -> None:
    common = [ctypes.c_int] * 4 + [ctypes.c_double] * 4 + [
        ctypes.c_int, np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")]
    u8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    f32 = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.resample_bilinear_u8.restype = ctypes.c_int
    lib.resample_bilinear_u8.argtypes = (
        [u8, ctypes.c_int, ctypes.c_int, u8] + common)
    lib.resample_bilinear_f32.restype = ctypes.c_int
    lib.resample_bilinear_f32.argtypes = (
        [f32, ctypes.c_int, ctypes.c_int, f32] + common)


def get_resample_lib() -> Optional[ctypes.CDLL]:
    return _load_native_lib("resample_native", [], _configure_resample)


def resample_bilinear(image: np.ndarray,
                      out_hw: "tuple[int, int]",
                      valid_hw: "tuple[int, int]",
                      scale_yx: "tuple[float, float]",
                      offset_yx: "tuple[float, float]",
                      flip: bool,
                      pad_rgb: np.ndarray) -> Optional[np.ndarray]:
    """tf.image.resize-parity bilinear sample of `image` into a fresh
    (out_h, out_w, 3) canvas: the valid region is resize(+crop at offset,
    + optional horizontal flip folded into the sampling coords), the rest
    is `pad_rgb`. GIL-free; float weights (closer to tf.image than cv2's
    5-bit fixed point). Returns None when the native lib is unavailable."""
    lib = get_resample_lib()
    if lib is None:
        return None
    if image.dtype == np.uint8:
        fn = lib.resample_bilinear_u8
    elif image.dtype == np.float32:
        fn = lib.resample_bilinear_f32
    else:
        return None
    image = np.ascontiguousarray(image)
    out = np.empty((int(out_hw[0]), int(out_hw[1]), 3), image.dtype)
    pad = np.ascontiguousarray(pad_rgb, np.float32)
    rc = fn(image, image.shape[0], image.shape[1],
            out, out.shape[0], out.shape[1],
            int(valid_hw[0]), int(valid_hw[1]),
            float(scale_yx[0]), float(scale_yx[1]),
            float(offset_yx[0]), float(offset_yx[1]),
            1 if flip else 0, pad)
    if rc != 0:
        return None
    return out
