"""TFRecord I/O, host pipeline and preprocessing tests."""

import numpy as np
import pytest

from retinanet_tpu.core import config as cfg
from retinanet_tpu.data import tfrecord as tfr
from retinanet_tpu.data.pipeline import InputPipeline
from retinanet_tpu.data.preprocessing import HostPreprocessor
from retinanet_tpu.data.synthetic import write_synthetic_tfrecords


def test_example_roundtrip():
    boxes = np.array([[0.1, 0.2, 0.5, 0.6], [0.0, 0.3, 0.9, 1.0]],
                     np.float32)
    classes = np.array([3, 79], np.int64)
    rec = tfr.make_detection_example(b"jpegbytes", 42, boxes, classes)
    parsed = tfr.parse_detection_example(rec)
    assert parsed["image"] == b"jpegbytes"
    assert parsed["image_id"] == 42
    np.testing.assert_allclose(parsed["boxes"], boxes)
    np.testing.assert_array_equal(parsed["classes"], classes)


def test_record_writer_reader_roundtrip(tmp_path):
    path = str(tmp_path / "x.tfrecord")
    records = [b"a" * 10, b"b" * 1000, b""]
    with tfr.RecordWriter(path) as w:
        for r in records:
            w.write(r)
    out = list(tfr.read_records(path, verify_crc=True))
    assert out == records


def test_empty_boxes_example():
    rec = tfr.make_detection_example(
        b"img", 1, np.zeros((0, 4), np.float32), np.zeros((0,), np.int64))
    parsed = tfr.parse_detection_example(rec)
    assert parsed["boxes"].shape == (0, 4)
    assert len(parsed["classes"]) == 0


def _params(tmp_path, pattern, input_shape=(64, 64), bs=4):
    return cfg.from_dict({
        "experiment": {"name": "t"},
        "input": {"input_shape": list(input_shape), "channels": 3},
        "architecture": {
            "backbone": {"type": "resnet", "depth": 10},
            "feature_fusion": {"type": "fpn", "filters": 16,
                               "min_level": 3, "max_level": 5,
                               "backbone_max_level": 5},
            "head": {"num_convs": 1, "filters": 16, "num_classes": 6,
                     "num_anchors": 9},
        },
        "anchor_params": {"areas": [1024.0, 4096.0, 16384.0],
                          "aspect_ratios": [0.5, 1.0, 2.0],
                          "scales": [1.0, 2 ** (1 / 3), 2 ** (2 / 3)]},
        "training": {"batch_size": {"train": bs, "val": bs},
                     "train_steps": 10, "save_every": 5,
                     "optimizer": {
                         "name": "sgd",
                         "lr_params": {
                             "schedule_type": "piecewise_constant_decay",
                             "warmup_learning_rate": 0.001,
                             "warmup_steps": 1, "values": [0.01],
                             "boundaries": []}}},
        "dataloader_params": {
            "tfrecords": {"train": pattern, "val": pattern},
            "shuffle_buffer_size": 4},
    })


@pytest.fixture(scope="module")
def synthetic_data(tmp_path_factory):
    d = tmp_path_factory.mktemp("tfrecords")
    pattern = write_synthetic_tfrecords(
        str(d), "train", num_shards=2, samples_per_shard=6, num_classes=6)
    return pattern


def test_train_pipeline_shapes(synthetic_data, tmp_path):
    params = _params(tmp_path, synthetic_data)
    pipe = InputPipeline("train", params, max_boxes=25)
    it = iter(pipe)
    batch = next(it)
    assert batch["image"].shape == (4, 64, 64, 3)
    # train path transfers uint8 (4x cheaper host->device; <=1 LSB error)
    assert batch["image"].dtype == np.uint8
    assert batch["boxes"].shape == (4, 25, 4)
    assert batch["classes"].shape == (4, 25)
    assert batch["valid"].shape == (4, 25)
    # valid boxes are center-format within the frame
    for i in range(4):
        v = batch["valid"][i]
        if v.any():
            b = batch["boxes"][i][v]
            assert (b[:, 2] > 0).all() and (b[:, 3] > 0).all()


def test_val_pipeline_pads_final_batch(synthetic_data, tmp_path):
    params = _params(tmp_path, synthetic_data, bs=5)
    pipe = InputPipeline("val", params)
    batches = list(pipe)
    # 12 samples, bs 5 -> 3 batches, last padded
    assert len(batches) == 3
    ids = np.concatenate([b["image_id"] for b in batches])
    assert (ids >= 0).sum() == 12
    assert (ids < 0).sum() == 3
    assert batches[0]["resize_scale"].shape == (5, 2)


def test_multi_host_file_sharding(synthetic_data, tmp_path):
    params = _params(tmp_path, synthetic_data)
    p0 = InputPipeline("train", params, is_multi_host=True,
                       process_index=0, process_count=2, batch_size=2)
    p1 = InputPipeline("train", params, is_multi_host=True,
                       process_index=1, process_count=2, batch_size=2)
    assert set(p0.files).isdisjoint(p1.files)
    assert len(p0.files) + len(p1.files) == 2


def test_host_preprocessor_no_aug_resize_pad(tmp_path):
    params = _params(tmp_path, "unused*")
    del params.dataloader_params["tfrecords"]
    pre = HostPreprocessor(params, max_boxes=10)
    img = np.full((32, 16, 3), 200.0, np.float32)
    out, scale = pre.resize_with_pad(img)
    assert out.shape == (64, 64, 3)
    # aspect preserved: 32x16 -> 64x32; right half is mean padding
    np.testing.assert_allclose(out[:, :32], 200.0, atol=1.5)
    np.testing.assert_allclose(out[:, 32:], 127.0)
    np.testing.assert_allclose(scale, [2.0, 2.0])


def test_host_preprocessor_train_boxes(tmp_path):
    params = _params(tmp_path, "unused*")
    del params.dataloader_params["tfrecords"]
    params.dataloader_params.augmentations.use_augmentation = False
    pre = HostPreprocessor(params, max_boxes=10)
    img = np.zeros((128, 128, 3), np.float32)
    boxes_norm = np.array([[0.25, 0.25, 0.75, 0.75]], np.float32)
    out = pre(img, boxes_norm, np.array([2]), np.random.default_rng(0))
    assert out["image"].shape == (64, 64, 3)
    assert out["valid"][0] and not out["valid"][1:].any()
    # 128->64 scale 0.5: box center (32,32) wh (32,32) in xywh
    np.testing.assert_allclose(out["boxes"][0], [32, 32, 32, 32], atol=0.5)
    assert out["classes"][0] == 2


def test_warp_affine_matches_resize_crop_pad(tmp_path):
    """The one-pass warpAffine fast path agrees with the explicit
    resize -> crop -> mean-pad composition to cv2 fixed-point tolerance."""
    import cv2
    from retinanet_tpu.data.preprocessing import _resize
    params = _params(tmp_path, "unused*")
    pre = HostPreprocessor(params, max_boxes=10)
    pre.use_augmentation = False
    pre.horizontal_flip = False
    pre.jitter = None

    rng0 = np.random.default_rng(0)
    image = rng0.integers(0, 255, (48, 36, 3), np.uint8)
    boxes = np.array([[0.1, 0.1, 0.6, 0.7]], np.float32)
    out = pre(image, boxes, np.array([1]), np.random.default_rng(1))

    # explicit composition (the pre-fast-path semantics)
    th, tw = 64, 64
    scale = min(th / 48, tw / 36)
    sh = np.round(np.array([48.0, 36.0]) * scale).astype(int)
    resized = _resize(image, (sh[0], sh[1]), dtype=np.uint8)
    expected = np.empty((th, tw, 3), np.uint8)
    expected[:] = pre.mean.astype(np.uint8)
    expected[:sh[0], :sh[1]] = resized[:th, :tw]

    img = out["image"]
    # interior of the image region: identical up to fixed-point rounding
    inner = (slice(1, sh[0] - 1), slice(1, sh[1] - 1))
    diff = np.abs(img[inner].astype(int) - expected[inner].astype(int))
    assert np.percentile(diff, 99) <= 2 and diff.max() <= 16, (
        diff.max(), np.percentile(diff, 99))
    # pad region is exactly the mean
    np.testing.assert_array_equal(
        img[sh[0] + 1:], np.broadcast_to(
            pre.mean.astype(np.uint8), img[sh[0] + 1:].shape))


def test_val_shard_decode_exactly_once(synthetic_data, tmp_path):
    """Per-host val decode sharding (round 3): P hosts each decode only
    their contiguous 1/P slice of every global batch; concatenating the
    hosts' local batches reproduces the unsharded pipeline exactly
    (images, ids, scales), including final-batch sentinel padding."""
    params = _params(tmp_path, synthetic_data, bs=8)
    full = list(InputPipeline("val", params, batch_size=8))
    shard0 = list(InputPipeline("val", params, batch_size=4,
                                val_shard_index=0, val_shard_count=2))
    shard1 = list(InputPipeline("val", params, batch_size=4,
                                val_shard_index=1, val_shard_count=2))
    assert len(full) == len(shard0) == len(shard1)
    for fb, s0, s1 in zip(full, shard0, shard1):
        for k in fb:
            merged = np.concatenate([s0[k], s1[k]])
            np.testing.assert_array_equal(merged, fb[k], err_msg=k)
    # each host decodes exactly half the real samples
    n0 = sum(int((b["image_id"] >= 0).sum()) for b in shard0)
    n1 = sum(int((b["image_id"] >= 0).sum()) for b in shard1)
    n = sum(int((b["image_id"] >= 0).sum()) for b in full)
    assert n0 + n1 == n == 12


def test_val_shard_trailing_host_all_sentinel(synthetic_data, tmp_path):
    """12 samples, global batch 8, P=2: the 2nd global batch holds only 4
    samples — host 1's slice is pure padding but it must still emit the
    batch so collectives stay in lockstep."""
    params = _params(tmp_path, synthetic_data, bs=8)
    shard1 = list(InputPipeline("val", params, batch_size=4,
                                val_shard_index=1, val_shard_count=2))
    assert len(shard1) == 2
    assert (shard1[1]["image_id"] == -1).all()


def test_native_jpeg_decode_matches_cv2():
    """libjpeg decode (GIL-free lane) agrees with cv2's (both ride
    libjpeg-turbo; IDCT output is bit-identical)."""
    cv2 = pytest.importorskip("cv2")
    from retinanet_tpu.data import native as native_codec
    from retinanet_tpu.data.pipeline import decode_jpeg

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (123, 211, 3), np.uint8)
    ok, enc = cv2.imencode(".jpg", img[:, :, ::-1],
                           [cv2.IMWRITE_JPEG_QUALITY, 90])
    assert ok
    data = enc.tobytes()

    got = native_codec.decode_jpeg_rgb(data)
    if got is None:
        pytest.skip("native jpeg lib unavailable")
    ref = cv2.cvtColor(
        cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR),
        cv2.COLOR_BGR2RGB)
    assert got.shape == ref.shape == (123, 211, 3)
    np.testing.assert_array_equal(got, ref)
    assert got.flags.c_contiguous

    # the public entry point rides the native lane and returns the same
    np.testing.assert_array_equal(decode_jpeg(data), got)


def test_native_jpeg_decode_rejects_non_jpeg():
    """PNG / garbage payloads return None (callers fall back to cv2)."""
    from retinanet_tpu.data import native as native_codec
    if native_codec.get_jpeg_lib() is None:
        pytest.skip("native jpeg lib unavailable")
    assert native_codec.decode_jpeg_rgb(b"\x89PNG\r\n\x1a\n junk") is None
    assert native_codec.decode_jpeg_rgb(b"") is None


def test_decode_jpeg_png_fallback():
    """Non-JPEG images still decode through the cv2/PIL fallback."""
    cv2 = pytest.importorskip("cv2")
    from retinanet_tpu.data.pipeline import decode_jpeg
    img = np.arange(4 * 5 * 3, dtype=np.uint8).reshape(4, 5, 3)
    ok, enc = cv2.imencode(".png", img[:, :, ::-1])
    assert ok
    np.testing.assert_array_equal(decode_jpeg(enc.tobytes()), img)


# ---------------------------------------------------------------------------
# native fused resampler (native/resample_native.cpp)
# ---------------------------------------------------------------------------

def _np_bilinear(src, vh, vw, sy, sx, off_y, off_x, flip):
    """From-spec bilinear reference: half-pixel centers, clamp at edge."""
    src = src.astype(np.float64)
    sh, sw = src.shape[:2]
    fy = (np.arange(vh) + off_y + 0.5) / sy - 0.5
    u = (np.arange(vw) + off_x + 0.5) / sx - 0.5
    if flip:
        u = (sw - 1) - u
    y0 = np.clip(np.floor(fy), 0, sh - 1).astype(int)
    x0 = np.clip(np.floor(u), 0, sw - 1).astype(int)
    y1 = np.minimum(y0 + 1, sh - 1)
    x1 = np.minimum(x0 + 1, sw - 1)
    wy = np.clip(fy - y0, 0, 1)[:, None, None]
    wx = np.clip(u - x0, 0, 1)[None, :, None]
    a = src[y0][:, x0] * (1 - wx) + src[y0][:, x1] * wx
    b = src[y1][:, x0] * (1 - wx) + src[y1][:, x1] * wx
    return a * (1 - wy) + b * wy


@pytest.mark.parametrize("shape,scale,off,flip", [
    ((37, 53), (1.7, 1.7), (3, 9), False),     # upscale + crop
    ((37, 53), (0.41, 0.41), (0, 0), True),    # downscale + flip
    ((1, 1), (8.0, 8.0), (0, 0), False),       # degenerate 1x1 source
    ((2, 640), (0.9, 0.9), (0, 14), True),     # extreme aspect
    ((128, 96), (1.0, 1.0), (0, 0), False),    # identity scale
])
def test_native_resample_matches_from_spec(shape, scale, off, flip):
    """The C resampler agrees with an independent from-spec numpy bilinear
    (half-pixel centers, clamp at edge) on both dtype lanes, including the
    folded flip and the mean-pad region."""
    from retinanet_tpu.data import native as native_codec
    if native_codec.get_resample_lib() is None:
        pytest.skip("native resample lib unavailable")
    rng = np.random.default_rng(3)
    src = rng.integers(0, 256, (*shape, 3), np.uint8)
    th, tw = 32, 40
    vh = min(th, int(shape[0] * scale[0]) - off[0])
    vw = min(tw, int(shape[1] * scale[1]) - off[1])
    vh, vw = max(vh, 0), max(vw, 0)
    pad = np.array([123.675, 116.28, 103.53], np.float32)

    want = _np_bilinear(src, vh, vw, scale[0], scale[1], off[0], off[1], flip)

    got8 = native_codec.resample_bilinear(
        src, (th, tw), (vh, vw), scale, off, flip, pad)
    assert got8.shape == (th, tw, 3) and got8.dtype == np.uint8
    assert np.abs(got8[:vh, :vw].astype(float) - want).max() <= 1.0
    # pad region: truncated-to-uint8 mean everywhere outside the valid box
    assert (got8[vh:] == pad.astype(np.uint8)).all()
    assert (got8[:, vw:] == pad.astype(np.uint8)).all()

    gotf = native_codec.resample_bilinear(
        src.astype(np.float32), (th, tw), (vh, vw), scale, off, flip, pad)
    assert gotf.dtype == np.float32
    np.testing.assert_allclose(gotf[:vh, :vw], want, atol=2e-3)
    assert (gotf[vh:] == pad).all() and (gotf[:, vw:] == pad).all()


def test_native_resample_flip_fold_equals_explicit_flip():
    """Folding the flip into sampling coords == flipping the image first
    (exact in float; the uint8 lane shares one rounding)."""
    from retinanet_tpu.data import native as native_codec
    if native_codec.get_resample_lib() is None:
        pytest.skip("native resample lib unavailable")
    rng = np.random.default_rng(11)
    src = rng.integers(0, 256, (41, 29, 3), np.uint8)
    pad = np.zeros(3, np.float32)
    kw = dict(out_hw=(24, 24), valid_hw=(24, 24),
              scale_yx=(0.6, 0.9), offset_yx=(0.0, 1.0), pad_rgb=pad)
    folded = native_codec.resample_bilinear(src, flip=True, **kw)
    explicit = native_codec.resample_bilinear(
        np.ascontiguousarray(src[:, ::-1]), flip=False, **kw)
    np.testing.assert_array_equal(folded, explicit)


def test_native_resample_rejects_bad_geometry():
    from retinanet_tpu.data import native as native_codec
    if native_codec.get_resample_lib() is None:
        pytest.skip("native resample lib unavailable")
    src = np.zeros((4, 4, 3), np.uint8)
    pad = np.zeros(3, np.float32)
    # valid region larger than the canvas -> refused, not overflowed
    assert native_codec.resample_bilinear(
        src, (8, 8), (9, 8), (2.0, 2.0), (0, 0), False, pad) is None
    # unsupported dtype falls back
    assert native_codec.resample_bilinear(
        src.astype(np.float64), (8, 8), (8, 8), (2.0, 2.0), (0, 0),
        False, pad) is None
