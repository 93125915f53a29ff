"""Host input pipeline: tfrecords -> fixed-shape numpy batches.

Capability parity with reference retinanet/dataloader/input_pipeline.py:8-92,
redesigned for the JAX host/device split:

  * file list globbed and shuffled with seed 1337 (ref input_pipeline.py:38-41)
  * multi-host sharding of the *file list* by process index
    (ref input_pipeline.py:43-56 shards by input_pipeline_id)
  * train: infinite repeat, sample shuffle buffer, per-sample geometric
    augmentation on host (see preprocessing.py), fixed-shape padded GT out,
    drop-remainder batching
  * val: single epoch, resize-with-pad, final partial batch padded with
    image_id == -1 sentinels (the JAX analog of batching without
    drop_remainder — shapes must stay static for jit)
  * prefetch + parallel decode via a thread pool (cv2/numpy release the GIL)

The expensive label encoding (anchor matching) deliberately does NOT happen
here — it runs jit-compiled on device inside the train step
(see data/label_encoder.py), unlike the reference which burns host CPU in
tf.data (reference label_encoder.py:31-55).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List, Optional

import numpy as np

try:
    import cv2
    # one resize per worker thread: cv2's internal parallel_for would
    # oversubscribe cores and serialize the pool
    cv2.setNumThreads(0)
except Exception:  # pragma: no cover
    cv2 = None

from retinanet_tpu.data import native as native_codec
from retinanet_tpu.data import tfrecord
from retinanet_tpu.data.preprocessing import HostPreprocessor


def _parse_detection(record: bytes):
    """Native C++ example parse when available, Python codec otherwise."""
    parsed = native_codec.parse_detection_example(record)
    return parsed if parsed is not None \
        else tfrecord.parse_detection_example(record)

_RUN_MODES = ("train", "val")
_FILE_SHUFFLE_SEED = 1337  # reference input_pipeline.py:10


def decode_jpeg(data: bytes) -> np.ndarray:
    """JPEG/PNG -> RGB uint8 (H, W, 3), C-contiguous.

    Native libjpeg decode (GIL-free, RGB direct) when the shared lib is
    available; cv2 otherwise. The cv2 path uses cvtColor (0.09 ms SIMD)
    rather than `img[:, :, ::-1]` — the negative-stride view silently
    DOUBLED downstream warpAffine cost (8.3 vs 3.6 ms at 640x480; cv2
    copies non-contiguous sources internally per call)."""
    native = native_codec.decode_jpeg_rgb(data)
    if native is not None:
        return native
    if cv2 is not None:
        img = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)
        if img is None:
            raise ValueError("Failed to decode image")
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    from PIL import Image  # fallback
    import io as _io
    return np.asarray(Image.open(_io.BytesIO(data)).convert("RGB"))


class InputPipeline:
    """Iterable over fixed-shape numpy batches.

    Args mirror the reference InputPipeline(run_mode, params, is_multi_host,
    num_replicas); batch size is the PER-PROCESS batch (global batch /
    process_count under multi-host DP).
    """

    def __init__(self,
                 run_mode: str,
                 params,
                 is_multi_host: bool = False,
                 process_index: int = 0,
                 process_count: int = 1,
                 batch_size: Optional[int] = None,
                 max_boxes: Optional[int] = None,
                 num_workers: int = 16,
                 prefetch: int = 4,
                 seed: int = 1337,
                 val_shard_index: int = 0,
                 val_shard_count: int = 1):
        if run_mode not in _RUN_MODES:
            raise ValueError(f"run_mode must be one of {_RUN_MODES}")
        if val_shard_count > 1 and run_mode != "val":
            raise ValueError("val_shard_* only applies to run_mode='val'")
        # Per-host val decode sharding (reference executor.py:178-202
        # distributed one val dataset across hosts): every host walks the
        # SAME deterministic record stream but only DECODES its contiguous
        # `batch_size`-sized slice of each global batch of
        # batch_size * val_shard_count samples; the other slots never cost
        # a JPEG decode. All hosts emit the same number of local batches
        # (sentinel-padded), so collectives stay in lockstep.
        self.val_shard_index = int(val_shard_index)
        self.val_shard_count = int(val_shard_count)
        self.run_mode = run_mode
        self.params = params
        # padded-GT row count defaults from encoder_params.max_boxes (the
        # schema key owning static GT shapes); explicit ctor arg wins
        self.max_boxes = int(
            max_boxes if max_boxes is not None
            else params.encoder_params.get("max_boxes", 100))
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.seed = seed

        pattern = (params.dataloader_params.tfrecords.train
                   if run_mode == "train"
                   else params.dataloader_params.tfrecords.val)
        files = tfrecord.list_files(pattern)
        rng = np.random.default_rng(_FILE_SHUFFLE_SEED)
        files = list(np.array(files)[rng.permutation(len(files))])
        if is_multi_host:
            files = files[process_index::process_count]
            if not files:
                raise ValueError(
                    f"Host {process_index}/{process_count} got no tfrecords")
        self.files = files

        if batch_size is None:
            batch_size = (params.training.batch_size.train
                          if run_mode == "train"
                          else params.training.batch_size.val)
            if is_multi_host:
                batch_size //= process_count
        self.batch_size = int(batch_size)

        self.shuffle_buffer = int(
            params.dataloader_params.get("shuffle_buffer_size", 1024))
        self.preprocessor = HostPreprocessor(params, max_boxes=self.max_boxes)
        if run_mode == "val":
            # no augmentation on the val path
            self.preprocessor.use_augmentation = False
            self.preprocessor.horizontal_flip = False
            self.preprocessor.jitter = None

    # -- sample streams ------------------------------------------------------

    def _record_stream(self, epochs: Optional[int]) -> Iterator[bytes]:
        epoch = 0
        rng = np.random.default_rng(self.seed)
        while epochs is None or epoch < epochs:
            files = list(self.files)
            if self.run_mode == "train":
                files = list(np.array(files)[rng.permutation(len(files))])
            for path in files:
                yield from native_codec.read_records(path)
            epoch += 1

    def _shuffled(self, stream: Iterator[bytes]) -> Iterator[bytes]:
        if self.run_mode != "train" or self.shuffle_buffer <= 1:
            yield from stream
            return
        rng = np.random.default_rng(self.seed + 1)
        buf: List[bytes] = []
        for item in stream:
            buf.append(item)
            if len(buf) >= self.shuffle_buffer:
                idx = rng.integers(len(buf))
                buf[idx], buf[-1] = buf[-1], buf[idx]
                yield buf.pop()
        rng.shuffle(buf)
        yield from buf

    # -- per-sample work (runs in worker threads) ----------------------------

    def _process_train(self, record: bytes, sample_seed: int) -> Dict:
        sample = _parse_detection(record)
        image = decode_jpeg(sample["image"])
        rng = np.random.default_rng(sample_seed)
        return self.preprocessor(
            image, sample["boxes"], sample["classes"], rng)

    def _process_val(self, record: bytes) -> Dict:
        sample = _parse_detection(record)
        image = decode_jpeg(sample["image"])
        out, resize_scale = self.preprocessor.resize_with_pad(image)
        return {"image": out, "image_id": np.int64(sample["image_id"]),
                "resize_scale": resize_scale}

    # -- batching -------------------------------------------------------------

    def _collate(self, samples: List[Dict]) -> Dict[str, np.ndarray]:
        return {k: np.stack([s[k] for s in samples]) for k in samples[0]}

    def _sentinel_val(self) -> Dict:
        """A padding sample: ignored by eval (image_id == -1 sentinel)."""
        th, tw = self.preprocessor.target_h, self.preprocessor.target_w
        return {"image": np.zeros((th, tw, 3), self.preprocessor.image_dtype),
                "image_id": np.int64(-1),
                "resize_scale": np.ones(2, np.float32)}

    def _val_slots(self, stream: Iterator[bytes]) -> Iterator[Optional[bytes]]:
        """Group the global record stream into global batches of
        batch_size * val_shard_count, yield THIS host's contiguous
        batch_size-slice of each (None = sentinel slot, incl. final-batch
        padding). With val_shard_count == 1 this degrades to the plain
        single-host stream + final-batch padding."""
        global_bs = self.batch_size * self.val_shard_count
        lo = self.val_shard_index * self.batch_size
        chunk: List[bytes] = []
        for rec in stream:
            chunk.append(rec)
            if len(chunk) == global_bs:
                mine = chunk[lo:lo + self.batch_size]
                yield from mine
                yield from [None] * (self.batch_size - len(mine))
                chunk = []
        if chunk:
            mine = chunk[lo:lo + self.batch_size]
            yield from mine
            yield from [None] * (self.batch_size - len(mine))

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        is_train = self.run_mode == "train"
        stream = self._shuffled(self._record_stream(None if is_train else 1))
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            # sliding submission window: keep ~2x workers of samples in
            # flight so the pool never drains while a batch is collected
            # (batch-synchronous submit/collect loses ~3x throughput)
            from collections import deque
            depth = max(self.num_workers * 2, self.batch_size + 1)
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    window: deque = deque()
                    batch: List = []
                    counter = self.seed * 1_000_003

                    def drain_one():
                        nonlocal batch
                        batch.append(window.popleft().result())
                        if len(batch) == self.batch_size:
                            out_q.put(self._collate(batch))
                            batch = []

                    items = stream if is_train else self._val_slots(stream)
                    for record in items:
                        if stop.is_set():
                            return
                        counter += 1
                        if is_train:
                            window.append(pool.submit(
                                self._process_train, record, counter))
                        elif record is None:   # sentinel slot (padding /
                            window.append(pool.submit(  # other host's work)
                                self._sentinel_val))
                        else:
                            window.append(pool.submit(
                                self._process_val, record))
                        while len(window) >= depth:
                            drain_one()
                    while window:
                        drain_one()
                    assert not batch or is_train, \
                        "val slots always fill whole batches"
                    if batch and is_train:
                        pass  # train drops the remainder (infinite stream)
            except Exception as e:  # propagate to consumer
                out_q.put(e)
            finally:
                out_q.put(None)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    return
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
