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
    """JPEG/PNG -> RGB uint8 (H, W, 3)."""
    if cv2 is not None:
        img = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)
        if img is None:
            raise ValueError("Failed to decode image")
        return img[:, :, ::-1]  # BGR -> RGB
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
                 max_boxes: int = 100,
                 num_workers: int = 16,
                 prefetch: int = 4,
                 seed: int = 1337):
        if run_mode not in _RUN_MODES:
            raise ValueError(f"run_mode must be one of {_RUN_MODES}")
        self.run_mode = run_mode
        self.params = params
        self.max_boxes = max_boxes
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
        self.preprocessor = HostPreprocessor(params, max_boxes=max_boxes)
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

    def _pad_final_val_batch(self, samples: List[Dict]) -> List[Dict]:
        pad = dict(samples[0])
        pad = {k: np.zeros_like(v) for k, v in pad.items()}
        pad["image_id"] = np.int64(-1)  # sentinel: ignore in eval accumulate
        pad["resize_scale"] = np.ones(2, np.float32)
        while len(samples) < self.batch_size:
            samples.append(pad)
        return samples

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

                    for record in stream:
                        if stop.is_set():
                            return
                        counter += 1
                        if is_train:
                            window.append(pool.submit(
                                self._process_train, record, counter))
                        else:
                            window.append(pool.submit(
                                self._process_val, record))
                        while len(window) >= depth:
                            drain_one()
                    while window:
                        drain_one()
                    if batch and not is_train:
                        batch = self._pad_final_val_batch(batch)
                        out_q.put(self._collate(batch))
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
