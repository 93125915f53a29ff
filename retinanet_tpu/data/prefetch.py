"""Device-side batch prefetch: overlap host->device transfer with compute.

The reference fed TPUs through tf.data `prefetch` + the TPUStrategy
infeed, which stages batches onto the device while the previous step
runs (reference dataloader/input_pipeline.py:57-92, executor.py:443-453).
The JAX analog: `shard_batch` (host numpy -> sharded jax.Array) performs
the H2D copy synchronously at call time, so calling it inline in the
train loop puts the transfer on the critical path between steps. A
one-producer background thread builds the next `depth` sharded batches
ahead so the copy of batch N+1 rides under the device step for batch N.

Safety notes:
  * the producer calls ONLY process-local JAX APIs (device_put via
    `make_array_from_process_local_data`) — no collectives, so it cannot
    deadlock multi-process runs whose main threads run allgathers;
  * `close()` is idempotent, drains the queue so a blocked producer
    exits, and joins the thread — trials (inflection retries) create a
    fresh prefetcher each and never leak threads.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Optional


class DevicePrefetcher:
    """Iterator that yields `make_batch()` results `depth` ahead.

    `make_batch` must produce one fully sharded device batch per call
    (raising StopIteration when the stream ends). Results are yielded in
    production order; exceptions from the producer re-raise at the
    consuming `next()` call.
    """

    _END = ("end", None)

    def __init__(self, make_batch: Callable[[], Any], depth: int = 2):
        if depth < 1:
            raise ValueError(f"depth must be >= 1, got {depth}")
        self._make_batch = make_batch
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._closed = threading.Event()
        self._thread = threading.Thread(
            target=self._produce, name="device-prefetch", daemon=True)
        self._thread.start()

    def _produce(self) -> None:
        while not self._closed.is_set():
            try:
                item = ("ok", self._make_batch())
            except StopIteration:
                item = self._END
            except BaseException as e:  # surface at the consumer
                item = ("err", e)
            while not self._closed.is_set():
                try:
                    self._q.put(item, timeout=0.1)
                    break
                except queue.Full:
                    continue
            if item[0] != "ok":
                return

    def __iter__(self) -> "DevicePrefetcher":
        return self

    def __next__(self) -> Any:
        if self._closed.is_set():
            raise StopIteration
        kind, value = self._q.get()
        if kind == "ok":
            return value
        self._closed.set()
        if kind == "end":
            raise StopIteration
        raise value

    def close(self) -> None:
        """Stop the producer and release staged batches (idempotent)."""
        self._closed.set()
        while True:  # unblock a producer waiting on a full queue
            try:
                self._q.get_nowait()
            except queue.Empty:
                break
        self._thread.join(timeout=5.0)

    def __enter__(self) -> "DevicePrefetcher":
        return self

    def __exit__(self, *exc: Any) -> Optional[bool]:
        self.close()
        return None
