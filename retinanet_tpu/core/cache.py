"""Persistent XLA compilation cache setup.

First compiles of the 640x640 train step take 300+ seconds through the
tunneled TPU runtime; the persistent cache cuts warm starts to seconds.
Imported for side effects by bench.py / __graft_entry__ / the CLI.
"""

import os

import jax

_DEFAULT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable(path: str = None) -> None:
    # CPU AOT blobs fail to reload across runs on this host (machine
    # feature mismatch), so the cache is TPU-only.
    if jax.default_backend() not in ("tpu", "axon"):
        return
    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR", _DEFAULT)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


enable()
