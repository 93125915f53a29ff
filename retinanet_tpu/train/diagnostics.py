"""Training diagnostics & observability helpers.

Capability parity with reference retinanet/utils.py:7-57 (AverageMeter,
format_eta, DiscordLogger) and retinanet/loss_diagnostics.py:4-35
(InflectionDetector — curvature-based divergence detection that triggers
checkpoint-rewind auto-recovery, consumed by train/executor.py).
"""

from __future__ import annotations

import datetime
import json
import os
from typing import Dict, List, Optional

import numpy as np


class AverageMeter:
    """EMA throughput meter (reference utils.py:7-42): ignores the first
    `warmup` samples, then exponential moving average with `momentum`."""

    def __init__(self, momentum: float = 0.997, warmup: int = 10):
        self.momentum = momentum
        self.warmup = warmup
        self.reset()

    def reset(self) -> None:
        self._count = 0
        self._value: Optional[float] = None

    def accumulate(self, value: float) -> None:
        self._count += 1
        if self._count <= self.warmup:
            self._value = float(value)
            return
        self._value = (self.momentum * self._value
                       + (1.0 - self.momentum) * float(value))

    @property
    def averaged_value(self) -> float:
        return 0.0 if self._value is None else self._value


def format_eta(seconds: float) -> str:
    """Seconds -> 'D days, H:MM:SS' (reference utils.py:44-47)."""
    return str(datetime.timedelta(seconds=int(seconds)))


class DiscordLogger:
    """Webhook notifier (reference utils.py:45-57); enabled when the
    DISCORD_WEB_HOOK env var is set (reference executor.py:87-90)."""

    def __init__(self, webhook_url: Optional[str] = None,
                 username: str = "retinanet_tpu", enabled_flag: bool = True):
        self.webhook_url = (webhook_url or os.environ.get(
            "DISCORD_WEB_HOOK")) if enabled_flag else None
        self.username = username

    @property
    def enabled(self) -> bool:
        return bool(self.webhook_url)

    def log(self, message: str) -> None:
        if not self.enabled:
            return
        try:
            import requests
            requests.post(self.webhook_url,
                          json={"username": self.username,
                                "content": str(message)[:1900]},
                          timeout=5)
        except Exception:
            pass  # observability must never kill training


class InflectionDetector:
    """Flags anomalous curvature in a scalar loss stream — exact semantics
    of reference loss_diagnostics.py:4-35: after `skip_steps` warmup
    values, compute the second numerical gradient of the whole history,
    then the rounded absolute first difference of that curvature; anomalous
    when its second-to-last entry exceeds `threshold`."""

    def __init__(self, name: str, threshold: float, skip_steps: int = 45):
        if skip_steps < 2:
            raise ValueError("`skip_steps` should be greater than 2")
        self.name = name
        self.threshold = float(threshold)
        self._skip_steps = skip_steps
        self.reset()

    def reset(self) -> None:
        self._data: List[float] = []

    @property
    def data(self) -> List[float]:
        return self._data

    def is_value_anomalous(self, value: float) -> bool:
        self._data.append(float(value))
        if len(self._data) <= self._skip_steps:
            return False
        grads = np.gradient(np.gradient(self._data))
        diffs = np.round(np.abs(np.diff(grads)), 3)
        return bool(diffs[-2] > self.threshold)


class MetricsLogger:
    """Scalar metrics sink: JSONL always; TensorBoard when TF is available.

    Covers the reference's summary-writer groups losses/*, metrics/*,
    evaluation/* (reference executor.py:346-383)."""

    def __init__(self, log_dir: str, name: str = "train",
                 use_tensorboard: bool = True, enabled: bool = True,
                 tensorboard_dir: str = ""):
        # `enabled=False` makes every method a no-op — multi-host runs pass
        # chief-only so P hosts don't interleave writes into one shared
        # JSONL / TB event file (model_dir is shared, e.g. gs://)
        self._jsonl = None
        self._tb = None
        if not enabled:
            return
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, f"{name}_metrics.jsonl"),
                           "a", buffering=1)
        if use_tensorboard:
            try:
                import tensorflow as tf  # optional, host-side only
                # experiment.tensorboard_dir, when set, owns the TB event
                # root (reference executor.py:55,208-215 wrote summaries
                # under tensorboard_dir/<experiment>/{train,eval}); the
                # JSONL mirror always stays under log_dir.
                self._tb = tf.summary.create_file_writer(
                    tensorboard_dir or os.path.join(log_dir, name))
            except Exception:
                self._tb = None

    @property
    def has_tensorboard(self) -> bool:
        return self._tb is not None

    def log(self, step: int, scalars: Dict[str, float]) -> None:
        if self._jsonl is None:
            return
        clean = {k: float(v) for k, v in scalars.items()}
        self._jsonl.write(json.dumps({"step": int(step), **clean}) + "\n")
        if self._tb is not None:
            import tensorflow as tf
            with self._tb.as_default():
                for k, v in clean.items():
                    tf.summary.scalar(k, v, step=step)

    def log_histograms(self, step: int, tensors: Dict) -> None:
        """Per-weight value histograms (reference executor.py:329-344 wrote
        norms AND histograms). TensorBoard-only — a histogram has no JSONL
        representation; silently a no-op when TF/TB is unavailable."""
        if self._tb is None:
            return
        import tensorflow as tf
        with self._tb.as_default():
            for k, v in tensors.items():
                tf.summary.histogram(k, v, step=step)

    def flush(self) -> None:
        if self._jsonl is not None:
            self._jsonl.flush()
        if self._tb is not None:
            self._tb.flush()

    def close(self) -> None:
        if self._jsonl is not None:
            self._jsonl.close()
