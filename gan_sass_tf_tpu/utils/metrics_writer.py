"""JSONL metrics sink (SURVEY.md §5.5) — replaces the reference's tf.summary
scalars.  One JSON object per line; pluggable TensorBoard mirroring can be
layered on since TF is present, but JSONL is the source of truth."""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional


class MetricsWriter:
    def __init__(self, path: Optional[str], tensorboard_dir: Optional[str] = None):
        self._fh = None
        self._tb = None
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self._fh = open(path, "a", buffering=1)
        if tensorboard_dir:
            # Optional TensorBoard mirror via tf.summary (TF is present as
            # the test oracle); JSONL stays the source of truth.
            try:
                import tensorflow as tf

                self._tb = tf.summary.create_file_writer(tensorboard_dir)
            except ImportError:
                self._tb = None

    def write(self, step: int, metrics: Dict[str, Any]) -> None:
        record = {"step": int(step), "time": time.time()}
        for k, v in metrics.items():
            try:
                record[k] = float(v)
            except (TypeError, ValueError):
                record[k] = v
        if self._fh:
            self._fh.write(json.dumps(record) + "\n")
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default():
                for k, v in record.items():
                    if k not in ("step", "time") and isinstance(v, float):
                        tf.summary.scalar(k, v, step=int(step))

    def close(self) -> None:
        if self._fh:
            self._fh.close()
            self._fh = None
        if self._tb is not None:
            self._tb.close()
            self._tb = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
