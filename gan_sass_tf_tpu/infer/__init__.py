"""Inference (reference `separate()` path, SURVEY.md §3.2): mixture wav in →
separated source wavs out (BASELINE.json:5), plus the streaming chunked
overlap-add variant batched over the data mesh (BASELINE.json:11)."""

from gan_sass_tf_tpu.infer.separate import separate, separate_file
from gan_sass_tf_tpu.infer.streaming import (
    build_streaming_scan_fn,
    separate_streaming,
    separate_streaming_scan,
)

__all__ = [
    "separate", "separate_file", "separate_streaming",
    "separate_streaming_scan", "build_streaming_scan_fn",
]
