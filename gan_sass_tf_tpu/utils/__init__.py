"""Utilities: wav I/O (scipy-based — no soundfile/librosa in this env,
SURVEY.md §7.4), JSONL metrics sink (§5.5), profiler hooks (§5.1)."""

from gan_sass_tf_tpu.utils.wav_io import read_wav, write_wav
from gan_sass_tf_tpu.utils.metrics_writer import MetricsWriter
from gan_sass_tf_tpu.utils.profiler import profile_trace

__all__ = ["read_wav", "write_wav", "MetricsWriter", "profile_trace"]
