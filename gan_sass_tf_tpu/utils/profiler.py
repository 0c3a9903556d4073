"""Profiler hooks (SURVEY.md §5.1): jax.profiler trace capture around chosen
train steps; xplane dumps are viewable in TensorBoard/XProf."""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def profile_trace(logdir: str, enabled: bool = True):
    """Capture a device trace for the enclosed steps into `logdir`."""
    if not enabled:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def parse_profile_steps(spec: str):
    """'a:b' -> (a, b) step interval for the trainer's --profile-steps flag."""
    a, b = spec.split(":")
    return int(a), int(b)
