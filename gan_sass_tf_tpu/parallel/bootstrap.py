"""Multi-host bootstrap (SURVEY.md §2.4): single-host slices need nothing;
multi-host (e.g. v5e pods across hosts) calls jax.distributed.initialize
before any backend use.  Kept as a thin, testable wrapper so the CLI can do
the right thing from environment variables."""

from __future__ import annotations

import os
from typing import Optional


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize JAX multi-process/multi-host mode when configured.

    Arguments default from the standard env vars (COORDINATOR_ADDRESS,
    NUM_PROCESSES, PROCESS_ID).  Returns True if initialize() was called,
    False for the single-process case (no-op) — so callers can do
    `initialize_distributed(); mesh = make_mesh(cfg.mesh)` unconditionally.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "COORDINATOR_ADDRESS"
    )
    if not coordinator_address:
        return False
    import jax

    num_processes = num_processes if num_processes is not None else int(
        os.environ.get("NUM_PROCESSES", "0")
    )
    process_id = process_id if process_id is not None else int(
        os.environ.get("PROCESS_ID", "-1")
    )
    if num_processes <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True
