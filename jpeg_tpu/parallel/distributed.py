"""Multi-host coordination (SURVEY.md §5 distributed-backend mapping).

The reference is one process reading one file (``src/main.rs:30-39``); scale
here comes from JAX's distributed runtime: ``jax.distributed.initialize`` for
multi-host slices, static host sharding of the corpus (images across hosts —
no in-decode collectives), and collective aggregation only for metrics.
All functions degrade to sensible single-process behavior so the same code
runs in tests, on one chip, and on a pod slice.
"""

from __future__ import annotations

import os

import numpy as np


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> tuple[int, int]:
    """Initialize jax.distributed when configured; returns (index, count).

    Configuration via args or the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID); plain
    single-process (0, 1) otherwise.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if coordinator_address:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes
            or int(os.environ.get("JAX_NUM_PROCESSES", "1")),
            process_id=process_id or int(os.environ.get("JAX_PROCESS_ID", "0")),
        )
    return jax.process_index(), jax.process_count()


def aggregate_metrics(metrics: dict[str, float]) -> dict[str, float]:
    """Sum numeric metrics across all hosts (frames/s accounting for the
    corpus benchmark). Single-process: identity."""
    import jax

    if jax.process_count() == 1:
        return dict(metrics)
    from jax.experimental import multihost_utils

    keys = sorted(metrics)
    local = np.array([float(metrics[k]) for k in keys], dtype=np.float64)
    summed = multihost_utils.process_allgather(local).sum(axis=0)
    return {k: float(v) for k, v in zip(keys, summed)}


def scaling_efficiency(total_fps: float, n_hosts: int,
                       single_host_fps: float) -> float:
    """BASELINE north-star metric: frames/s scaling efficiency at N hosts
    (1.0 = perfect linear scaling)."""
    if single_host_fps <= 0 or n_hosts <= 0:
        return 0.0
    return total_fps / (single_host_fps * n_hosts)
