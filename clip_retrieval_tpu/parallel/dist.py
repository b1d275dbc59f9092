"""Multi-host work distribution math.

Same contiguous-block task split as the reference's SLURM rank worker
(`/root/reference/clip_retrieval/clip_inference/slurm_worker.py:16-37`), kept
as a pure function so it is unit-testable without any scheduler; used by both
the SLURM shim and the TPU-pod distributor (where `jax.process_index()` /
`jax.process_count()` replace SLURM_PROCID/WORLD_SIZE).
"""

from __future__ import annotations

from typing import List


def get_task_list(num_tasks: int, world_size: int, global_rank: int) -> List[int]:
    """Contiguous block of task ids for this rank; the first `remainder`
    ranks absorb one extra task each."""
    if world_size <= 0:
        raise ValueError("world_size must be positive")
    tasks_per_worker = num_tasks // world_size
    remainder = num_tasks % world_size
    start = global_rank * tasks_per_worker + min(global_rank, remainder)
    count = tasks_per_worker + (1 if global_rank < remainder else 0)
    return list(range(start, start + count))


def init_pod() -> tuple[int, int]:
    """Initialize jax.distributed over DCN when running on a multi-host pod
    (env-driven: JAX coordinator vars must be set by the launcher).  Returns
    (process_index, process_count); on a single host returns (0, 1) without
    touching jax.distributed."""
    import os

    import jax

    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS"
    ):
        jax.distributed.initialize()
    try:
        return jax.process_index(), jax.process_count()
    except Exception:
        return 0, 1
