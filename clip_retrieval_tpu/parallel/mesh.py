"""Device mesh + sharding helpers.

The reference has no intra-node parallelism at all — one process pins one GPU
(`/root/reference/clip_retrieval/clip_inference/distributor.py:49-59`).  A TPU
host exposes 4-8 local cores that should cooperatively chew one partition's
batches, so the pipeline shards every batch across a local 1-D "dp" mesh and
lets XLA run the towers fully data-parallel (no collectives needed for
inference; contrastive training adds all_gathers — see `train.py`).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@functools.lru_cache(maxsize=None)
def local_mesh(axis: str = "dp", n_devices: int | None = None) -> Mesh:
    """1-D mesh over local devices (or the first n_devices of them)."""
    devs = jax.local_devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_leading(mesh: Mesh, x: Any, axis: str = "dp"):
    """Shard array(s) along the leading dim across the mesh."""
    sh = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda a: jax.device_put(a, sh), x)


def replicate(mesh: Mesh, x: Any):
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, sh), x)


def pad_to_multiple(n: int, m: int) -> int:
    return (n + m - 1) // m * m
