"""Host↔device transfer helpers: bounded-size staging chunks.

Large single transfers are fragile: this harness's TPU relay collapses from
~30 MB/s at ~32-134 MB buffers to <3 MB/s on multi-GB ones (measured in
benchmarks/NOTES.md), and even on real PCIe hosts pinned staging buffers in
the tens of MB are the standard pattern — a 32 MB chunk reaches ~full link
bandwidth while bounding pinned-memory pressure.  All bulk uploads in the
index/build paths go through these helpers.

`CRT_H2D_CHUNK_MB` overrides the chunk size (default 32).
"""

from __future__ import annotations

import os

import numpy as np


def chunk_bytes() -> int:
    return int(os.environ.get("CRT_H2D_CHUNK_MB", "32")) << 20


def rows_per_chunk(row_bytes: int) -> int:
    return max(1, chunk_bytes() // max(1, row_bytes))


def device_put_chunked(x: np.ndarray, sharding=None):
    """Upload a host array in row chunks; returns a device array.

    Chunks along axis 0 and concatenates on device (one extra HBM copy,
    paid once).  With `sharding`, the assembled array is then device_put
    onto it (a device-to-device move, not another host transfer).
    """
    import jax
    import jax.numpy as jnp

    x = np.asarray(x)
    if x.ndim == 0 or x.nbytes <= chunk_bytes():
        out = jnp.asarray(x)
    else:
        rows = rows_per_chunk(x.nbytes // x.shape[0])
        parts = [
            jnp.asarray(x[i : i + rows]) for i in range(0, x.shape[0], rows)
        ]
        out = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
    if sharding is not None:
        out = jax.device_put(out, sharding)
    return out


def to_host_chunked(y) -> np.ndarray:
    """Read a device array back in row chunks (same rationale)."""
    if y.ndim == 0 or y.nbytes <= chunk_bytes():
        return np.asarray(y)
    rows = rows_per_chunk(y.nbytes // y.shape[0])
    out = np.empty(y.shape, np.dtype(y.dtype))
    for i in range(0, y.shape[0], rows):
        out[i : i + rows] = np.asarray(y[i : i + rows])
    return out
