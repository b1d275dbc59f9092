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

_UPDATE_JIT = None  # lazily-built module-level jit (shape-cached by jax)


def chunk_bytes() -> int:
    return int(os.environ.get("CRT_H2D_CHUNK_MB", "32")) << 20


def rows_per_chunk(row_bytes: int) -> int:
    return max(1, chunk_bytes() // max(1, row_bytes))


def _updater():
    global _UPDATE_JIT
    if _UPDATE_JIT is None:
        import jax

        def upd(buf, part, off):
            return jax.lax.dynamic_update_slice_in_dim(buf, part, off, 0)

        # donate_argnums=0: XLA reuses the destination buffer, so peak HBM
        # is full-array + one chunk (concatenating the parts instead would
        # briefly hold 2× the array — an OOM for device images built near
        # the HBM cap)
        _UPDATE_JIT = jax.jit(upd, donate_argnums=0)
    return _UPDATE_JIT


def device_put_chunked(x: np.ndarray, sharding=None):
    """Upload a host array in bounded row chunks; returns a device array.

    Chunks along axis 0 into a preallocated buffer via a donated
    dynamic-update-slice, so peak device memory is the array itself plus
    one staging chunk.  The offset is a traced scalar: one compile per
    (buffer, chunk) shape pair, not per offset.

    With `sharding` spanning multiple devices the array is placed directly
    onto it instead: per-device shard transfers are already bounded by the
    mesh split, and staging through the default device first would add a
    full device-to-device copy (and its memory) for nothing.
    """
    import jax
    import jax.numpy as jnp

    x = np.asarray(x)
    if sharding is not None:
        return jax.device_put(x, sharding)
    if x.ndim == 0 or x.nbytes <= chunk_bytes():
        return jnp.asarray(x)
    rows = rows_per_chunk(x.nbytes // x.shape[0])
    out = jnp.zeros(x.shape, x.dtype)
    upd = _updater()
    for i in range(0, x.shape[0], rows):
        out = upd(out, jnp.asarray(x[i : i + rows]), np.int32(i))
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
