"""Device top-k for brute-force and IVF search paths."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("k",))
def topk_ip(queries: jax.Array, db: jax.Array, k: int):
    """Exact inner-product top-k: (B,d) × (N,d) → (B,k) scores, ids.

    One MXU matmul + lax.top_k; db may be fp16/bf16, accumulation fp32.
    """
    scores = jnp.dot(
        queries.astype(db.dtype), db.T, preferred_element_type=jnp.float32
    )
    # int32 on device (int64 requires x64 mode); host converts at the
    # boundary — per-chunk indices never exceed 2^31 rows
    return jax.lax.top_k(scores, k)


@functools.partial(jax.jit, static_argnames=("k",))
def topk_merge(best_vals, best_ids, new_vals, new_ids, k: int):
    """Merge running (B,k) best with a new candidate block (B,c)."""
    vals = jnp.concatenate([best_vals, new_vals], axis=1)
    ids = jnp.concatenate([best_ids, new_ids], axis=1)
    mvals, midx = jax.lax.top_k(vals, k)
    return mvals, jnp.take_along_axis(ids, midx, axis=1)
