"""Scaled-dot-product attention for the CLIP towers.

The reference runs attention inside torch's CUDA kernels (via all_clip /
open_clip models, `/root/reference/clip_retrieval/clip_inference/mapper.py:36`).
Here attention is a first-party op: an XLA einsum path (which XLA fuses well at
CLIP's short sequence lengths — 50..577 tokens) and a Pallas flash-attention
kernel for TPU used when shapes allow (see `flash.py`).

Shapes follow (batch, heads, seq, head_dim).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def sdpa_reference(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    scale: float | None = None,
) -> jax.Array:
    """Plain XLA attention. Softmax in fp32 regardless of input dtype."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    logits = logits * jnp.float32(scale)
    if causal:
        s_q, s_k = logits.shape[-2], logits.shape[-1]
        mask = jnp.tril(jnp.ones((s_q, s_k), dtype=bool))
        logits = jnp.where(mask, logits, jnp.float32(-1e30))
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(v.dtype)


@functools.partial(jax.jit, static_argnames=("causal", "impl"))
def sdpa(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    impl: str = "auto",
) -> jax.Array:
    """Dispatching attention entry point.

    impl: 'auto' | 'xla' | 'flash'.  'auto' uses the Pallas flash kernel on
    TPU when the shape is worth it (long-ish sequences), else the XLA path.
    """
    if impl == "auto":
        # measured on v5e (ViT-L/14, S=257): XLA's fused attention matches the
        # Pallas kernel at CLIP sequence lengths; keep XLA unless forced
        impl = "xla"
        if os.environ.get("CRT_FORCE_FLASH") == "1" and _on_tpu():
            impl = "flash"
    if impl == "flash":
        from . import flash

        return flash.flash_attention(q, k, v, causal=causal)
    return sdpa_reference(q, k, v, causal=causal)
