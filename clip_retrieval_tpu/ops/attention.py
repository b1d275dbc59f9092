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
    bf16_logits: bool = False,
) -> jax.Array:
    """Plain XLA attention.

    bf16_logits=False: softmax fully in fp32 (exact path, used for
    training and fp32 inference).
    bf16_logits=True: the (B,H,S,S) logits round-trip HBM in bfloat16 —
    the dominant attention HBM traffic halves, exp/normalize still happen
    in fp32.  Measured on v5e ViT-L/14 bf16 batch=256: 571→655 img/s
    (+15%), output cosine vs the fp32 path 0.99991 (benchmarks/attn_tpu
    .json), well above the 0.999 parity bar the model tests enforce.
    """
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
    if bf16_logits:
        logits = logits.astype(jnp.bfloat16)
        mx = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp((logits - mx).astype(jnp.float32))
        probs = p / jnp.sum(p, axis=-1, keepdims=True)
    else:
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

    impl: 'auto' | 'xla' | 'xla_bf16' | 'flash'.

    'auto' resolution is measurement-driven (benchmarks/attn_tpu.json,
    v5e): the Pallas flash kernel loses to XLA's batched attention across
    the zoo's whole sequence range — seq 50 (B/32) through 577
    (L/14@336, 233 vs 278 img/s) — its per-head grid is too fine for
    these shapes; on TPU with bf16 activations the bf16-logits XLA
    variant wins by ~15% on ViT-L/14.  So 'auto' = 'xla_bf16' for bf16
    inputs on TPU, plain 'xla' otherwise.  CRT_FORCE_FLASH=1 forces the
    Pallas kernel for A/B runs.
    """
    if impl == "auto":
        impl = "xla"
        if _on_tpu():
            if os.environ.get("CRT_FORCE_FLASH") == "1":
                impl = "flash"
            elif q.dtype == jnp.bfloat16:
                impl = "xla_bf16"
    if impl == "flash":
        from . import flash

        return flash.flash_attention(q, k, v, causal=causal)
    return sdpa_reference(
        q, k, v, causal=causal, bf16_logits=(impl == "xla_bf16")
    )
