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
    v5e): on this (B, H, S, dh) entry the Pallas kernels lose in-model —
    the per-head grid is too fine at CLIP sequence lengths, and the
    batched-group variant's raw-op win is eaten by the head transposes
    XLA cannot fuse through a custom call — so 'auto' = 'xla_bf16' for
    bf16 inputs on TPU, plain 'xla' otherwise.  The kernel that DOES win
    consumes the packed (B, S, W) projection layout with no transposes
    at all: the model blocks call `sdpa_packed`, which routes to it
    (L/14 662→745 img/s, B/16 2,905→3,564).  CRT_FORCE_FLASH=1 forces
    the Pallas kernel here for A/B runs.
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


def packed_ok(heads: int, width: int) -> bool:
    """True when the packed Pallas kernel handles this head geometry: a
    grouping exists whose lane-block width is a multiple of 128 (covers
    dh=64 towers AND ragged dh like H/14's 80, where 8·80 = 5·128)."""
    from . import flash

    dh = width // heads
    return flash.packed_group(heads, dh) is not None


def sdpa_packed(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    heads: int,
    *,
    causal: bool = False,
    impl: str = "auto",
) -> jax.Array:
    """Attention on the PACKED (B, S, W) projection layout, W = heads·dh.

    The model's blocks call this instead of reshaping to (B, H, S, dh)
    themselves: on TPU the packed Pallas kernel consumes this layout
    directly (no HBM head-transposes anywhere — measured +13% full-model
    on ViT-L/14, see `flash.flash_attention_packed`), and every other
    path falls back to the reshape→`sdpa`→reshape the reference math
    implies (`/root/reference/clip_retrieval/clip_inference/mapper.py:36`
    runs the torch equivalent inside open_clip).
    """
    from . import flash

    use_packed = False
    if impl in ("auto", "flash") and _on_tpu():
        if os.environ.get("CRT_DISABLE_FLASH") != "1":
            dh = q.shape[-1] // heads
            use_packed = (
                q.dtype == jnp.bfloat16
                and packed_ok(heads, q.shape[-1])
                # only geometries measured on real Mosaic ride 'auto'
                # (attn_tpu.json: dh set + seq cap); unmeasured head dims
                # and the causal text path stay on the measured xla_bf16
                # route until benched — impl='flash' or CRT_FORCE_FLASH=1
                # forces them for A/B runs (the env var must force the
                # SAME kernel 'auto' would adopt, or the A/B measures the
                # wrong thing)
                and (impl == "flash"
                     or os.environ.get("CRT_FORCE_FLASH") == "1"
                     or (q.shape[1] <= flash.MAX_PACKED_SEQ
                         and dh in flash.MEASURED_PACKED_DH
                         and not causal))
            )
    if use_packed:
        return flash.flash_attention_packed(
            q, k, v, heads, causal=causal,
            variant=os.environ.get("CRT_PACKED_VARIANT", "slice"),
        )
    b, s, w = q.shape
    dh = w // heads
    split = lambda x: x.reshape(b, -1, heads, dh).transpose(0, 2, 1, 3)
    o = sdpa(split(q), split(k), split(v), causal=causal, impl=impl)
    return o.transpose(0, 2, 1, 3).reshape(b, s, w)
