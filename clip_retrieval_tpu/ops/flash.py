"""Pallas fused attention for CLIP towers on TPU.

CLIP sequences are short (50..577 tokens), so the whole (S, D) tile of one
(batch, head) fits comfortably in VMEM.  Rather than a streamed flash kernel
with online softmax (needed only when S*S doesn't fit on-chip), this kernel
fuses QK^T → softmax → PV into one VMEM-resident program, eliminating the
HBM round-trips for the S×S logits that a naive implementation would pay.

Two design points, both measured on v5e at ViT-L/14 shapes
(256, 16, 257, 64) bf16 — raw-op time per attention layer:

- **Group (batch, head) pairs per grid step.**  Per-head attention here is
  ≈1 µs of MXU work, so a one-pair-per-step grid (4096 steps) was dominated
  by per-step pipeline overhead and LOST to plain XLA (10.4 vs 10.1 ms).
  A batched dot_general over a group of 8 pairs amortizes it: 5.5 ms,
  1.8× over the XLA bf16-logits path.  Groups of 16+ crash the Mosaic
  compiler (internal scratch), so 8 is the cap.
- **No host-side padding.**  Padding S to the sublane multiple costs a full
  HBM round-trip over q/k/v before the kernel and a slice copy after
  (~1.5 ms of the old 8.2 ms at these shapes); Mosaic handles ragged
  sublane/lane block edges itself, so blocks use the raw S and D.  Without
  padded keys the non-causal path needs no mask at all.

The MXU floor for these per-head matmuls (K = head_dim = 64, half the
128-lane contraction) is ~4.7 ms, so 5.5 ms is ≈85% of what any kernel
could reach without changing the attention math.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# measured compile ceiling for the batched in-kernel dot_general (g=16
# crashes Mosaic at every tested shape); also the sweet spot for overhead
# amortization — see module docstring
_MAX_GROUP = 8
# f32 logits VMEM budget per grid step: keeps group·Sq·Sk·4 + double-
# buffered IO well under the ~16 MB/core VMEM at the longest CLIP
# sequence (577 tokens)
_LOGITS_BUDGET = 6 * 1024 * 1024


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, causal: bool):
    # matmul inputs stay in the storage dtype (bf16 on the inference path):
    # the MXU accumulates in f32 via preferred_element_type, and a prior
    # version that upcast q/k/v to f32 first paid the 4× f32-MXU penalty
    q = q_ref[...]  # (G, Sq, D)
    k = k_ref[...]  # (G, Sk, D)
    v = v_ref[...]
    logits = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale  # (G, Sq, Sk) f32
    if causal:
        g, sq, sk = logits.shape
        col = jax.lax.broadcasted_iota(jnp.int32, (g, sq, sk), 2)
        row = jax.lax.broadcasted_iota(jnp.int32, (g, sq, sk), 1)
        logits = jnp.where(col <= row, logits, -1e30)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)  # f32 softmax numerics
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        (p / denom).astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o_ref[...] = o.astype(o_ref.dtype)


def _pick_group(bh: int, sq: int, sk: int) -> int:
    g = max(1, min(_MAX_GROUP, _LOGITS_BUDGET // max(sq * sk * 4, 1)))
    while bh % g:
        g -= 1
    return g


def _attend_2d(q, k, v, *, scale: float, causal: bool):
    """One head's QK^T → scale → (causal mask) → f32 softmax → PV on 2D
    (S, dh) tiles — the body shared by the packed kernel's head loop."""
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # (Sq, Sk) f32
    if causal:
        sq, sk = logits.shape
        col = jax.lax.broadcasted_iota(jnp.int32, (sq, sk), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (sq, sk), 0)
        logits = jnp.where(col <= row, logits, -1e30)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)  # f32 softmax numerics
    p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(v.dtype)
    return jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _kern_packed(q_ref, k_ref, v_ref, o_ref, *, scale: float, causal: bool,
                 group: int, dh: int):
    """Heads live in the lane dimension: refs are (1, S, group·dh) slices
    of the packed (B, S, W) projection output.  Each head is a static
    lane slice (64-aligned when dh % 64 == 0; ragged otherwise, e.g.
    H/14's dh=80, where Mosaic lowers the slice to lane shuffles); the
    per-head logits scratch is reused across the unrolled loop, so VMEM
    holds one (S, S) f32 tile regardless of group."""
    for h in range(group):
        sl = slice(h * dh, (h + 1) * dh)
        o = _attend_2d(
            q_ref[0, :, sl], k_ref[0, :, sl], v_ref[0, :, sl],
            scale=scale, causal=causal,
        )
        o_ref[0, :, sl] = o.astype(o_ref.dtype)


def _kern_packed_batched(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                         causal: bool, group: int, dh: int):
    """Alternative body for ragged head dims (dh % 64 != 0): instead of
    `group` unaligned lane slices, re-layout the whole (S, group·dh) tile
    to (group, S, dh) once in VMEM and run ONE batched dot_general over
    all heads.  The relayout is a register shuffle, not HBM traffic — the
    point of the packed entry was avoiding the HBM head-transpose, and
    that is still avoided here.  Which body wins at dh=80 is decided by
    measurement (benchmarks/bench_attn.py --packed_ab), not assumed."""
    s = q_ref.shape[1]
    relay = lambda r: r[0].reshape(s, group, dh).transpose(1, 0, 2)
    q, k, v = relay(q_ref), relay(k_ref), relay(v_ref)
    logits = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale  # (G, S, Sk) f32
    if causal:
        g, sq, sk = logits.shape
        col = jax.lax.broadcasted_iota(jnp.int32, (g, sq, sk), 2)
        row = jax.lax.broadcasted_iota(jnp.int32, (g, sq, sk), 1)
        logits = jnp.where(col <= row, logits, -1e30)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(v.dtype)
    o = jax.lax.dot_general(
        p, v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (G, S, dh)
    o_ref[0, :, :] = o.transpose(1, 0, 2).reshape(s, group * dh).astype(
        o_ref.dtype
    )


# Longest sequence the packed kernel has been MEASURED at on real Mosaic
# (attn_tpu.json: S=50/77/257/577 all win).  S=577 is L/14@336:
# 280 → 329.5 img/s (+18%, MFU 0.544 → 0.640) vs the xla_bf16 path.
MAX_PACKED_SEQ = 577

# Head dims the packed kernel has been MEASURED to win at on real Mosaic
# (attn_tpu.json).  dh=64 covers B/32, B/16, L/14; dh=80 is H/14's ragged
# geometry (group=8, 8·80 = 5·128 lanes): the 'slice' body wins full-model
# 314.9 → 355.5 img/s (+13%, MFU 0.536 → 0.605).  dh=88 is g/14 (group=16,
# 16·88 = 11·128 lanes): 'slice' wins 175.9 → 223.1 img/s (+27%,
# min cos 0.9999, attn_tpu.json G14 rows).  The 'batched' relayout body
# does NOT compile on real Mosaic at dh=80 (remote tpu_compile rejects
# the in-VMEM (G,S,dh) relayout) — 'slice' is the only variant there.
MEASURED_PACKED_DH = frozenset({64, 80, 88})


def packed_group(heads: int, dh: int) -> int | None:
    """Largest divisor of `heads`, capped at _MAX_GROUP, whose lane-block
    width group·dh satisfies Mosaic's blocking rule (multiple of 128);
    for ragged head dims where NO divisor ≤ _MAX_GROUP aligns (g/14's
    dh=88 needs g·11 ≡ 0 mod 16 → g=16), the smallest aligned divisor
    above it, capped at 2048 lanes.  The _MAX_GROUP budget bounds the
    (G,Sq,Sk) f32 logits tile of the *batched* bodies; the packed 'slice'
    body attends one head at a time (one (S,S) logits tile regardless of
    group), so a wide group costs lane width, not VMEM — group=16/dh=88
    compiles and wins on real Mosaic (attn_tpu.json G14 rows).  None if
    nothing aligns (callers then use the XLA fallback)."""
    for g in range(min(heads, _MAX_GROUP), 0, -1):
        if heads % g == 0 and (g * dh) % 128 == 0:
            return g
    for g in range(_MAX_GROUP + 1, heads + 1):
        if heads % g == 0 and (g * dh) % 128 == 0 and g * dh <= 2048:
            return g
    return None


@functools.partial(
    jax.jit, static_argnames=("heads", "causal", "group", "variant")
)
def flash_attention_packed(q: jax.Array, k: jax.Array, v: jax.Array,
                           heads: int, *, causal: bool = False,
                           group: int | None = None,
                           variant: str = "slice") -> jax.Array:
    """Fused attention on the PACKED layout: q,k,v are (B, S, W) with
    W = heads·head_dim, exactly as the attention projections emit them.

    This is the form the model uses: the (B,S,W)→(B,H,S,dh) transposes
    that the unpacked entry point needs are real HBM copies that XLA does
    not fuse away around a custom call — measured on v5e ViT-L/14 bf16
    batch=256 they cost ~2 ms/layer, turning a 1.8× raw-op win into an
    in-model loss.  Consuming the packed layout directly (heads as static
    lane slices inside the kernel) removes them entirely: full-model
    658 → 745 img/s (+13%) vs the XLA bf16-logits path, min cos 0.99987.

    variant: 'slice' (per-head lane slices, the measured dh=64 winner) or
    'batched' (one in-VMEM relayout + batched dot across the group — the
    ragged-dh alternative A/B'd by bench_attn.py for H/14's dh=80).
    """
    b, s, w = q.shape
    dh = w // heads
    g = group or packed_group(heads, dh)
    if g is None:
        raise ValueError(f"no packed grouping for heads={heads} dh={dh}")
    if heads % g:
        # grid truncation would silently leave lanes g*dh.. uninitialized
        raise ValueError(f"group={g} does not divide heads={heads}")
    if variant == "batched" and g > _MAX_GROUP:
        # the batched body materializes a (G,Sq,Sk) f32 logits tile that
        # _MAX_GROUP exists to bound (g=16 crashes Mosaic there); only the
        # per-head 'slice' body may use the above-budget ragged groupings
        raise ValueError(
            f"variant='batched' needs group<={_MAX_GROUP} (got {g}); "
            f"use variant='slice' for ragged dims that align only above it"
        )
    body = _kern_packed_batched if variant == "batched" else _kern_packed
    kernel = functools.partial(
        body, scale=dh ** -0.5, causal=causal, group=g, dh=dh
    )
    interpret = jax.devices()[0].platform != "tpu"
    sk = k.shape[1]
    return pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=(b, heads // g),
        in_specs=[
            pl.BlockSpec((1, s, g * dh), lambda ib, ih: (ib, 0, ih),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, g * dh), lambda ib, ih: (ib, 0, ih),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, g * dh), lambda ib, ih: (ib, 0, ih),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, s, g * dh), lambda ib, ih: (ib, 0, ih),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s, w), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * heads * s * sk * dh,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=b * heads * s * sk,
        ),
    )(q, k, v)


@functools.partial(jax.jit, static_argnames=("causal", "group"))
def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array, *,
                    causal: bool = False, group: int | None = None
                    ) -> jax.Array:
    """Fused attention. q,k,v: (B, H, S, D) → (B, H, S, D)."""
    b, h, sq, d = q.shape
    sk = k.shape[2]
    scale = d ** -0.5

    bh = b * h
    g = group or _pick_group(bh, sq, sk)
    if bh % g:
        # grid truncation would silently drop the last bh % g rows
        raise ValueError(f"group={g} does not divide batch*heads={bh}")
    # contiguous views, no copies — and deliberately NO padding (see
    # module docstring; Mosaic masks the ragged block edges itself)
    qp = q.reshape(bh, sq, d)
    kp = k.reshape(bh, sk, d)
    vp = v.reshape(bh, sk, d)

    kernel = functools.partial(_attn_kernel, scale=scale, causal=causal)
    interpret = jax.devices()[0].platform != "tpu"  # CPU tests: interpret mode
    out = pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=(bh // g,),
        in_specs=[
            pl.BlockSpec((g, sq, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, sk, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, sk, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, sq, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * sq * sk * d,
            bytes_accessed=(qp.size + kp.size + vp.size) * qp.dtype.itemsize,
            transcendentals=bh * sq * sk,
        ),
    )(qp, kp, vp)
    return out.reshape(b, h, sq, d)
