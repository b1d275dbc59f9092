"""Pallas fused gather-scan for the IVF-int8 probed-union GEMM.

The XLA path of `index/ivf_int8.py::_scan_selected_device` materializes the
probed union before scoring it: `rows[chunk_sel]` writes a (U, Lc, d) int8
copy to HBM, the GEMM reads it back, and only then do scores exist — the
union's row bytes cross HBM three times (gather read + gather write + GEMM
read).  At the 30M serving shape (U≈8k chunks × Lc=256 × d=512, b=64) that
is ~3.2 GB of traffic for a ~1.07 GB union, and the measured effective scan
rate bottoms out at ~110 GB/s of *useful* rows (13 % of the 819 GB/s HBM
speed of light — docs/big_index_serving.md §6 names this kernel as the
headroom).

This kernel reads each selected chunk ONCE: `chunk_sel` rides scalar
prefetch (the same pattern as ops/adc_scan.py, proven on real Mosaic), the
BlockSpec index_map DMAs chunk `sel[i]` straight from the (nchunks, Lc, d)
HBM image into VMEM — Pallas double-buffers the stream — and the kernel
fuses the int8 MXU GEMM, the per-row dequantization scales, and the
padding mask into the block before a single (B, Lc) f32 store.  Per-chunk
traffic drops from 3×Lc·d + 4·B·Lc to Lc·d + 4·B·Lc bytes.

Top-k stays outside (jax.lax.approx_max_k over the (B, U·Lc) scores): it
reads the scores once and is already memory-minimal.

**Measured result (real v5e, benchmarks/int8_scan_tpu.json): no win.**
At the 10M×512 serving shape (7,280 probed chunks, Lc=256, b=64) the
kernel scans in 6.2 ms vs the XLA gather path's 4.8 ms (scores
bit-identical), and at d=64 it loses ~100× (int8_scan_tpu_d64.json —
sub-lane-width rows blocks force per-step relayout).  XLA's big-slice
gather already feeds the MXU at the effective HBM bound for this access
pattern, so the "3× gather traffic" saving does not convert into wall
time (the score-buffer write+read and top-k, identical in both paths,
set the floor).  The kernel is kept as
measured engineering evidence and as the substrate for a future
chunk-coalesced variant; it does NOT ride `auto`
(index/ivf_int8.py::_scan_impl — the flash.py gate policy:
only measured wins flip routing).

Reference being replaced: FAISS's C++ IVF scan loop
(/root/reference/clip_retrieval/clip_back.py:355-369) — redesigned as a
streaming MXU kernel rather than translated.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# scalar-prefetch operands live in SMEM: bound the per-call worklist and
# loop over segments for larger selections (adc_scan.py sets the precedent)
MAX_CHUNKS_PER_CALL = 8192


def _scan_kernel(
    sel_ref,  # (U,) i32 scalar-prefetch: chunk index per grid step
    qq_ref,  # (B, d) i8 — quantized queries, resident across the grid
    qscale_ref,  # (B, 1) f32 — per-query dequant scale, resident
    rows_ref,  # (1, Lc, d) i8 block — chunk sel[i], auto double-buffered
    scales_ref,  # (1, 1, Lc) f32 block — row dequant scales of chunk sel[i]
    pos_ref,  # (1, 1, Lc) i32 block — CSR positions (−1 ⇒ padding row)
    out_ref,  # (B, Lc) f32 block — columns [i·Lc, (i+1)·Lc) of the scores
):
    del sel_ref  # consumed by the BlockSpec index maps
    acc = jax.lax.dot_general(
        qq_ref[:],
        rows_ref[0],
        (((1,), (1,)), ((), ())),  # contract d on both; no transpose
        preferred_element_type=jnp.int32,
    )  # (B, Lc) on the MXU
    scores = acc.astype(jnp.float32) * qscale_ref[:] * scales_ref[0]
    out_ref[:] = jnp.where(pos_ref[0] >= 0, scores, -jnp.inf)


def _scan_call(qq, q_scale, rows, scales, pos, chunk_sel, interpret):
    b, d = qq.shape
    nchunks, lc = scales.shape
    u = chunk_sel.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(u,),
        in_specs=[
            pl.BlockSpec(
                (b, d), lambda i, sel: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (b, 1), lambda i, sel: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, lc, d),
                lambda i, sel: (sel[i], 0, 0),
                memory_space=pltpu.VMEM,
            ),
            # (1, 1, Lc) blocks: the last two dims equal the full array
            # dims, satisfying the TPU (8, 128) block-tiling rule for
            # one-chunk-per-step sideband data (same trick as adc_scan)
            pl.BlockSpec(
                (1, 1, lc),
                lambda i, sel: (sel[i], 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, lc),
                lambda i, sel: (sel[i], 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (b, lc), lambda i, sel: (0, i), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        _scan_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, u * lc), jnp.float32),
        interpret=interpret,
    )(
        chunk_sel.astype(jnp.int32),
        qq,
        q_scale.reshape(b, 1).astype(jnp.float32),
        rows,
        scales.reshape(nchunks, 1, lc),
        pos.reshape(nchunks, 1, lc),
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def int8_gather_scan(
    qq: jax.Array,  # (B, d) i8 — quantize_rows_device output
    q_scale: jax.Array,  # (B,) f32
    rows: jax.Array,  # (nchunks, Lc, d) i8 — the chunked CSR image
    scales: jax.Array,  # (nchunks, Lc) f32 (0 ⇒ padding row)
    pos: jax.Array,  # (nchunks, Lc) i32 (−1 ⇒ padding row)
    chunk_sel: jax.Array,  # (U,) i32 — host-assembled probed-union chunks
    interpret: bool = False,
) -> jax.Array:
    """Masked dequantized scores (B, U·Lc) f32 of the selected chunks,
    bit-compatible with the XLA gather path in _scan_selected_device."""
    u = chunk_sel.shape[0]
    if u <= MAX_CHUNKS_PER_CALL:
        return _scan_call(qq, q_scale, rows, scales, pos, chunk_sel,
                          interpret)
    seg = MAX_CHUNKS_PER_CALL
    pad = (-u) % seg
    if pad:
        # padding selections point at chunk 0 but are sliced off below
        chunk_sel = jnp.concatenate(
            [chunk_sel, jnp.zeros((pad,), chunk_sel.dtype)]
        )
    parts = [
        _scan_call(
            qq, q_scale, rows, scales, pos,
            jax.lax.dynamic_slice_in_dim(chunk_sel, s, seg), interpret,
        )
        for s in range(0, u + pad, seg)
    ]
    lc = rows.shape[1]
    return jnp.concatenate(parts, axis=1)[:, : u * lc]
