"""Pallas streaming ADC scan for IVF-PQ search (the TPU ADC kernel).

Replaces the FAISS C++ IVF-PQ scan loop the reference gets for free via
`faiss` (`/root/reference/clip_retrieval/clip_back.py:355-369`), re-designed
for the TPU's compute character instead of translated:

- TPUs have no fast hardware gather, so the classic per-code LUT lookup
  (`score = Σ_m lut[m, code_m]`) is reformulated as a **one-hot matmul on
  the MXU**: a (C, M·256) one-hot expansion of C code rows multiplied by a
  (M·256, B) table holding every query's LUT.  Scoring a chunk against all
  B ≤ 128 queries costs the same MXU time as against one (the systolic
  array processes 128 result columns per pass), so the batch dimension is
  free and the per-slot price is a constant ~38 ns (measured v5e).
- inverted lists are stored contiguously with list starts aligned to the
  chunk size C, so each grid step's codes arrive via an aligned BlockSpec
  DMA that Pallas double-buffers automatically — a streaming scan whose
  VMEM footprint is one (C, M·256) one-hot + the LUT table, independent of
  list skew; HBM holds only the codes (+ ≤ nlist·C alignment pad rows).
- each chunk belongs to one query (scalar-prefetched `owner`); its column
  is selected from the (C, B) score matrix with a 1×B one-hot dot_general
  (again MXU, no gather/transpose), the q·centroid coarse term is added,
  and rows past the list end are masked to -inf.

The LUT is consumed in bfloat16 (~0.4% relative error) — far below the PQ
quantization distortion itself, the same trade FAISS's fast-scan kernels
make with int8 LUTs.  The exact-f32 XLA fallback lives in
`index/ivfpq.py::_scan_device`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_CHUNK = 128  # code rows per grid step (the MXU result tile height)
# scalar-prefetch operands live in SMEM (1 MB/core): bound the per-call
# worklist and loop over segments for larger scans
MAX_CHUNKS_PER_CALL = 8192


def _adc_kernel(
    blocks_ref,  # (NC,) i32 scalar-prefetch: codes block index per chunk
    nvalid_ref,  # (NC,) i32: valid rows in this chunk (0 → fully masked)
    owner_ref,  # (NC,) i32: owning query
    coarse_ref,  # (NC,) f32: q·centroid additive term
    codes_ref,  # (C, M) u8 block (aligned DMA, auto double-buffered)
    lut_ref,  # (K=256·M, B) bf16, resident across the grid
    out_ref,  # (1, C) f32 block
):
    i = pl.program_id(0)
    c, m = codes_ref.shape
    k = lut_ref.shape[0]
    # one-hot expansion: column j of the (C, K) matrix corresponds to
    # sub-quantizer j % M and code value j // M (tiled repeat layout)
    expanded = pltpu.repeat(codes_ref[:], 256, axis=1)  # (C, K) u8
    value_of_col = jax.lax.broadcasted_iota(jnp.int32, (c, k), 1) // m
    onehot = (expanded.astype(jnp.int32) == value_of_col).astype(jnp.bfloat16)
    scores_all = jnp.dot(  # (C, B): this chunk vs every query in the batch
        onehot, lut_ref[:], preferred_element_type=jnp.float32
    )
    # select the owning query's column: (1, B) one-hot × (C, B)ᵀ on the MXU
    b = scores_all.shape[1]
    sel = (
        jax.lax.broadcasted_iota(jnp.int32, (1, b), 1) == owner_ref[i]
    ).astype(jnp.float32)
    row = jax.lax.dot_general(
        sel, scores_all, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (1, C)
    ridx = jax.lax.broadcasted_iota(jnp.int32, (1, c), 1)
    out_ref[:] = jnp.where(
        ridx < nvalid_ref[i], row + coarse_ref[i], -jnp.inf
    ).reshape(1, 1, c)


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def adc_scan(
    codes_aligned: jax.Array,  # (Na, M) u8, every list start % chunk == 0
    lut_t: jax.Array,  # (256·M, B) f32/bf16, row v·M+m = lut[b][m][v]
    chunk_blocks: jax.Array,  # (NC,) i32 block index into codes_aligned
    chunk_nvalid: jax.Array,  # (NC,) i32
    chunk_owner: jax.Array,  # (NC,) i32
    chunk_coarse: jax.Array,  # (NC,) f32
    chunk: int = DEFAULT_CHUNK,
    interpret: bool = False,
) -> jax.Array:
    """Score NC chunks of C code rows each → (NC, C) f32 (-inf padding)."""
    nc = chunk_blocks.shape[0]
    lut_t = lut_t.astype(jnp.bfloat16)
    if nc > MAX_CHUNKS_PER_CALL:
        seg = MAX_CHUNKS_PER_CALL
        pad = (-nc) % seg
        if pad:
            z = jnp.zeros((pad,), chunk_blocks.dtype)
            chunk_blocks = jnp.concatenate([chunk_blocks, z])
            chunk_nvalid = jnp.concatenate(
                [chunk_nvalid, jnp.zeros((pad,), chunk_nvalid.dtype)]
            )
            chunk_owner = jnp.concatenate(
                [chunk_owner, jnp.zeros((pad,), chunk_owner.dtype)]
            )
            chunk_coarse = jnp.concatenate(
                [chunk_coarse, jnp.zeros((pad,), chunk_coarse.dtype)]
            )
        parts = [
            _adc_scan_call(
                codes_aligned, lut_t,
                jax.lax.dynamic_slice_in_dim(chunk_blocks, s, seg),
                jax.lax.dynamic_slice_in_dim(chunk_nvalid, s, seg),
                jax.lax.dynamic_slice_in_dim(chunk_owner, s, seg),
                jax.lax.dynamic_slice_in_dim(chunk_coarse, s, seg),
                chunk, interpret,
            )
            for s in range(0, nc + pad, seg)
        ]
        return jnp.concatenate(parts)[:nc]
    return _adc_scan_call(
        codes_aligned, lut_t, chunk_blocks, chunk_nvalid,
        chunk_owner, chunk_coarse, chunk, interpret,
    )


def _adc_scan_call(
    codes_aligned, lut_t, chunk_blocks, chunk_nvalid,
    chunk_owner, chunk_coarse, chunk: int, interpret: bool,
) -> jax.Array:
    nc = chunk_blocks.shape[0]
    m = codes_aligned.shape[1]
    k = 256 * m
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec(
                (chunk, m),
                lambda i, blocks, nv, ow, cz: (blocks[i], 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (k, lut_t.shape[1]),
                lambda i, *s: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            # (1, 1, C): last two dims equal the full array dims, which
            # satisfies the TPU (8, 128) block-tiling rule for a
            # one-row-per-chunk output
            (1, 1, chunk), lambda i, *s: (i, 0, 0), memory_space=pltpu.VMEM
        ),
    )
    out = pl.pallas_call(
        _adc_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nc, 1, chunk), jnp.float32),
        interpret=interpret,
    )(
        chunk_blocks.astype(jnp.int32),
        chunk_nvalid.astype(jnp.int32),
        chunk_owner.astype(jnp.int32),
        chunk_coarse.astype(jnp.float32),
        codes_aligned,
        lut_t,
    )
    return out.reshape(nc, chunk)
