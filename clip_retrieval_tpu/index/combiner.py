"""index_combiner: merge per-shard IVF-PQ indices sharing one trained prefix.

Reference counterpart: `/root/reference/clip_retrieval/clip_back_prepro/
index_combiner.py:10-26` (faiss merge_ondisk → populated.index +
merged_index.ivfdata).  Because our inverted lists are plain CSR arrays, the
merge is an offset-table concatenation: per-list segments from every shard
are concatenated in shard order — no C++ needed.

Shards must share coarse centroids / codebooks / rotation (same constraint
as faiss: merge requires indices cloned from one trained index).
"""

from __future__ import annotations

import glob
import os

import numpy as np

from .ivfpq import IVFPQIndex


def _merge_refine(indices, ids, total: int, d: int, scratch):
    """Merge the exact re-rank stores when every shard carries one and the
    ids partition 0..total-1 (refine rows are indexed by id); otherwise the
    merged index degrades to scan-only with a warning, never silently.
    Shared by the ivfpq and ivf_int8 combiners."""
    refine = None
    have_refine = [ix.refine_vectors is not None for ix in indices]
    if any(have_refine) and not all(have_refine):
        print(
            f"WARNING: only {sum(have_refine)}/{len(indices)} shards carry "
            "an exact re-rank store — dropping the refine tier from the "
            "combined index (recall falls back to the raw scan)"
        )
    if all(have_refine):
        # refine rows are indexed by id; mergeable iff every shard's ids
        # are a contiguous range (id = shard offset + local build row,
        # which is what build.py emits) and the ranges tile 0..total-1
        shard_ranges = []
        ok = True
        for ix in indices:
            sids = np.sort(np.asarray(ix.list_ids))
            if sids.size and not np.array_equal(
                sids, np.arange(sids[0], sids[0] + sids.size)
            ):
                ok = False
                break
            shard_ranges.append((int(sids[0]) if sids.size else 0, sids.size))
        if ok and ids.min() >= 0 and ids.max() == total - 1 and len(
            np.unique(ids)
        ) == total:
            from .build import scratch_memmap

            # disk-backed: the merged store is ~total·d·2 bytes (100 GB at
            # the 100M×512 tier) and must not live in RAM (same contract as
            # build.py's refine path)
            refine = scratch_memmap((total, d), np.float16, scratch)
            chunk = 1 << 17
            for ix, (lo, n) in zip(indices, shard_ranges):
                # stream: the source may be a memmap or ShardRowGather;
                # one-shot np.asarray would materialize a shard in RAM
                for i in range(0, n, chunk):
                    hi = min(i + chunk, n)
                    refine[lo + i : lo + hi] = np.asarray(
                        ix.refine_vectors[i:hi], np.float16
                    )
        else:
            print(
                "WARNING: shard ids do not tile the merged range; "
                "dropping the refine tier from the combined index"
            )
    return refine


def combine_ivfpq(
    indices: list[IVFPQIndex], scratch_dir: str | None = None
) -> IVFPQIndex:
    base = indices[0]
    for other in indices[1:]:
        if not np.allclose(base.coarse_centroids, other.coarse_centroids):
            raise ValueError("shard indices trained differently (centroids)")
        if not np.allclose(base.codebooks, other.codebooks):
            raise ValueError("shard indices trained differently (codebooks)")
    nlist = base.nlist
    sizes = np.zeros((nlist,), np.int64)
    for ix in indices:
        sizes += ix.list_sizes()
    offsets = np.zeros((nlist + 1,), np.int64)
    np.cumsum(sizes, out=offsets[1:])
    total = int(offsets[-1])
    from .build import scratch_memmap

    scratch = [scratch_dir] if scratch_dir else []
    ids = scratch_memmap((total,), np.int64, scratch)
    codes = scratch_memmap((total, base.m), np.uint8, scratch)
    cursor = offsets[:-1].copy()
    for ix in indices:
        offs = ix.list_offsets
        for li in range(nlist):
            s, e = offs[li], offs[li + 1]
            n = int(e - s)
            if n:
                c = cursor[li]
                ids[c : c + n] = ix.list_ids[s:e]
                codes[c : c + n] = ix.list_codes[s:e]
                cursor[li] += n
    refine = _merge_refine(indices, ids, total, base.d, scratch)
    return IVFPQIndex(
        d=base.d,
        coarse_centroids=base.coarse_centroids,
        codebooks=base.codebooks,
        rotation=base.rotation,
        list_offsets=offsets,
        list_ids=ids,
        list_codes=codes,
        nprobe=base.nprobe,
        refine_vectors=refine,
        rerank_factor=base.rerank_factor,
    )


def combine_ivf_int8(indices, scratch_dir: str | None = None):
    """Merge IVF-int8 shard indices sharing coarse centroids (same
    offset-table concatenation as the PQ variant).  The merged corpus
    (q int8 + ids + scales ≈ 60 GB at the 100M×512 tier this combiner
    targets) is staged in disk-backed scratch, never RAM — the same
    contract as combine_ivfpq's refine store."""
    from .build import scratch_memmap
    from .ivf_int8 import IVFInt8Index

    base = indices[0]
    for other in indices[1:]:
        if not np.allclose(base.coarse_centroids, other.coarse_centroids):
            raise ValueError("shard indices trained differently (centroids)")
    nlist = base.nlist
    sizes = np.zeros((nlist,), np.int64)
    for ix in indices:
        sizes += ix.list_sizes()
    offsets = np.zeros((nlist + 1,), np.int64)
    np.cumsum(sizes, out=offsets[1:])
    total = int(offsets[-1])
    scratch = [scratch_dir] if scratch_dir else []
    ids = scratch_memmap((total,), np.int64, scratch)
    q = scratch_memmap((total, base.d), np.int8, scratch)
    scales = scratch_memmap((total,), np.float32, scratch)
    cursor = offsets[:-1].copy()
    for ix in indices:
        offs = ix.list_offsets
        for li in range(nlist):
            s, e = offs[li], offs[li + 1]
            m = int(e - s)
            if m:
                c = cursor[li]
                ids[c : c + m] = ix.list_ids[s:e]
                q[c : c + m] = ix.q_vectors[s:e]
                scales[c : c + m] = ix.scales[s:e]
                cursor[li] += m
    refine = _merge_refine(indices, ids, total, base.d, scratch)
    return IVFInt8Index(
        base.d, base.coarse_centroids, offsets, ids, q, scales,
        nprobe=base.nprobe, refine_vectors=refine,
        rerank_factor=base.rerank_factor,
    )


def index_combiner(indices_folder: str, output_folder: str):
    """CLI entry: merge all index dirs under indices_folder into one."""
    import json

    from .store import load_index

    paths = sorted(
        p
        for p in glob.glob(os.path.join(indices_folder, "*"))
        if os.path.isdir(p) and os.path.exists(os.path.join(p, "header.json"))
    )
    if not paths:
        raise ValueError(f"no index directories in {indices_folder}")
    with open(os.path.join(paths[0], "header.json")) as f:
        kind = json.load(f)["type"]
    indices = [load_index(p) for p in paths]
    os.makedirs(output_folder, exist_ok=True)
    if kind == "ivfpq":
        merged = combine_ivfpq(indices, scratch_dir=output_folder)
    elif kind == "ivf_int8":
        merged = combine_ivf_int8(indices, scratch_dir=output_folder)
    else:
        raise ValueError(
            f"combiner supports list-based indices (ivfpq, ivf_int8); "
            f"got {kind!r}"
        )
    os.makedirs(output_folder, exist_ok=True)
    merged.save(os.path.join(output_folder, "populated.index"))
    return merged
