"""index_combiner over IVF-int8 shard indices (shared trained centroids)."""

import numpy as np
import pytest

from clip_retrieval_tpu.index.combiner import combine_ivf_int8, index_combiner
from clip_retrieval_tpu.index.ivf_int8 import IVFInt8Index
from clip_retrieval_tpu.ops import kmeans as km
from clip_retrieval_tpu.ops.int8mm import quantize_rows


def _unit(x):
    return (x / np.linalg.norm(x, axis=-1, keepdims=True)).astype(np.float32)


def _shard(x, coarse, id_offset):
    assign = km.assign_chunked(x, coarse)
    order = np.argsort(assign, kind="stable")
    counts = np.bincount(assign, minlength=coarse.shape[0])
    offsets = np.zeros(coarse.shape[0] + 1, np.int64)
    np.cumsum(counts, out=offsets[1:])
    q, s = quantize_rows(x[order])
    return IVFInt8Index(
        x.shape[1],
        np.asarray(coarse),
        offsets,
        (order + id_offset).astype(np.int64),
        q,
        s,
        nprobe=16,
    )


def test_combine_matches_whole(tmp_path):
    rng = np.random.default_rng(0)
    x = _unit(rng.normal(size=(3000, 32)))
    coarse = np.asarray(km.kmeans(x, 16, niter=10))
    ix1 = _shard(x[:1500], coarse, 0)
    ix2 = _shard(x[1500:], coarse, 1500)
    merged = combine_ivf_int8([ix1, ix2])
    whole = _shard(x, coarse, 0)
    q = _unit(rng.normal(size=(10, 32)))
    _, im = merged.search(q, 10)
    _, iw = whole.search(q, 10)
    overlap = np.mean([len(set(im[r]) & set(iw[r])) for r in range(10)])
    assert overlap > 9.5
    # through the CLI-facing entry
    for i, ix in enumerate((ix1, ix2)):
        ix.save(str(tmp_path / f"shard{i}"))
    out = index_combiner(str(tmp_path), str(tmp_path / "merged"))
    assert out.ntotal == 3000


def test_from_vectors_pretrained_shards_combine(tmp_path):
    """Shard-build mode of the 100M tier: one trained coarse quantizer,
    per-shard `from_vectors(..., coarse=, id_offset=)` builds, combined
    index equals the whole-corpus build (same train-once-encode-per-shard
    contract as the reference's faiss merge_ondisk flow)."""
    rng = np.random.default_rng(1)
    x = _unit(rng.normal(size=(4000, 32)))
    coarse = np.asarray(km.kmeans(x, 16, niter=10))
    ix1 = IVFInt8Index.from_vectors(
        x[:2000], nlist=16, nprobe=16, coarse=coarse, id_offset=0
    )
    ix2 = IVFInt8Index.from_vectors(
        x[2000:], nlist=16, nprobe=16, coarse=coarse, id_offset=2000
    )
    assert int(np.asarray(ix2.list_ids).min()) >= 2000
    merged = combine_ivf_int8([ix1, ix2])
    whole = IVFInt8Index.from_vectors(x, nlist=16, nprobe=16, coarse=coarse)
    q = _unit(rng.normal(size=(10, 32)))
    _, im = merged.search(q, 10)
    _, iw = whole.search(q, 10)
    overlap = np.mean([len(set(im[r]) & set(iw[r])) for r in range(10)])
    assert overlap > 9.5

    # wrong-shape pretrained centroids must be loud
    with pytest.raises(ValueError, match="do not match"):
        IVFInt8Index.from_vectors(x, nlist=8, coarse=coarse)
    # shard refine without a global refine_source must be loud
    with pytest.raises(ValueError, match="GLOBAL id"):
        IVFInt8Index.from_vectors(
            x[:2000], nlist=16, coarse=coarse, id_offset=2000, refine=True
        )
