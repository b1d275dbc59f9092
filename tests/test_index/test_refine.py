"""Exact re-ranking (refine) lifts IVF-PQ recall to near-exact."""

import numpy as np
import pytest

from clip_retrieval_tpu.index import FlatIndex, load_index
from clip_retrieval_tpu.index.autotune import parse_index_key
from clip_retrieval_tpu.index.build import (
    EmbeddingShards,
    build_index_from_shards,
)


def _unit(x):
    return (x / np.linalg.norm(x, axis=-1, keepdims=True)).astype(np.float32)


def test_refine_recall(tmp_path):
    rng = np.random.default_rng(0)
    centers = _unit(rng.normal(size=(24, 32)))
    x = _unit(
        centers[rng.integers(0, 24, 4000)] + 0.15 * rng.normal(size=(4000, 32))
    )
    folder = tmp_path / "emb"
    folder.mkdir()
    np.save(folder / "e.npy", x.astype(np.float16))
    shards = EmbeddingShards(str(folder))
    params = parse_index_key("IVF64,PQ8", 32)  # coarse PQ: ~0.69 recall alone

    q = _unit(rng.normal(size=(40, 32)) + centers[rng.integers(0, 24, 40)])
    exact = FlatIndex(32)
    exact.add(x)
    _, gt = exact.search(q, 10)

    plain = build_index_from_shards(shards, params, nprobe=64)
    _, got_plain = plain.search(q, 10)
    recall_plain = np.mean(
        [len(set(gt[i]) & set(got_plain[i])) / 10 for i in range(40)]
    )

    refined = build_index_from_shards(shards, params, nprobe=64, refine=True)
    vals, got_ref = refined.search(q, 10)
    recall_ref = np.mean(
        [len(set(gt[i]) & set(got_ref[i])) / 10 for i in range(40)]
    )
    assert recall_ref > recall_plain
    assert recall_ref >= 0.95, (recall_plain, recall_ref)
    # refined scores are true fp16 inner products
    true = (q[0] * x[got_ref[0, 0]]).sum()
    np.testing.assert_allclose(vals[0, 0], true, atol=2e-3)


def test_refine_save_load(tmp_path):
    rng = np.random.default_rng(1)
    x = _unit(rng.normal(size=(500, 32)))
    folder = tmp_path / "emb"
    folder.mkdir()
    np.save(folder / "e.npy", x.astype(np.float16))
    shards = EmbeddingShards(str(folder))
    ix = build_index_from_shards(
        shards, parse_index_key("IVF8,PQ8", 32), nprobe=8, refine=True
    )
    path = str(tmp_path / "r.index")
    ix.save(path)
    loaded = load_index(path)
    assert loaded.refine_vectors is not None
    v1, i1 = ix.search(x[:5], 7)
    v2, i2 = loaded.search(x[:5], 7)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(v1, v2, atol=1e-6)


def test_autotune_defaults_to_refine_and_hits_recall(tmp_path):
    """Default (no index_key, no refine flag) IVF-PQ builds must select the
    refine tier and clear the recall@10 ≥ 0.95 north-star (BASELINE.md)."""
    from clip_retrieval_tpu.index.autotune import select_params
    from clip_retrieval_tpu.index.build import quantize

    rng = np.random.default_rng(1)
    centers = _unit(rng.normal(size=(24, 32)))
    x = _unit(
        centers[rng.integers(0, 24, 4000)] + 0.15 * rng.normal(size=(4000, 32))
    )
    folder = tmp_path / "emb"
    folder.mkdir()
    np.save(folder / "e.npy", x.astype(np.float16))

    # a budget too small for flat tiers → autotune lands on ivfpq + refine
    params = select_params(4000, 32, max_index_memory="64K")
    assert params.kind == "ivfpq" and params.use_refine
    assert params.index_key.endswith(",RFlat")

    index, infos = quantize(
        str(folder), str(tmp_path / "x.index"), str(tmp_path / "x.json"),
        max_index_memory_usage="64K", index_key=None, nprobe=64,
        compute_recall=True, refine=None,
    )
    assert index.refine_vectors is not None
    assert infos["index_key"].endswith(",RFlat")
    # recorded recall in the infos json (autofaiss score_index parity)
    assert infos["recall@40"] >= 0.95, infos

    # explicit opt-out still wins over the autotune default
    index2, _ = quantize(
        str(folder), str(tmp_path / "y.index"), str(tmp_path / "y.json"),
        max_index_memory_usage="64K", index_key=None, nprobe=64,
        compute_recall=False, refine=False,
    )
    assert index2.refine_vectors is None


def test_parse_rflat_key():
    from clip_retrieval_tpu.index.autotune import parse_index_key

    p = parse_index_key("OPQ8,IVF64,PQ8,RFlat", 32)
    assert p.use_refine and p.use_opq and p.nlist == 64 and p.m == 8
    assert parse_index_key("IVF64,PQ8,Refine(Flat)", 32).use_refine


def test_combiner_merges_refine(tmp_path):
    """Combining refined shard indices keeps the exact re-rank tier when
    shard ids tile the merged range."""
    from clip_retrieval_tpu.index import combiner as comb
    from clip_retrieval_tpu.index.build import (
        EmbeddingShards, build_index_from_shards,
    )

    rng = np.random.default_rng(2)
    x = _unit(rng.normal(size=(600, 32)))
    f1, f2 = tmp_path / "a", tmp_path / "b"
    f1.mkdir(); f2.mkdir()
    np.save(f1 / "e.npy", x[:400].astype(np.float16))
    np.save(f2 / "e.npy", x[400:].astype(np.float16))
    params = parse_index_key("IVF16,PQ8,RFlat", 32)
    ix1 = build_index_from_shards(EmbeddingShards(str(f1)), params, nprobe=16)
    ix2 = build_index_from_shards(EmbeddingShards(str(f2)), params, nprobe=16)
    assert ix1.refine_vectors is not None
    # share the trained prefix + offset shard 2 ids, like a real sharded build
    ix2.coarse_centroids = ix1.coarse_centroids
    ix2.codebooks = ix1.codebooks
    ix2.rotation = ix1.rotation
    ix2.list_ids = ix2.list_ids + 400
    # re-encode shard 2 codes under shard 1's codebooks for consistency
    merged = comb.combine_ivfpq([ix1, ix2])
    assert merged.refine_vectors is not None
    assert merged.refine_vectors.shape == (600, 32)
    # refine rows land at their global ids
    np.testing.assert_allclose(
        np.asarray(merged.refine_vectors[450]), x[450].astype(np.float16)
    )
