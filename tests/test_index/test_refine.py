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
