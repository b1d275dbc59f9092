"""Sharded int8 brute-force index: recall vs fp32 exact, mesh correctness,
persistence — on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

from clip_retrieval_tpu.index.flat import FlatIndex
from clip_retrieval_tpu.index.sharded_flat import ShardedFlatIndex
from clip_retrieval_tpu.index.store import load_index
from clip_retrieval_tpu.index.autotune import select_params, parse_index_key


def _unit(x):
    return (x / np.linalg.norm(x, axis=-1, keepdims=True)).astype(np.float32)


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(0)
    centers = _unit(rng.normal(size=(32, 64)))
    x = centers[rng.integers(0, 32, 5000)] + 0.15 * rng.normal(size=(5000, 64))
    return _unit(x)


def test_int8_recall_vs_exact(corpus):
    q = corpus[:50]
    exact = FlatIndex(64)
    exact.add(corpus)
    _, gt = exact.search(q, 10)
    ix = ShardedFlatIndex.from_vectors(corpus)
    vals, got = ix.search(q, 10)
    recall = np.mean(
        [len(set(gt[i]) & set(got[i])) / 10 for i in range(50)]
    )
    assert recall >= 0.99, recall
    # self-retrieval exact
    assert (got[:, 0] == np.arange(50)).all()
    # scores ≈ true inner products
    true = (q * corpus[got[:, 0]]).sum(1)
    np.testing.assert_allclose(vals[:, 0], true, atol=0.02)


def test_sharding_uses_all_devices(corpus):
    import jax

    ix = ShardedFlatIndex.from_vectors(corpus)
    ix.search(corpus[:2], 5)
    db = ix._device["db"]
    assert len(db.sharding.device_set) == len(jax.devices())


def test_n_not_divisible_by_devices(corpus):
    # 5003 rows over 8 devices → padding rows must never be returned
    x = np.concatenate([corpus, corpus[:3] * 0.99])
    ix = ShardedFlatIndex.from_vectors(_unit(x))
    vals, ids = ix.search(corpus[:4], 20)
    assert ids.max() < len(x)
    assert (ids >= 0).all()


def test_k_exceeds_n():
    x = _unit(np.random.default_rng(1).normal(size=(5, 16)).astype(np.float32))
    ix = ShardedFlatIndex.from_vectors(x)
    vals, ids = ix.search(x[:2], 12)
    assert ids.shape == (2, 12)
    assert (ids[:, 5:] == -1).all()


def test_save_load_reconstruct(tmp_path, corpus):
    ix = ShardedFlatIndex.from_vectors(corpus)
    path = str(tmp_path / "int8.index")
    ix.save(path)
    loaded = load_index(path)
    assert isinstance(loaded, ShardedFlatIndex)
    v1, i1 = ix.search(corpus[:3], 5)
    v2, i2 = loaded.search(corpus[:3], 5)
    np.testing.assert_array_equal(i1, i2)
    _, ids, recon = loaded.search_and_reconstruct(corpus[:2], 4)
    cos = (recon[0, 0] / np.linalg.norm(recon[0, 0])) @ corpus[ids[0, 0]]
    assert cos > 0.999


def test_autotune_prefers_int8_tier():
    p = select_params(5_000_000, 512, "4G")
    assert p.kind == "flat_int8"
    assert p.index_key == "Flat8"
    assert parse_index_key("Flat8", 512).kind == "flat_int8"
    # int8 fits the budget but the corpus is too large for brute force:
    # IVF-int8 (probed-lists scan) with the exact re-rank tier
    p8 = select_params(10_000_000, 512, "8G")
    assert p8.kind == "ivf_int8" and p8.use_refine
    assert p8.index_key == f"IVF{p8.nlist},Flat8,RFlat"
    # too big for the budget → ivfpq
    p2 = select_params(50_000_000, 512, "4G")
    assert p2.kind == "ivfpq"
