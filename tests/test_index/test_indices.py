"""Flat + IVF-PQ index tests: exactness, recall, persistence, combining."""

import numpy as np
import pytest

from clip_retrieval_tpu.index import FlatIndex, IVFPQIndex, load_index
from clip_retrieval_tpu.index import combiner as comb
from clip_retrieval_tpu.index.autotune import (
    parse_index_key,
    parse_memory_string,
    select_params,
)
from clip_retrieval_tpu.index.build import (
    EmbeddingShards,
    build_index_from_shards,
)


def _unit(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def _clustered_unit(n=3000, d=32, k=24, seed=0):
    rng = np.random.default_rng(seed)
    centers = _unit(rng.normal(size=(k, d)))
    x = centers[rng.integers(0, k, n)] + 0.15 * rng.normal(size=(n, d))
    return _unit(x).astype(np.float32)


# ---------------------------------------------------------------- flat ----


def test_flat_exact_matches_numpy():
    x = _clustered_unit(500)
    q = _clustered_unit(7, seed=9)
    index = FlatIndex(x.shape[1])
    index.add(x.astype(np.float16))
    vals, ids = index.search(q, 10)
    ref = q @ x.astype(np.float16).astype(np.float32).T
    ref_ids = np.argsort(-ref, axis=1)[:, :10]
    # same sets (ties can reorder)
    for i in range(q.shape[0]):
        assert set(ids[i]) == set(ref_ids[i])


def test_flat_chunked_merge(monkeypatch):
    import clip_retrieval_tpu.index.flat as flat_mod

    x = _clustered_unit(700)
    q = _clustered_unit(3, seed=5)
    whole = FlatIndex(x.shape[1])
    whole.add(x)
    v1, i1 = whole.search(q, 12)
    monkeypatch.setattr(flat_mod, "_stream_rows", lambda d: 256)
    chunked = FlatIndex(x.shape[1])
    chunked.add(x)
    v2, i2 = chunked.search(q, 12)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(v1, v2, atol=1e-5)


def test_flat_chunked_large_k(monkeypatch):
    """k larger than the streaming block: a block must keep ≥ k candidates
    or true neighbors concentrated in one block are silently dropped (and
    the first top-k merge would see a width < k)."""
    import clip_retrieval_tpu.index.flat as flat_mod

    x = _clustered_unit(700)
    q = _clustered_unit(3, seed=5)
    whole = FlatIndex(x.shape[1])
    whole.add(x)
    v1, i1 = whole.search(q, 400)
    monkeypatch.setattr(flat_mod, "_stream_rows", lambda d: 256)
    chunked = FlatIndex(x.shape[1])
    chunked.add(x)
    v2, i2 = chunked.search(q, 400)
    for row1, row2 in zip(i1, i2):
        assert set(row1) == set(row2)
    np.testing.assert_allclose(np.sort(v1), np.sort(v2), atol=1e-5)


def test_flat_k_exceeds_n():
    x = _clustered_unit(5)
    index = FlatIndex(x.shape[1])
    index.add(x)
    vals, ids = index.search(x[:2], 10)
    assert ids.shape == (2, 10)
    assert (ids[:, 5:] == -1).all()


def test_flat_range_search_and_reconstruct(tmp_path):
    x = _clustered_unit(200)
    index = FlatIndex(x.shape[1])
    index.add(x)
    lims, d, i = index.range_search(x[:3], 0.9)
    assert lims.shape == (4,)
    for row in range(3):
        sel = i[lims[row] : lims[row + 1]]
        assert row in sel  # self-similarity 1.0 ≥ 0.9
        assert (d[lims[row] : lims[row + 1]] >= 0.9).all()
    vals, ids, recon = index.search_and_reconstruct(x[:2], 5)
    assert recon.shape == (2, 5, x.shape[1])
    np.testing.assert_allclose(
        recon[0, 0], x[ids[0, 0]].astype(np.float16), atol=1e-3
    )
    index.save(str(tmp_path / "flat.index"))
    loaded = load_index(str(tmp_path / "flat.index"))
    v2, i2 = loaded.search(x[:2], 5)
    np.testing.assert_array_equal(ids[:, :5], i2)


# -------------------------------------------------------------- ivfpq ----


@pytest.fixture(scope="module")
def corpus():
    return _clustered_unit(4000, d=32)


@pytest.fixture(scope="module")
def ivf_index(corpus, tmp_path_factory):
    folder = tmp_path_factory.mktemp("emb")
    np.save(folder / "emb_0.npy", corpus[:2500].astype(np.float16))
    np.save(folder / "emb_1.npy", corpus[2500:].astype(np.float16))
    shards = EmbeddingShards(str(folder))
    # PQ16 (dsub=2): recall@10 ≈ 0.86 on this corpus; PQ8 saturates ~0.69
    # from quantization distortion alone (same as faiss would)
    params = parse_index_key("OPQ16,IVF64,PQ16", 32)
    index = build_index_from_shards(shards, params, nprobe=16)
    return index


def test_ivfpq_recall(corpus, ivf_index):
    q = _clustered_unit(50, d=32, seed=42)
    exact = FlatIndex(32)
    exact.add(corpus)
    _, gt = exact.search(q, 10)
    ivf_index.nprobe = 32
    _, got = ivf_index.search(q, 10)
    recall = np.mean(
        [len(set(gt[i]) & set(got[i])) / 10 for i in range(q.shape[0])]
    )
    assert recall >= 0.8, recall


def test_ivfpq_host_matches_device(corpus, ivf_index):
    q = _clustered_unit(5, d=32, seed=1)
    ivf_index.nprobe = 8
    v_dev, i_dev = ivf_index.search(q, 10)
    v_host, i_host = ivf_index._search_host(q, 10, 8)
    # same candidates scanned → same results (modulo fp association order)
    assert np.mean([len(set(i_dev[r]) & set(i_host[r])) for r in range(5)]) > 9.0
    np.testing.assert_allclose(v_dev, v_host, atol=1e-3)


def test_ivfpq_save_load_reconstruct(tmp_path, corpus, ivf_index):
    path = str(tmp_path / "ivf.index")
    ivf_index.save(path)
    loaded = load_index(path)
    q = _clustered_unit(3, d=32, seed=2)
    v1, i1 = ivf_index.search(q, 5)
    v2, i2 = loaded.search(q, 5)
    np.testing.assert_array_equal(i1, i2)
    vals, ids, recon = loaded.search_and_reconstruct(q, 5)
    # reconstruction approximates the true stored vector
    cos = np.sum(recon[0, 0] * corpus[ids[0, 0]]) / (
        np.linalg.norm(recon[0, 0]) * np.linalg.norm(corpus[ids[0, 0]])
    )
    assert cos > 0.8


def test_combiner(corpus):
    # two shard indices sharing the trained prefix
    from clip_retrieval_tpu.ops import kmeans as km, pq as pq_ops

    d = 32
    coarse = np.asarray(km.kmeans(corpus, 16, niter=10))
    pq = pq_ops.train_pq(corpus, m=8, niter=8)

    def encode_shard(x, id_offset):
        a = km.assign_chunked(x, np.asarray(coarse))
        resid = x - coarse[a]
        codes = pq_ops.pq_encode(resid, pq)
        order = np.argsort(a, kind="stable")
        counts = np.bincount(a, minlength=16)
        offsets = np.zeros(17, np.int64)
        np.cumsum(counts, out=offsets[1:])
        return IVFPQIndex(
            d,
            coarse,
            np.asarray(pq.codebooks),
            None,
            offsets,
            (order + id_offset).astype(np.int64),
            codes[order],
            nprobe=16,
        )

    ix1 = encode_shard(corpus[:2000], 0)
    ix2 = encode_shard(corpus[2000:], 2000)
    merged = comb.combine_ivfpq([ix1, ix2])
    assert merged.ntotal == corpus.shape[0]
    whole = encode_shard(corpus, 0)
    q = _clustered_unit(10, d=32, seed=3)
    _, im = merged.search(q, 10)
    _, iw = whole.search(q, 10)
    assert np.mean([len(set(im[r]) & set(iw[r])) for r in range(10)]) > 9.5


# ------------------------------------------------------------ autotune ----


def test_autotune():
    assert parse_memory_string("4G") == 4 << 30
    assert parse_memory_string("500MB") == 500 << 20
    p = parse_index_key("OPQ64,IVF4096,PQ64x8", 512)
    assert (p.nlist, p.m, p.use_opq) == (4096, 64, True)
    small = select_params(10_000, 512, "4G")
    assert small.kind == "flat"
    big = select_params(50_000_000, 512, "4G")
    assert big.kind == "ivfpq"
    assert 512 % big.m == 0
    # total size under budget
    assert 50_000_000 * (big.m + 8) + big.nlist * 512 * 4 < (5 << 30)


def test_flat_explicit_ids_reconstruct_with_padding():
    """search_and_reconstruct past ntotal on an explicit-ids index: -1 rows
    zero-fill instead of KeyError-ing on a nonexistent id 0."""
    x = _unit(np.random.default_rng(0).normal(size=(2, 8)))
    ix = FlatIndex(8, vectors=x, ids=np.array([100, 200]))
    vals, ids, recon = ix.search_and_reconstruct(x[:1], 5)
    assert ids.shape == (1, 5) and set(ids[0][:2]) == {100, 200}
    assert (ids[0][2:] == -1).all()
    assert (recon[0][2:] == 0).all()
    import pytest

    with pytest.raises(ValueError, match="explicit-ids"):
        ix.add(x)


def test_flat_range_search_chunked(monkeypatch):
    """range_search equals the one-shot result when the corpus spans
    multiple scan chunks."""
    import clip_retrieval_tpu.index.flat as flat_mod

    rng = np.random.default_rng(1)
    x = _unit(rng.normal(size=(300, 16)))
    ix = FlatIndex(16)
    ix.add(x)
    lims0, d0, i0 = ix.range_search(x[:4], 0.5)
    monkeypatch.setattr(flat_mod, "_DEVICE_CHUNK", 64)  # force chunking
    ix2 = FlatIndex(16)
    ix2.add(x)
    lims1, d1, i1 = ix2.range_search(x[:4], 0.5)
    np.testing.assert_array_equal(lims0, lims1)
    # per-query result SETS match (order within a query may differ)
    for q in range(4):
        s0 = set(i0[lims0[q]:lims0[q + 1]])
        s1 = set(i1[lims1[q]:lims1[q + 1]])
        assert s0 == s1
