"""k-means / PQ / OPQ op tests on the virtual CPU mesh."""

import numpy as np
import jax.numpy as jnp

from clip_retrieval_tpu.ops import kmeans as km
from clip_retrieval_tpu.ops import pq as pq_ops


def _blobs(n_per=200, k=8, d=16, seed=0, spread=0.05):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(k, d)).astype(np.float32) * 2
    x = np.concatenate(
        [c + spread * rng.normal(size=(n_per, d)).astype(np.float32) for c in centers]
    )
    return x, centers


def test_kmeans_recovers_blobs():
    x, centers = _blobs()
    got = np.asarray(km.kmeans(x, 8, niter=15, seed=1))
    # every true center must be ~matched by some learned centroid
    d2 = ((centers[:, None, :] - got[None, :, :]) ** 2).sum(-1)
    assert d2.min(axis=1).max() < 0.05


def test_kmeans_more_clusters_than_points():
    x = np.random.default_rng(0).normal(size=(5, 8)).astype(np.float32)
    c = np.asarray(km.kmeans(x, 16, niter=3))
    assert c.shape == (16, 8)
    assert np.isfinite(c).all()


def test_assign_chunked_matches_full():
    x, _ = _blobs(n_per=50)
    c = km.kmeans(x, 8, niter=5)
    a1 = km.assign_chunked(x, c, chunk=64)
    a2 = km.assign_chunked(x, c, chunk=10_000)
    np.testing.assert_array_equal(a1, a2)


def test_pq_roundtrip_better_than_random():
    x, _ = _blobs(n_per=100, k=16, d=32)
    pq = pq_ops.train_pq(x, m=8, niter=10)
    codes = pq_ops.pq_encode(x, pq)
    assert codes.shape == (x.shape[0], 8) and codes.dtype == np.uint8
    xhat = np.asarray(pq_ops.pq_reconstruct(codes, pq))
    err = np.mean((x - xhat) ** 2)
    base = np.mean((x - x.mean(0)) ** 2)
    assert err < 0.3 * base  # clustered data compresses well


def test_adc_score_matches_decoded_dot():
    x, _ = _blobs(n_per=50, k=8, d=16)
    pq = pq_ops.train_pq(x, m=4, niter=8)
    codes = pq_ops.pq_encode(x, pq)
    q = np.random.default_rng(3).normal(size=(5, 16)).astype(np.float32)
    lut = pq_ops.adc_lut(jnp.asarray(q), pq.codebooks)
    scores = np.asarray(pq_ops.adc_score(lut, jnp.asarray(codes)))
    xhat = np.asarray(pq_ops.pq_decode(jnp.asarray(codes), pq.codebooks))
    np.testing.assert_allclose(scores, q @ xhat.T, rtol=1e-4, atol=1e-4)


def test_opq_orthogonal_and_not_worse():
    rng = np.random.default_rng(0)
    # correlated dims: PQ subspace split is bad without rotation
    base = rng.normal(size=(2000, 4)).astype(np.float32)
    mix = rng.normal(size=(4, 16)).astype(np.float32)
    x = base @ mix + 0.01 * rng.normal(size=(2000, 16)).astype(np.float32)
    opq = pq_ops.train_opq(x, m=8, opq_iters=4, pq_niter=6)
    R = np.asarray(opq.rotation)
    np.testing.assert_allclose(R @ R.T, np.eye(16), atol=1e-4)
    codes = pq_ops.pq_encode(x, opq)
    xhat = np.asarray(pq_ops.pq_reconstruct(codes, opq))
    err_opq = np.mean((x - xhat) ** 2)

    pq = pq_ops.train_pq(x, m=8, niter=6)
    codes_pq = pq_ops.pq_encode(x, pq)
    err_pq = np.mean((x - np.asarray(pq_ops.pq_reconstruct(codes_pq, pq))) ** 2)
    assert err_opq <= err_pq * 1.1
