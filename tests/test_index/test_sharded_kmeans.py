"""Sharded k-means: mesh execution numerically equals single-device."""

import numpy as np

import jax
from jax.sharding import Mesh

from clip_retrieval_tpu.ops.kmeans import kmeans


def test_sharded_kmeans_matches_single_device():
    rng = np.random.default_rng(0)
    centers = rng.normal(size=(8, 16)).astype(np.float32) * 2
    x = np.concatenate(
        [c + 0.05 * rng.normal(size=(300, 16)).astype(np.float32) for c in centers]
    )
    single = np.asarray(kmeans(x, 8, niter=10, seed=1))
    mesh = Mesh(np.array(jax.devices()[:8]), ("dp",))
    sharded = np.asarray(kmeans(x, 8, niter=10, seed=1, mesh=mesh))
    np.testing.assert_allclose(single, sharded, rtol=1e-4, atol=1e-5)
    # clusters recovered
    d2 = ((centers[:, None, :] - sharded[None, :, :]) ** 2).sum(-1)
    assert d2.min(axis=1).max() < 0.05
