"""Pallas one-hot MXU ADC kernel (ops/adc_scan.py) — interpret-mode checks.

On CPU the kernel runs interpreted (slow), so shapes stay tiny.  The
kernel consumes the LUT in bfloat16, so scores carry ~0.4% relative error
vs the exact-f32 XLA scan — comparisons are tolerance-based, like the
flash-attention tests.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clip_retrieval_tpu.index.ivfpq import IVFPQIndex, _ALIGN, _search_pallas
from clip_retrieval_tpu.ops.adc_scan import adc_scan


def _unit(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def test_adc_scan_kernel_scores(rng):
    m, c, b = 8, _ALIGN, 4
    codes = rng.integers(0, 256, (2 * c, m)).astype(np.uint8)
    lut = rng.normal(size=(b, m, 256)).astype(np.float32)
    lut_t = np.ascontiguousarray(
        lut.transpose(2, 1, 0).reshape(256 * m, b)
    )
    blocks = np.array([0, 1], np.int32)
    nvalid = np.array([c, c - 5], np.int32)
    owner = np.array([1, 3], np.int32)
    coarse = np.array([0.25, -1.0], np.float32)
    out = np.asarray(
        adc_scan(
            jnp.asarray(codes), jnp.asarray(lut_t),
            jnp.asarray(blocks), jnp.asarray(nvalid),
            jnp.asarray(owner), jnp.asarray(coarse),
            chunk=c, interpret=True,
        )
    )
    assert out.shape == (2, c)
    for chunk_i in range(2):
        rows = codes[chunk_i * c : (chunk_i + 1) * c]
        ref = (
            lut[owner[chunk_i], np.arange(m)[None, :], rows.astype(np.int64)]
            .sum(1)
            + coarse[chunk_i]
        )
        nv = nvalid[chunk_i]
        np.testing.assert_allclose(
            out[chunk_i, :nv], ref[:nv], rtol=2e-2, atol=2e-2
        )
        assert np.isneginf(out[chunk_i, nv:]).all()


@pytest.fixture(scope="module")
def small_skewed():
    rng = np.random.default_rng(3)
    nlist, d, m = 16, 32, 8
    sizes = np.zeros(nlist, np.int64)
    sizes[0] = 400  # > 3 chunks
    sizes[3] = 130
    sizes[7] = 90
    sizes[9] = 1
    total = int(sizes.sum())
    offsets = np.zeros(nlist + 1, np.int64)
    np.cumsum(sizes, out=offsets[1:])
    return IVFPQIndex(
        d=d,
        coarse_centroids=_unit(rng.normal(size=(nlist, d))).astype(np.float32),
        codebooks=(0.05 * rng.normal(size=(m, 256, d // m))).astype(np.float32),
        rotation=None,
        list_offsets=offsets,
        list_ids=rng.permutation(total).astype(np.int64) + 10,
        list_codes=rng.integers(0, 256, (total, m)).astype(np.uint8),
        nprobe=6,
    )


def test_pallas_search_matches_host(small_skewed, monkeypatch):
    monkeypatch.setenv("CRT_IVFPQ_SCORER", "pallas")
    ix = small_skewed
    rng = np.random.default_rng(11)
    q = _unit(rng.normal(size=(3, ix.d))).astype(np.float32)
    k = 15
    v_dev, i_dev = ix._search_device(q, k, nprobe=6)
    v_host, i_host = ix._search_host(q, k, nprobe=6)
    for row in range(q.shape[0]):
        got, want = set(i_dev[row]) - {-1}, set(i_host[row]) - {-1}
        if not want:  # probes hit only empty lists — paths must agree
            assert not got
            continue
        overlap = len(got & want) / len(want)
        assert overlap >= 0.85, (row, got, want)
    valid = i_host >= 0
    np.testing.assert_allclose(
        v_dev[valid], v_host[valid], rtol=3e-2, atol=3e-2
    )


def test_pallas_search_k_exceeds_and_empty(small_skewed, monkeypatch):
    monkeypatch.setenv("CRT_IVFPQ_SCORER", "pallas")
    ix = small_skewed
    # query aimed at the single-element list: k > candidates pads with -1
    q = ix.coarse_centroids[9][None, :]
    vals, ids = ix._search_device(q, 8, nprobe=1)
    assert (ids[0] >= 0).sum() == 1
    assert (ids[0, 1:] == -1).all()
    # empty-list-only probe
    q2 = ix.coarse_centroids[12][None, :]
    vals2, ids2 = ix._search_device(q2, 4, nprobe=1)
    assert (ids2 == -1).all()
