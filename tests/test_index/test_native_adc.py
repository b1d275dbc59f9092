"""Native C++ ADC scanner: correctness vs numpy and vs the device path."""

import numpy as np
import pytest

from clip_retrieval_tpu.native import get_adc_lib


@pytest.fixture(scope="module")
def lib():
    lib = get_adc_lib()
    if lib is None:
        pytest.skip("no C++ toolchain available")
    return lib


def test_adc_scan_block_matches_numpy(lib):
    rng = np.random.default_rng(0)
    n, m = 1000, 16
    codes = rng.integers(0, 256, (n, m)).astype(np.uint8)
    lut = rng.normal(size=(m, 256)).astype(np.float32)
    out = np.empty((n,), np.float32)
    lib.adc_scan_block(codes, n, m, np.ascontiguousarray(lut), 0.5, out)
    ref = lut[np.arange(m)[None, :], codes.astype(np.int64)].sum(1) + 0.5
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_adc_scan_lists_matches_numpy(lib):
    rng = np.random.default_rng(1)
    nlist, m = 8, 8
    sizes = rng.integers(0, 50, nlist)
    offsets = np.zeros(nlist + 1, np.int64)
    np.cumsum(sizes, out=offsets[1:])
    total = int(offsets[-1])
    codes = rng.integers(0, 256, (total, m)).astype(np.uint8)
    ids = rng.permutation(total).astype(np.int64)
    lut = np.ascontiguousarray(rng.normal(size=(m, 256)).astype(np.float32))
    probes = np.array([3, 0, 7], np.int32)
    coarse = np.array([0.1, -0.2, 0.3], np.float32)
    cap = int(sizes[probes].sum())
    out_s = np.empty((cap,), np.float32)
    out_i = np.empty((cap,), np.int64)
    n = lib.adc_scan_lists(
        codes, ids, offsets, probes, len(probes), lut, m, coarse, out_s, out_i
    )
    assert n == cap
    cursor = 0
    for p, c in zip(probes, coarse):
        s, e = offsets[p], offsets[p + 1]
        ref = lut[np.arange(m)[None, :], codes[s:e].astype(np.int64)].sum(1) + c
        np.testing.assert_allclose(out_s[cursor : cursor + e - s], ref, rtol=1e-5)
        np.testing.assert_array_equal(out_i[cursor : cursor + e - s], ids[s:e])
        cursor += e - s


def test_host_search_native_equals_fallback(monkeypatch):
    """IVFPQ host search must give identical results with and without the
    native scanner."""
    from clip_retrieval_tpu.index.build import (
        EmbeddingShards,
        build_index_from_shards,
    )
    from clip_retrieval_tpu.index.autotune import parse_index_key
    import clip_retrieval_tpu.index.ivfpq as ivf_mod
    import tempfile, os

    rng = np.random.default_rng(2)
    x = rng.normal(size=(2000, 32)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    folder = tempfile.mkdtemp()
    np.save(os.path.join(folder, "e.npy"), x.astype(np.float16))
    index = build_index_from_shards(
        EmbeddingShards(folder), parse_index_key("IVF32,PQ8", 32), nprobe=8
    )
    q = x[:6]
    v1, i1 = index._search_host(q, 10, 8)
    import clip_retrieval_tpu.native as native_mod

    monkeypatch.setattr(native_mod, "_LIB", {"adc": None})
    v2, i2 = index._search_host(q, 10, 8)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(v1, v2, rtol=1e-5, atol=1e-5)
