"""Bounded-chunk host↔device transfer helpers (utils/transfer.py).

The helpers exist because multi-GB single transfers collapse on fragile
links (benchmarks/NOTES.md); these tests force a tiny chunk size so small
arrays exercise the multi-chunk paths, and assert bit-exact round trips.
"""

import numpy as np
import pytest

from clip_retrieval_tpu.utils import transfer


@pytest.fixture
def tiny_chunks(monkeypatch):
    # 1 MB chunks: a (4096, 128) fp32 array (2 MB) splits into 2+ chunks
    monkeypatch.setenv("CRT_H2D_CHUNK_MB", "1")


def test_device_put_chunked_roundtrip(tiny_chunks, rng):
    x = rng.standard_normal((4096, 128)).astype(np.float32)
    assert x.nbytes > transfer.chunk_bytes()  # really multi-chunk
    y = transfer.device_put_chunked(x)
    np.testing.assert_array_equal(np.asarray(y), x)
    assert y.dtype == x.dtype


def test_device_put_chunked_ragged_tail(tiny_chunks, rng):
    # rows not a multiple of the chunk row count → distinct tail shape
    x = (rng.standard_normal((2048 + 777, 128)) * 100).astype(np.int32)
    y = transfer.device_put_chunked(x)
    np.testing.assert_array_equal(np.asarray(y), x)


def test_device_put_chunked_small_passthrough(rng):
    x = rng.standard_normal((8, 4)).astype(np.float16)
    np.testing.assert_array_equal(
        np.asarray(transfer.device_put_chunked(x)), x
    )


def test_device_put_chunked_sharded(tiny_chunks, rng):
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()[:4]), ("dp",))
    sh = NamedSharding(mesh, P("dp"))
    x = rng.standard_normal((4096, 128)).astype(np.float32)
    y = transfer.device_put_chunked(x, sharding=sh)
    assert y.sharding == sh
    np.testing.assert_array_equal(np.asarray(y), x)


def test_to_host_chunked_roundtrip(tiny_chunks, rng):
    import jax.numpy as jnp

    x = rng.standard_normal((4096, 128)).astype(np.float32)
    y = jnp.asarray(x)
    back = transfer.to_host_chunked(y)
    np.testing.assert_array_equal(back, x)
