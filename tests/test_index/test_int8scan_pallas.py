"""Fused gather-scan kernel (ops/int8scan.py) — interpret-mode checks.

On CPU the kernel runs interpreted (slow), so shapes stay tiny.  The
reference semantics is the XLA gather path inside
index/ivf_int8.py::_scan_selected_device.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from clip_retrieval_tpu.ops.int8mm import quantize_rows_device
from clip_retrieval_tpu.ops.int8scan import int8_gather_scan


def _mk(nchunks=12, lc=8, d=32, b=4, seed=0):
    rng = np.random.default_rng(seed)
    rows = rng.integers(-127, 127, (nchunks, lc, d)).astype(np.int8)
    scales = rng.uniform(0.5, 1.5, (nchunks, lc)).astype(np.float32)
    pos = rng.integers(0, 10_000, (nchunks, lc)).astype(np.int32)
    # sprinkle padding rows (scale 0, pos −1) like the real chunk image
    mask = rng.uniform(size=(nchunks, lc)) < 0.2
    scales[mask] = 0.0
    pos[mask] = -1
    q = rng.normal(size=(b, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return rows, scales, pos, q


def _xla_reference(qq, q_scale, rows, scales, pos, sel):
    sub_rows = np.asarray(rows)[sel]
    sub_scales = np.asarray(scales)[sel]
    sub_pos = np.asarray(pos)[sel]
    u, lc, d = sub_rows.shape
    acc = np.asarray(qq, np.int32) @ sub_rows.reshape(u * lc, d).T.astype(
        np.int32
    )
    scores = (
        acc.astype(np.float32)
        * np.asarray(q_scale)[:, None]
        * sub_scales.reshape(1, u * lc)
    )
    return np.where(sub_pos.reshape(1, u * lc) >= 0, scores, -np.inf)


@pytest.mark.parametrize("u", [1, 5, 12])
def test_matches_xla_gather_path(u):
    rows, scales, pos, q = _mk()
    sel = np.random.default_rng(u).choice(
        rows.shape[0], size=u, replace=True
    ).astype(np.int32)
    qq, q_scale = jax.block_until_ready(quantize_rows_device(jnp.asarray(q)))
    got = np.asarray(
        int8_gather_scan(
            qq, q_scale, jnp.asarray(rows), jnp.asarray(scales),
            jnp.asarray(pos), jnp.asarray(sel), interpret=True,
        )
    )
    want = _xla_reference(qq, q_scale, rows, scales, pos, sel)
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # padding rows are exactly -inf in both
    np.testing.assert_array_equal(np.isinf(got), np.isinf(want))


def test_segmented_selection_matches(monkeypatch):
    """Selections past MAX_CHUNKS_PER_CALL split into segments whose
    concatenation must be seamless."""
    import clip_retrieval_tpu.ops.int8scan as mod

    monkeypatch.setattr(mod, "MAX_CHUNKS_PER_CALL", 4)
    rows, scales, pos, q = _mk(nchunks=16)
    sel = np.arange(10, dtype=np.int32)[::-1].copy()
    qq, q_scale = jax.block_until_ready(quantize_rows_device(jnp.asarray(q)))
    got = np.asarray(
        mod.int8_gather_scan(
            qq, q_scale, jnp.asarray(rows), jnp.asarray(scales),
            jnp.asarray(pos), jnp.asarray(sel), interpret=True,
        )
    )
    want = _xla_reference(qq, q_scale, rows, scales, pos, sel)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_search_impl_pallas_matches_xla_end_to_end():
    """The full _scan_selected_device with impl='pallas' (interpret via
    monkey-free env: call the jitted fn directly) returns the same top-k
    as impl='xla' on a real index."""
    from clip_retrieval_tpu.index.ivf_int8 import (
        IVFInt8Index, _scan_selected_device,
    )

    rng = np.random.default_rng(3)
    x = rng.normal(size=(4000, 32)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    ix = IVFInt8Index.from_vectors(x, nlist=16, nprobe=4, union="exact")
    q = x[:6] + 0.01 * rng.normal(size=(6, 32)).astype(np.float32)
    ix._ensure_device()
    dv = ix._device
    h = ix._search_int8_dispatch(q, 5)
    sel = ix._union_chunk_sel(np.asarray(h["per_q"]))
    args = (h["q"], dv["rows"], dv["scales"], dv["ids"],
            jnp.asarray(sel), h["k_dev"], True)
    v_x, i_x = _scan_selected_device(*args, impl="xla")
    # interpret-mode pallas inside the jitted wrapper: call the kernel
    # module directly at the same boundary instead (jit of interpret-mode
    # pallas is fine on CPU)
    from clip_retrieval_tpu.ops.int8mm import quantize_rows_device as qr

    qq, q_scale = qr(h["q"])
    scores = int8_gather_scan(
        qq, q_scale, dv["rows"], dv["scales"], dv["ids"],
        jnp.asarray(sel), interpret=True,
    )
    sub_pos = np.asarray(dv["ids"])[sel].reshape(1, -1)
    k = int(v_x.shape[1])
    vals = np.sort(np.asarray(scores), axis=1)[:, ::-1][:, :k]
    np.testing.assert_allclose(np.asarray(v_x), vals, rtol=1e-5)
