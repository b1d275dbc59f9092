"""Pallas fused attention vs reference attention (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from clip_retrieval_tpu.ops import attention as attn_ops
from clip_retrieval_tpu.ops.attention import sdpa_reference
from clip_retrieval_tpu.ops.flash import (
    flash_attention,
    flash_attention_packed,
    packed_group,
)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("shape", [(2, 4, 50, 64), (1, 2, 257, 64)])
def test_flash_matches_reference(shape, causal):
    rng = np.random.default_rng(0)
    q, k, v = (
        jnp.asarray(rng.normal(size=shape).astype(np.float32)) for _ in range(3)
    )
    ref = np.asarray(sdpa_reference(q, k, v, causal=causal))
    got = np.asarray(flash_attention(q, k, v, causal=causal))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


# zoo head geometries: (heads, dh) — B/32|B/16 (12, 64), L/14 (16, 64),
# text towers (8, 64), H/14 image tower (16, 80: ragged lane slices),
# L/14@336 (16, 64, S=577)
@pytest.mark.parametrize("variant", ["slice", "batched"])
@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize(
    "heads,dh,seq",
    [(12, 64, 50), (16, 64, 257), (8, 64, 77), (16, 80, 257), (16, 64, 577)],
)
def test_packed_matches_reference(heads, dh, seq, causal, variant):
    rng = np.random.default_rng(1)
    b, w = 2, heads * dh
    q, k, v = (
        jnp.asarray(rng.normal(size=(b, seq, w)).astype(np.float32))
        for _ in range(3)
    )
    split = lambda x: x.reshape(b, seq, heads, dh).transpose(0, 2, 1, 3)
    ref = np.asarray(sdpa_reference(split(q), split(k), split(v), causal=causal))
    ref = ref.transpose(0, 2, 1, 3).reshape(b, seq, w)
    got = np.asarray(
        flash_attention_packed(q, k, v, heads, causal=causal, variant=variant)
    )
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_packed_group_geometries():
    # group·dh must be a multiple of 128 (Mosaic lane blocking) and divide heads
    assert packed_group(16, 64) == 8  # L/14
    assert packed_group(12, 64) == 6  # B/32, B/16
    assert packed_group(8, 64) == 8  # 512-wide text towers
    assert packed_group(16, 80) == 8  # H/14: ragged dh, 8*80 = 5*128
    # no full-width escape hatch past _MAX_GROUP: unprovable geometries
    # must return None (the dispatcher then uses the XLA fallback)
    assert packed_group(9, 64) is None


def test_non_dividing_group_raises():
    # grid truncation would silently return garbage for the uncovered
    # heads/rows — explicit group values must divide exactly
    rng = np.random.default_rng(3)
    q, k, v = (
        jnp.asarray(rng.normal(size=(1, 8, 6 * 64)).astype(np.float32))
        for _ in range(3)
    )
    with pytest.raises(ValueError, match="does not divide"):
        flash_attention_packed(q, k, v, heads=6, group=4)
    q4, k4, v4 = (x.reshape(1, 6, 8, 64).transpose(0, 2, 1, 3)[:, :5]
                  for x in (q, k, v))
    with pytest.raises(ValueError, match="does not divide"):
        flash_attention(q4, k4, v4, group=2)


def test_sdpa_packed_fallback_unaligned_heads():
    # heads=4, dh=80: no grouping reaches a 128-multiple lane block
    # (4·80=320), so the packed kernel is ineligible -> reshape fallback
    rng = np.random.default_rng(2)
    b, seq, heads, dh = 2, 10, 4, 80
    w = heads * dh
    q, k, v = (
        jnp.asarray(rng.normal(size=(b, seq, w)).astype(np.float32))
        for _ in range(3)
    )
    assert not attn_ops.packed_ok(heads, w)
    split = lambda x: x.reshape(b, seq, heads, dh).transpose(0, 2, 1, 3)
    ref = np.asarray(sdpa_reference(split(q), split(k), split(v)))
    ref = ref.transpose(0, 2, 1, 3).reshape(b, seq, w)
    got = np.asarray(attn_ops.sdpa_packed(q, k, v, heads))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)
