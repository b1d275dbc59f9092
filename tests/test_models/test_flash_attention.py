"""Pallas fused attention vs reference attention (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from clip_retrieval_tpu.ops.attention import sdpa_reference
from clip_retrieval_tpu.ops.flash import flash_attention


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
