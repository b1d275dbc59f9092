"""mCLIP encoder parity vs torch transformers XLMRobertaModel (tiny random
weights) with sentence-transformers-style mean pooling + projection."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from clip_retrieval_tpu.models import mclip


@pytest.fixture(scope="module")
def hf_pair():
    cfg = transformers.XLMRobertaConfig(
        vocab_size=120,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=40,
        pad_token_id=1,
    )
    torch.manual_seed(0)
    model = transformers.XLMRobertaModel(cfg, add_pooling_layer=False).eval()
    rng = np.random.default_rng(0)
    proj_w = rng.normal(size=(32, 16)).astype(np.float32) * 0.1
    proj_b = rng.normal(size=(16,)).astype(np.float32) * 0.01
    return model, cfg, proj_w, proj_b


def _batch(cfg, seed=0):
    rng = np.random.default_rng(seed)
    b, s = 3, 11
    ids = np.full((b, s), cfg.pad_token_id, np.int64)
    mask = np.zeros((b, s), np.int64)
    for i in range(b):
        n = int(rng.integers(4, s))
        ids[i, :n] = rng.integers(3, cfg.vocab_size, n)
        mask[i, :n] = 1
    return ids, mask


def test_mclip_parity(hf_pair):
    model, hf_cfg, proj_w, proj_b = hf_pair
    cfg = mclip.config_from_hf(hf_cfg, out_dim=16)
    assert cfg.position_offset == 2
    params = mclip.convert_hf_roberta(
        model.state_dict(), cfg, proj_w, proj_b
    )
    ids, mask = _batch(hf_cfg)
    with torch.no_grad():
        hidden = model(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
        ).last_hidden_state.numpy()
    m = mask[:, :, None].astype(np.float32)
    pooled = (hidden * m).sum(1) / m.sum(1)
    ref = pooled @ proj_w + proj_b
    ref = ref / np.linalg.norm(ref, axis=-1, keepdims=True)

    ours = np.asarray(
        mclip.encode(
            params, cfg, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32)
        )
    )
    cos = (ours * ref).sum(-1)
    assert cos.min() > 0.999, cos
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_mclip_random_encodes():
    cfg = mclip.TEST_TINY_MCLIP
    params = mclip.init_mclip(cfg)
    ids = np.array([[5, 6, 7, 1, 1], [8, 9, 1, 1, 1]], np.int32)
    out = np.asarray(mclip.encode(params, cfg, jnp.asarray(ids)))
    assert out.shape == (2, cfg.out_dim)
    np.testing.assert_allclose(
        np.linalg.norm(out, axis=-1), 1.0, atol=1e-5
    )
    # padding must not change the result
    ids2 = np.array([[5, 6, 7, 1, 1, 1, 1], [8, 9, 1, 1, 1, 1, 1]], np.int32)
    out2 = np.asarray(mclip.encode(params, cfg, jnp.asarray(ids2)))
    np.testing.assert_allclose(out, out2, atol=1e-5)
