"""Mapper with use_mclip: text path routed through a local M-CLIP checkpoint."""

import json

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")
tokenizers = pytest.importorskip("tokenizers")

from clip_retrieval_tpu.inference.mapper import ClipMapper


@pytest.fixture(scope="module")
def mclip_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("mclip_ckpt")
    cfg = transformers.XLMRobertaConfig(
        vocab_size=64,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=40,
        pad_token_id=1,
    )
    model = transformers.XLMRobertaModel(cfg, add_pooling_layer=False)
    model.save_pretrained(d)
    rng = np.random.default_rng(0)
    np.savez(
        d / "projection.npz",
        w=rng.normal(size=(32, 32)).astype(np.float32) * 0.1,
        b=np.zeros((32,), np.float32),
    )
    # whitespace word-level tokenizer over a tiny vocab
    from tokenizers import Tokenizer, models, pre_tokenizers

    vocab = {"<unk>": 3}
    for i, word in enumerate(
        ["a", "photo", "of", "cat", "dog", "une", "photo_fr", "chat"]
    ):
        vocab[word] = 4 + i
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    tok.save(str(d / "tokenizer.json"))
    return str(d)


def test_mapper_mclip_text_path(mclip_dir):
    mapper = ClipMapper(
        enable_image=False,
        enable_text=True,
        clip_model="test-tiny",
        use_mclip=True,
        mclip_model=mclip_dir,
        batch_size=4,
    )
    batch = {
        "text": ["a photo of cat", "a photo of dog"],
        "text_tokens": np.zeros((2, 16), np.int32),  # ignored by mclip path
    }
    out = mapper(batch)
    assert out["text_embs"].shape == (2, 32)
    assert out["text_embs"].dtype == np.float16
    norms = np.linalg.norm(out["text_embs"].astype(np.float32), axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=2e-3)
    # different texts → different embeddings
    assert not np.allclose(out["text_embs"][0], out["text_embs"][1])
