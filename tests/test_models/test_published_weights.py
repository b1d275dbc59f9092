"""Published-weights compatibility (VERDICT r1 missing #1).

The reference consumes three families of published artifacts directly:
the autokeras NSFW SavedModel zips (`clip_back.py:724-766`), the LAION
aesthetic rating embeddings (`clip_back.py:671-696`), and
sentence-transformers mCLIP checkpoints with a `2_Dense` projection module
(`clip_back.py:836-859`).  These tests create synthetic files in exactly
those published formats and check our loaders consume them.
"""

import json
import os

import numpy as np
import pytest


# ------------------------------------------------------------ keras NSFW --


def _make_savedmodel(path, in_dim=16, hidden=8, out_dim=1, seed=0):
    keras = pytest.importorskip("tf_keras")
    rng = np.random.default_rng(seed)
    norm = keras.layers.Normalization(axis=-1)
    norm.adapt(rng.normal(size=(200, in_dim)).astype(np.float32) * 2.0 + 1.0)
    final_act = "sigmoid" if out_dim == 1 else "softmax"
    model = keras.Sequential(
        [
            keras.layers.Input(shape=(in_dim,)),
            norm,
            keras.layers.Dense(hidden, activation="relu"),
            keras.layers.Dense(out_dim, activation=final_act),
        ]
    )
    model.save(str(path), save_format="tf")
    return model


def test_keras_nsfw_conversion_matches_tf(tmp_path):
    pytest.importorskip("tensorflow")
    model = _make_savedmodel(tmp_path / "clip_autokeras_binary_nsfw")
    from clip_retrieval_tpu.models.convert import keras_nsfw_weights
    from clip_retrieval_tpu.models.safety import JaxMLP

    weights, final_act = keras_nsfw_weights(
        str(tmp_path / "clip_autokeras_binary_nsfw")
    )
    assert final_act == "sigmoid"
    mlp = JaxMLP(weights, relu_last_n_skipped=1, final_activation=final_act)
    x = np.random.default_rng(1).normal(size=(7, 16)).astype(np.float32)
    ours = mlp.predict(x, batch_size=7)
    ref = model.predict(x, verbose=0)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_keras_nsfw_multiclass_softmax(tmp_path):
    pytest.importorskip("tensorflow")
    model = _make_savedmodel(tmp_path / "nsfw_b32", out_dim=5, seed=2)
    from clip_retrieval_tpu.models.convert import keras_nsfw_weights
    from clip_retrieval_tpu.models.safety import JaxMLP

    weights, final_act = keras_nsfw_weights(str(tmp_path / "nsfw_b32"))
    assert final_act == "softmax"
    mlp = JaxMLP(weights, relu_last_n_skipped=1, final_activation=final_act)
    x = np.random.default_rng(3).normal(size=(4, 16)).astype(np.float32)
    np.testing.assert_allclose(
        mlp.predict(x, 4), model.predict(x, verbose=0), rtol=1e-4, atol=1e-5
    )


def test_load_safety_model_from_reference_cache_layout(tmp_path, monkeypatch):
    """The exact on-disk layout clip_back.py:724-766 leaves behind:
    ~/.cache/clip_retrieval/ViT-L_14/clip_autokeras_binary_nsfw/."""
    pytest.importorskip("tensorflow")
    monkeypatch.setenv("HOME", str(tmp_path))
    sm_dir = (
        tmp_path / ".cache" / "clip_retrieval" / "ViT-L_14"
        / "clip_autokeras_binary_nsfw"
    )
    sm_dir.parent.mkdir(parents=True)
    model = _make_savedmodel(sm_dir, in_dim=24)
    from clip_retrieval_tpu.models import safety as safety_mod

    mlp = safety_mod.load_safety_model("ViT-L/14")
    assert mlp is not None
    x = np.random.default_rng(4).normal(size=(3, 24)).astype(np.float32)
    np.testing.assert_allclose(
        mlp.predict(x, 3), model.predict(x, verbose=0), rtol=1e-4, atol=1e-5
    )
    # the conversion is cached as npz and loaded (with its activation) next time
    npz = (
        tmp_path / ".cache" / "clip_retrieval_tpu" / "ViT-L_14"
        / "nsfw_mlp.npz"
    )
    assert npz.exists()
    mlp2 = safety_mod.load_mlp_npz(str(npz))
    np.testing.assert_allclose(mlp2.predict(x, 3), mlp.predict(x, 3), atol=1e-6)


# ------------------------------------------------------------- aesthetic --


def test_aesthetic_from_reference_cache_layout(tmp_path, monkeypatch):
    monkeypatch.setenv("HOME", str(tmp_path))
    folder = (
        tmp_path / ".cache" / "clip_retrieval" / "ViT-B_32" / "aesthetic"
    )
    folder.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for k in range(10):
        np.save(folder / f"rating{k}.npy", rng.normal(size=(1, 512)))
    from clip_retrieval_tpu.models.safety import get_aesthetic_embedding

    embs = get_aesthetic_embedding("ViT-B/32")
    assert embs is not None and sorted(embs) == list(range(10))
    assert embs[7].shape == (1, 512)


def test_aesthetic_incomplete_set_rejected(tmp_path, monkeypatch):
    monkeypatch.setenv("HOME", str(tmp_path))
    folder = (
        tmp_path / ".cache" / "clip_retrieval_tpu" / "ViT-B_32" / "aesthetic"
    )
    folder.mkdir(parents=True)
    np.save(folder / "rating3.npy", np.zeros((1, 512)))
    from clip_retrieval_tpu.models.safety import get_aesthetic_embedding

    assert get_aesthetic_embedding("ViT-B/32") is None


# ---------------------------------------------------------- mCLIP 2_Dense --


def test_mclip_2dense_projection(tmp_path):
    torch = pytest.importorskip("torch")
    from clip_retrieval_tpu.models.mclip import _load_projection

    dense = tmp_path / "2_Dense"
    dense.mkdir()
    rng = np.random.default_rng(0)
    w = rng.normal(size=(128, 768)).astype(np.float32)  # (out, in) torch
    b = rng.normal(size=(128,)).astype(np.float32)
    torch.save(
        {"linear.weight": torch.from_numpy(w), "linear.bias": torch.from_numpy(b)},
        dense / "pytorch_model.bin",
    )
    pw, pb = _load_projection(str(tmp_path))
    assert pw.shape == (768, 128)  # transposed to (in, out)
    np.testing.assert_allclose(pw, w.T)
    np.testing.assert_allclose(pb, b)


def test_mclip_2dense_safetensors(tmp_path):
    st = pytest.importorskip("safetensors.numpy")
    from clip_retrieval_tpu.models.mclip import _load_projection

    dense = tmp_path / "2_Dense"
    dense.mkdir()
    rng = np.random.default_rng(1)
    w = rng.normal(size=(64, 384)).astype(np.float32)
    st.save_file({"linear.weight": w}, str(dense / "model.safetensors"))
    pw, pb = _load_projection(str(tmp_path))
    assert pw.shape == (384, 64) and pb is None


def test_mclip_projection_missing_raises(tmp_path):
    from clip_retrieval_tpu.models.mclip import _load_projection

    with pytest.raises(FileNotFoundError):
        _load_projection(str(tmp_path))


def test_load_mclip_sentence_transformers_layout(tmp_path):
    """Full bundle load from the published sentence-transformers layout
    (HF encoder at the root + 2_Dense projection), as the reference's
    SentenceTransformer(...) call consumes it (clip_back.py:836-859)."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    cfg = transformers.XLMRobertaConfig(
        vocab_size=120, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=40, pad_token_id=1,
    )
    torch.manual_seed(0)
    model = transformers.XLMRobertaModel(cfg, add_pooling_layer=False).eval()
    model.save_pretrained(str(tmp_path))
    dense = tmp_path / "2_Dense"
    dense.mkdir()
    rng = np.random.default_rng(0)
    w = (rng.normal(size=(16, 32)) * 0.1).astype(np.float32)
    torch.save(
        {
            "linear.weight": torch.from_numpy(w),
            "linear.bias": torch.zeros(16),
        },
        dense / "pytorch_model.bin",
    )
    from clip_retrieval_tpu.models.mclip import load_mclip

    bundle = load_mclip(str(tmp_path))
    assert bundle.cfg.out_dim == 16
    # encode a synthetic batch directly (no tokenizer.json in this layout)
    import jax.numpy as jnp
    from clip_retrieval_tpu.models import mclip as mclip_mod

    ids = np.full((2, 9), cfg.pad_token_id, np.int64)
    mask = np.zeros((2, 9), np.int64)
    ids[:, :5] = rng.integers(3, 120, (2, 5))
    mask[:, :5] = 1
    out = np.asarray(
        mclip_mod.encode(
            bundle.params, bundle.cfg,
            jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32),
        )
    )
    assert out.shape == (2, 16)
    np.testing.assert_allclose(
        np.linalg.norm(out, axis=-1), 1.0, atol=1e-3
    )
