"""Numeric parity of the JAX CLIP vs torch transformers CLIPModel.

The reference's contract is that mapper embeddings match the upstream CLIP
implementations (`mapper.py` test strategy: `tests/test_clip_inference/
test_mapper.py` in the reference parametrizes over clip backends).  With zero
network egress we can't load real checkpoints, so parity is checked against a
randomly-initialized *tiny* HF CLIPModel whose weights are converted through
our loader: same inputs → cosine ≥ 0.999.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from clip_retrieval_tpu.models import clip as jclip
from clip_retrieval_tpu.models import loaders
from clip_retrieval_tpu.models.clip import IMAGE_MEAN, IMAGE_STD


@pytest.fixture(scope="module")
def hf_model():
    from transformers import CLIPConfig, CLIPModel

    cfg = CLIPConfig(
        projection_dim=32,
        text_config={
            "vocab_size": 64,
            "hidden_size": 32,
            "intermediate_size": 64,
            "num_hidden_layers": 2,
            "num_attention_heads": 4,
            "max_position_embeddings": 16,
            "hidden_act": "quick_gelu",
            "eos_token_id": 63,
            "bos_token_id": 62,
        },
        vision_config={
            "hidden_size": 48,
            "intermediate_size": 96,
            "num_hidden_layers": 2,
            "num_attention_heads": 4,
            "image_size": 32,
            "patch_size": 8,
            "hidden_act": "quick_gelu",
        },
    )
    torch.manual_seed(0)
    model = CLIPModel(cfg).eval()
    return model


@pytest.fixture(scope="module")
def converted(hf_model):
    cfg = loaders.config_from_hf(hf_model.config)
    params = loaders.convert_hf_state_dict(hf_model.state_dict(), cfg)
    return params, cfg


def _rand_images(n, size, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(n, size, size, 3), dtype=np.uint8)


def _rand_tokens(n, ctx, vocab, eos, seed=1):
    rng = np.random.default_rng(seed)
    toks = np.zeros((n, ctx), dtype=np.int64)
    for i in range(n):
        length = int(rng.integers(3, ctx - 1))
        toks[i, 0] = 62  # bos
        toks[i, 1:length] = rng.integers(1, 60, size=length - 1)
        toks[i, length] = eos
    return toks


def _cos(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    num = (a * b).sum(-1)
    den = np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1)
    return num / den


def test_image_parity(hf_model, converted):
    params, cfg = converted
    images = _rand_images(4, cfg.image_size)
    # HF path: normalized fp32 NCHW
    x = images.astype(np.float32) / 255.0
    x = (x - IMAGE_MEAN) / IMAGE_STD
    with torch.no_grad():
        ref = hf_model.get_image_features(
            pixel_values=torch.from_numpy(x.transpose(0, 3, 1, 2))
        ).numpy()
    ref = ref / np.linalg.norm(ref, axis=-1, keepdims=True)
    ours = np.asarray(
        jclip.encode_image(params, cfg, jnp.asarray(images), attn_impl="xla")
    )
    cos = _cos(ours, ref)
    assert cos.min() > 0.999, cos
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_text_parity(hf_model, converted):
    params, cfg = converted
    tokens = _rand_tokens(5, cfg.context_length, cfg.vocab_size, eos=63)
    with torch.no_grad():
        ref = hf_model.get_text_features(
            input_ids=torch.from_numpy(tokens)
        ).numpy()
    ref = ref / np.linalg.norm(ref, axis=-1, keepdims=True)
    ours = np.asarray(
        jclip.encode_text(
            params, cfg, jnp.asarray(tokens, jnp.int32), attn_impl="xla"
        )
    )
    cos = _cos(ours, ref)
    assert cos.min() > 0.999, cos
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_openai_format_conversion_matches_hf(hf_model, converted):
    """Build an openai-naming state dict from the same HF weights; both
    converters must produce identical param trees."""
    params_hf, cfg = converted
    sd = {k: v for k, v in hf_model.state_dict().items()}
    w = cfg.vision_width
    tw = cfg.text_width

    def t(x):
        return x

    osd = {}
    osd["visual.conv1.weight"] = sd[
        "vision_model.embeddings.patch_embedding.weight"
    ]
    osd["visual.class_embedding"] = sd[
        "vision_model.embeddings.class_embedding"
    ]
    osd["visual.positional_embedding"] = sd[
        "vision_model.embeddings.position_embedding.weight"
    ]
    osd["visual.ln_pre.weight"] = sd["vision_model.pre_layrnorm.weight"]
    osd["visual.ln_pre.bias"] = sd["vision_model.pre_layrnorm.bias"]
    osd["visual.ln_post.weight"] = sd["vision_model.post_layernorm.weight"]
    osd["visual.ln_post.bias"] = sd["vision_model.post_layernorm.bias"]
    osd["visual.proj"] = sd["visual_projection.weight"].T
    osd["token_embedding.weight"] = sd[
        "text_model.embeddings.token_embedding.weight"
    ]
    osd["positional_embedding"] = sd[
        "text_model.embeddings.position_embedding.weight"
    ]
    osd["ln_final.weight"] = sd["text_model.final_layer_norm.weight"]
    osd["ln_final.bias"] = sd["text_model.final_layer_norm.bias"]
    osd["text_projection"] = sd["text_projection.weight"].T
    osd["logit_scale"] = sd["logit_scale"]

    for tower, prefix, n in (
        ("vision_model", "visual.transformer", cfg.vision_layers),
        ("text_model", "transformer", cfg.text_layers),
    ):
        for i in range(n):
            src = f"{tower}.encoder.layers.{i}."
            dst = f"{prefix}.resblocks.{i}."
            osd[dst + "ln_1.weight"] = sd[src + "layer_norm1.weight"]
            osd[dst + "ln_1.bias"] = sd[src + "layer_norm1.bias"]
            osd[dst + "ln_2.weight"] = sd[src + "layer_norm2.weight"]
            osd[dst + "ln_2.bias"] = sd[src + "layer_norm2.bias"]
            osd[dst + "attn.in_proj_weight"] = torch.cat(
                [
                    sd[src + "self_attn.q_proj.weight"],
                    sd[src + "self_attn.k_proj.weight"],
                    sd[src + "self_attn.v_proj.weight"],
                ]
            )
            osd[dst + "attn.in_proj_bias"] = torch.cat(
                [
                    sd[src + "self_attn.q_proj.bias"],
                    sd[src + "self_attn.k_proj.bias"],
                    sd[src + "self_attn.v_proj.bias"],
                ]
            )
            osd[dst + "attn.out_proj.weight"] = sd[
                src + "self_attn.out_proj.weight"
            ]
            osd[dst + "attn.out_proj.bias"] = sd[
                src + "self_attn.out_proj.bias"
            ]
            osd[dst + "mlp.c_fc.weight"] = sd[src + "mlp.fc1.weight"]
            osd[dst + "mlp.c_fc.bias"] = sd[src + "mlp.fc1.bias"]
            osd[dst + "mlp.c_proj.weight"] = sd[src + "mlp.fc2.weight"]
            osd[dst + "mlp.c_proj.bias"] = sd[src + "mlp.fc2.bias"]

    assert loaders.detect_format(osd) == "openai"
    params_oa = loaders.convert_openai_state_dict(osd, cfg)

    import jax

    for (ka, a), (kb, b) in zip(
        jax.tree_util.tree_leaves_with_path(params_hf),
        jax.tree_util.tree_leaves_with_path(params_oa),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=0, err_msg=str(ka)
        )


def test_bf16_close_to_fp32(converted):
    params, cfg = converted
    images = _rand_images(2, cfg.image_size)
    f32 = np.asarray(
        jclip.encode_image(params, cfg, jnp.asarray(images), attn_impl="xla")
    )
    bf16 = np.asarray(
        jclip.encode_image(
            params,
            cfg,
            jnp.asarray(images),
            compute_dtype=jnp.bfloat16,
            attn_impl="xla",
        )
    )
    assert _cos(f32, bf16).min() > 0.99


def test_fused_qkv_matches_unfused(monkeypatch):
    """CRT_FUSE_QKV=1 folds q/k/v into one (W, 3W) MXU matmul; results must
    be identical to the unfused path (same weights, same math order per
    column block)."""
    from clip_retrieval_tpu.models.clip import encode_image, encode_text, init_clip
    from clip_retrieval_tpu.models.configs import TEST_TINY

    cfg = TEST_TINY
    params = init_clip(cfg, 0)
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(
        rng.integers(0, 255, (4, cfg.image_size, cfg.image_size, 3)).astype(
            np.uint8
        )
    )
    toks = jnp.asarray(
        rng.integers(1, cfg.vocab_size - 2, (4, cfg.context_length)).astype(
            np.int32
        )
    )
    monkeypatch.delenv("CRT_FUSE_QKV", raising=False)
    img_ref = np.asarray(encode_image(params, cfg, imgs))
    txt_ref = np.asarray(encode_text(params, cfg, toks))
    monkeypatch.setenv("CRT_FUSE_QKV", "1")
    np.testing.assert_allclose(
        np.asarray(encode_image(params, cfg, imgs)), img_ref, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(encode_text(params, cfg, toks)), txt_ref, atol=1e-5
    )
