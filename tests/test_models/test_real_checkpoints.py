"""Real published-checkpoint parity — gated, runs where egress exists.

The reference's tests load the actual ViT-B/32 weights
(`tests/test_clip_inference/test_mapper.py:9-39` upstream); this image has
zero network egress, so the always-on conversion tests use random weights
at full geometry (test_fullsize_conversion.py).  This module is the
run-anywhere counterpart: set

    CRT_ALLOW_DOWNLOAD=1 python -m pytest tests/test_models/test_real_checkpoints.py -v

on a machine with internet (or with the artifacts already cached) and it
validates, against the real published artifacts:

- HF layout: `openai/clip-vit-base-patch32` through transformers → our
  converter → cosine ≥ 0.999 vs torch's own forward, image and text.
- openai layout: the published ViT-B-32.pt TorchScript archive →
  state_dict → our openai converter → embeddings must match the
  HF-converted ones (same underlying weights) to cosine ≥ 0.999.
- the real autokeras NSFW zip through models/safety.py (fixture tests
  validate the format; this validates the artifact itself).

Caches land in the reference-compatible ~/.cache/clip_retrieval/ so a
second run is offline.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from clip_retrieval_tpu.models import clip as jclip
from clip_retrieval_tpu.models import loaders
from clip_retrieval_tpu.models.clip import IMAGE_MEAN, IMAGE_STD
from clip_retrieval_tpu.models.configs import get_config
from clip_retrieval_tpu.models.tokenizer import CLIPTokenizer

pytestmark = pytest.mark.skipif(
    os.environ.get("CRT_ALLOW_DOWNLOAD") != "1",
    reason="real-checkpoint parity needs egress (or warm caches): set "
    "CRT_ALLOW_DOWNLOAD=1 to run",
)

OPENAI_B32_URL = (
    "https://openaipublic.azureedge.net/clip/models/"
    "40d365715913c9da98579312b702a82c18be219cc2a73407c4526f58eba950af/"
    "ViT-B-32.pt"
)

TEXTS = [
    "a photo of a cat sleeping on a couch",
    "an aerial view of a city at night",
    "a bowl of fresh strawberries",
]


def _images(n=3, size=224, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(n, size, size, 3), dtype=np.uint8)


@pytest.fixture(scope="module")
def hf_b32():
    try:
        model = transformers.CLIPModel.from_pretrained(
            "openai/clip-vit-base-patch32"
        )
        tok = transformers.CLIPTokenizer.from_pretrained(
            "openai/clip-vit-base-patch32"
        )
    except OSError as e:  # no egress and no cache
        pytest.skip(f"cannot fetch openai/clip-vit-base-patch32: {e}")
    # our tokenizer, built from the real published merge table (the HF slow
    # tokenizer exposes it as bpe_ranks)
    merges = [m for m, _ in sorted(tok.bpe_ranks.items(), key=lambda kv: kv[1])]
    ours_tok = CLIPTokenizer(merges=merges)
    return model.eval(), tok, ours_tok


def _torch_features(model, tok, images_u8, texts):
    mean = np.asarray(IMAGE_MEAN, np.float32)
    std = np.asarray(IMAGE_STD, np.float32)
    px = (images_u8.astype(np.float32) / 255.0 - mean) / std
    px_t = torch.from_numpy(px.transpose(0, 3, 1, 2))
    batch = tok(texts, padding="max_length", max_length=77, return_tensors="pt")
    with torch.no_grad():
        img = model.get_image_features(pixel_values=px_t).numpy()
        txt = model.get_text_features(
            input_ids=batch["input_ids"],
            attention_mask=batch["attention_mask"],
        ).numpy()
    img /= np.linalg.norm(img, axis=-1, keepdims=True)
    txt /= np.linalg.norm(txt, axis=-1, keepdims=True)
    return img, txt


def _ours(params, cfg, images_u8, texts, tokenizer):
    toks = tokenizer(texts)
    img = np.asarray(
        jclip.encode_image(
            params, cfg, jnp.asarray(images_u8),
            compute_dtype=jnp.float32, attn_impl="xla",
        )
    )
    txt = np.asarray(
        jclip.encode_text(
            params, cfg, jnp.asarray(toks.astype(np.int32)),
            compute_dtype=jnp.float32, attn_impl="xla",
        )
    )
    img /= np.linalg.norm(img, axis=-1, keepdims=True)
    txt /= np.linalg.norm(txt, axis=-1, keepdims=True)
    return img, txt


def _assert_cos(ours, ref, what, thr=0.999):
    cos = np.sum(ours.astype(np.float64) * ref.astype(np.float64), axis=-1)
    assert cos.min() > thr, f"{what}: cos={cos}"


def test_hf_layout_real_vit_b32(hf_b32):
    model, tok, ours_tok = hf_b32
    cfg = loaders.config_from_hf(model.config)
    params = loaders.convert_hf_state_dict(model.state_dict(), cfg)
    images = _images()
    t_img, t_txt = _torch_features(model, tok, images, TEXTS)
    j_img, j_txt = _ours(params, cfg, images, TEXTS, ours_tok)
    _assert_cos(j_img, t_img, "image tower (hf layout, real weights)")
    _assert_cos(j_txt, t_txt, "text tower (hf layout, real weights)")


def test_openai_layout_real_vit_b32(hf_b32):
    cache = os.path.expanduser("~/.cache/clip_retrieval/ViT-B-32.pt")
    if not os.path.exists(cache):
        from urllib.request import urlretrieve

        os.makedirs(os.path.dirname(cache), exist_ok=True)
        try:
            urlretrieve(OPENAI_B32_URL, cache)
        except Exception as e:
            pytest.skip(f"cannot fetch ViT-B-32.pt: {e}")
    try:
        jit_model = torch.jit.load(cache, map_location="cpu")
        sd = {k: v for k, v in jit_model.state_dict().items()}
    except Exception:
        sd = torch.load(cache, map_location="cpu")
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
    model, tok, ours_tok = hf_b32
    cfg = get_config("ViT-B/32")
    assert loaders.detect_format(sd) == "openai"
    params = loaders.convert_state_dict(sd, cfg)
    images = _images()
    j_img, j_txt = _ours(params, cfg, images, TEXTS, ours_tok)

    # same published weights in the HF layout → the two conversions must
    # produce the same embedding space (and the HF side is torch-parity
    # checked above, closing the chain to the reference's torch forward)
    hcfg = loaders.config_from_hf(model.config)
    hparams = loaders.convert_hf_state_dict(model.state_dict(), hcfg)
    h_img, h_txt = _ours(hparams, hcfg, images, TEXTS, ours_tok)
    _assert_cos(j_img, h_img, "image tower (openai vs hf layout)")
    _assert_cos(j_txt, h_txt, "text tower (openai vs hf layout)")


def test_real_autokeras_nsfw_zip():
    from clip_retrieval_tpu.models.safety import load_safety_model

    mlp = load_safety_model("ViT-B/32")
    if mlp is None:
        pytest.skip("autokeras NSFW zip not downloadable/cached")
    emb = np.random.default_rng(0).normal(size=(8, 512)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    scores = np.asarray(mlp.predict(emb))
    assert scores.shape[0] == 8
    assert np.all(scores >= 0.0) and np.all(scores <= 1.0)
    assert np.all(np.isfinite(scores))
