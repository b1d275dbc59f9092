"""Multilingual CLIP text encoders (M-CLIP family) in functional JAX.

The reference consumes mCLIP through two torch packages: sentence-transformers
('sentence-transformers/clip-ViT-B-32-multilingual-v1', a multilingual
DistilBERT + dense projection — `clip_inference/mapper.py:44-47`) and
`multilingual_clip` (XLM-R Large + linear — `clip_back.py:836-859`).  Both are
the same shape: a post-LN BERT-family encoder, masked mean pooling, and a
linear projection into the CLIP embedding space.  This module implements that
family natively:

- post-LN transformer blocks under `lax.scan` (stacked layer axis);
- RoBERTa-style position ids (offset past pad_id) or plain 0..n-1;
- masked mean pooling + projection, L2-normalized to match CLIP space.

Weights convert from HF `XLMRobertaModel` / `BertModel` / `DistilBertModel`
state dicts plus a projection matrix (sentence-transformers `2_Dense` layer
or M-CLIP `LinearTransformation`).  Tokenization uses the `tokenizers`
library with a local tokenizer.json (no egress).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Mapping

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class MCLIPConfig:
    vocab_size: int = 250002
    hidden: int = 768
    layers: int = 12
    heads: int = 12
    mlp_dim: int = 3072
    max_positions: int = 514
    pad_token_id: int = 1
    position_offset: int = 2  # roberta: positions start at pad_id+1
    out_dim: int = 512  # CLIP embedding dim
    layernorm_eps: float = 1e-5
    act: str = "gelu"


TEST_TINY_MCLIP = MCLIPConfig(
    vocab_size=128,
    hidden=32,
    layers=2,
    heads=4,
    mlp_dim=64,
    max_positions=40,
    out_dim=16,
)


def _ln(x, p, eps):
    x32 = x.astype(jnp.float32)
    m = jnp.mean(x32, -1, keepdims=True)
    v = jnp.mean(jnp.square(x32 - m), -1, keepdims=True)
    y = (x32 - m) * jax.lax.rsqrt(v + eps)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def _dense(x, w, b):
    y = jnp.dot(x, w.astype(x.dtype), preferred_element_type=jnp.float32)
    return (y + b.astype(jnp.float32)).astype(x.dtype)


def _block(x, p, mask_bias, *, heads, eps, act):
    b, s, h = x.shape
    dh = h // heads
    a = p["attn"]
    q = _dense(x, a["wq"], a["bq"]).reshape(b, s, heads, dh)
    k = _dense(x, a["wk"], a["bk"]).reshape(b, s, heads, dh)
    v = _dense(x, a["wv"], a["bv"]).reshape(b, s, heads, dh)
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * (dh ** -0.5)
    logits = logits + mask_bias[:, None, None, :]
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    o = jnp.einsum(
        "bhqk,bkhd->bqhd", probs, v, preferred_element_type=jnp.float32
    ).astype(x.dtype)
    o = _dense(o.reshape(b, s, h), a["wo"], a["bo"])
    x = _ln(x + o, p["ln_attn"], eps)  # post-LN
    y = _dense(x, p["mlp"]["w_in"], p["mlp"]["b_in"])
    y = jax.nn.gelu(y, approximate=False) if act == "gelu" else jnp.maximum(y, 0)
    y = _dense(y, p["mlp"]["w_out"], p["mlp"]["b_out"])
    return _ln(x + y, p["ln_mlp"], eps)


def encode(
    params: Dict[str, Any],
    cfg: MCLIPConfig,
    input_ids: jax.Array,
    attention_mask: jax.Array | None = None,
    *,
    normalize: bool = True,
    compute_dtype=jnp.float32,
) -> jax.Array:
    """(B, S) ids → (B, out_dim) CLIP-space embeddings."""
    if attention_mask is None:
        attention_mask = (input_ids != cfg.pad_token_id).astype(jnp.int32)
    mask = attention_mask.astype(jnp.float32)
    # roberta position ids: cumsum over mask, offset past pad id
    if cfg.position_offset:
        positions = (
            jnp.cumsum(attention_mask, axis=1) * attention_mask
            + cfg.pad_token_id
        )
    else:
        positions = jnp.broadcast_to(
            jnp.arange(input_ids.shape[1]), input_ids.shape
        )
    x = params["word_emb"][input_ids] + params["pos_emb"][positions]
    if "type_emb" in params:  # BERT/XLM-R token-type row 0 (constant)
        x = x + params["type_emb"]
    x = x.astype(compute_dtype)
    x = _ln(x, params["ln_emb"], cfg.layernorm_eps)
    mask_bias = jnp.where(mask > 0, 0.0, -1e30).astype(jnp.float32)

    def body(carry, layer_params):
        return (
            _block(
                carry,
                layer_params,
                mask_bias,
                heads=cfg.heads,
                eps=cfg.layernorm_eps,
                act=cfg.act,
            ),
            None,
        )

    x, _ = jax.lax.scan(body, x, params["blocks"])
    # masked mean pooling (sentence-transformers / M-CLIP pooling)
    denom = jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1e-9)
    pooled = jnp.sum(
        x.astype(jnp.float32) * mask[:, :, None], axis=1
    ) / denom
    out = jnp.dot(
        pooled, params["proj"]["w"], preferred_element_type=jnp.float32
    )
    if "b" in params["proj"]:
        out = out + params["proj"]["b"]
    if normalize:
        n = jnp.sqrt(jnp.sum(jnp.square(out), -1, keepdims=True))
        out = out / jnp.maximum(n, 1e-12)
    return out


# ---------------------------------------------------------------------------
# init + conversion
# ---------------------------------------------------------------------------


def init_mclip(cfg: MCLIPConfig, seed: int = 0) -> Dict[str, Any]:
    rng = np.random.default_rng(seed)
    h, L = cfg.hidden, cfg.layers

    def w(*shape, scale=0.02):
        return jnp.asarray(
            rng.normal(size=shape).astype(np.float32) * scale
        )

    def ln():
        return {
            "scale": jnp.ones((L, h), jnp.float32),
            "bias": jnp.zeros((L, h), jnp.float32),
        }

    return {
        "word_emb": w(cfg.vocab_size, h),
        "pos_emb": w(cfg.max_positions, h),
        "ln_emb": {"scale": jnp.ones((h,)), "bias": jnp.zeros((h,))},
        "blocks": {
            "attn": {
                "wq": w(L, h, h),
                "wk": w(L, h, h),
                "wv": w(L, h, h),
                "wo": w(L, h, h),
                "bq": jnp.zeros((L, h)),
                "bk": jnp.zeros((L, h)),
                "bv": jnp.zeros((L, h)),
                "bo": jnp.zeros((L, h)),
            },
            "ln_attn": ln(),
            "mlp": {
                "w_in": w(L, h, cfg.mlp_dim),
                "b_in": jnp.zeros((L, cfg.mlp_dim)),
                "w_out": w(L, cfg.mlp_dim, h),
                "b_out": jnp.zeros((L, h)),
            },
            "ln_mlp": ln(),
        },
        "proj": {"w": w(h, cfg.out_dim), "b": jnp.zeros((cfg.out_dim,))},
    }


def _np(x):
    try:
        return x.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(x)


def convert_hf_roberta(
    sd: Mapping[str, Any],
    cfg: MCLIPConfig,
    proj_w: np.ndarray,
    proj_b: np.ndarray | None = None,
    prefix: str = "",
) -> Dict[str, Any]:
    """HF XLMRobertaModel/BertModel state dict + projection → our params.

    proj_w: (hidden, out_dim) with x @ proj_w semantics (transpose torch's
    (out, in) Linear weight before passing).
    """
    g = lambda k: _np(sd[prefix + k])
    L = cfg.layers

    def stack(fmt):
        return np.stack([_np(sd[prefix + fmt.format(i=i)]) for i in range(L)])

    def lin_w(fmt):
        return stack(fmt).transpose(0, 2, 1)

    emb = "embeddings."
    enc = "encoder.layer.{i}."
    params = {
        "word_emb": g(emb + "word_embeddings.weight"),
        "pos_emb": g(emb + "position_embeddings.weight"),
        **(
            {"type_emb": g(emb + "token_type_embeddings.weight")[0]}
            if prefix + emb + "token_type_embeddings.weight" in sd
            else {}
        ),
        "ln_emb": {
            "scale": g(emb + "LayerNorm.weight"),
            "bias": g(emb + "LayerNorm.bias"),
        },
        "blocks": {
            "attn": {
                "wq": lin_w(enc + "attention.self.query.weight"),
                "wk": lin_w(enc + "attention.self.key.weight"),
                "wv": lin_w(enc + "attention.self.value.weight"),
                "wo": lin_w(enc + "attention.output.dense.weight"),
                "bq": stack(enc + "attention.self.query.bias"),
                "bk": stack(enc + "attention.self.key.bias"),
                "bv": stack(enc + "attention.self.value.bias"),
                "bo": stack(enc + "attention.output.dense.bias"),
            },
            "ln_attn": {
                "scale": stack(enc + "attention.output.LayerNorm.weight"),
                "bias": stack(enc + "attention.output.LayerNorm.bias"),
            },
            "mlp": {
                "w_in": lin_w(enc + "intermediate.dense.weight"),
                "b_in": stack(enc + "intermediate.dense.bias"),
                "w_out": lin_w(enc + "output.dense.weight"),
                "b_out": stack(enc + "output.dense.bias"),
            },
            "ln_mlp": {
                "scale": stack(enc + "output.LayerNorm.weight"),
                "bias": stack(enc + "output.LayerNorm.bias"),
            },
        },
        "proj": {"w": np.asarray(proj_w, np.float32)},
    }
    if proj_b is not None:
        params["proj"]["b"] = np.asarray(proj_b, np.float32)
    return jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params)


def config_from_hf(hf_config, out_dim: int) -> MCLIPConfig:
    return MCLIPConfig(
        vocab_size=hf_config.vocab_size,
        hidden=hf_config.hidden_size,
        layers=hf_config.num_hidden_layers,
        heads=hf_config.num_attention_heads,
        mlp_dim=hf_config.intermediate_size,
        max_positions=hf_config.max_position_embeddings,
        # explicit None check: `or 1` would clobber BERT/DistilBERT's
        # legitimate pad_token_id=0 and break mask inference + mean pooling
        pad_token_id=(
            1
            if getattr(hf_config, "pad_token_id", None) is None
            else hf_config.pad_token_id
        ),
        position_offset=2
        if hf_config.model_type in ("roberta", "xlm-roberta")
        else 0,
        out_dim=out_dim,
        layernorm_eps=hf_config.layer_norm_eps,
    )


class MCLIPBundle:
    """Loaded multilingual text encoder + tokenizer, mapper/back-ready."""

    def __init__(self, cfg: MCLIPConfig, params, tokenizer=None):
        self.cfg = cfg
        self.params = params
        self.tokenizer = tokenizer

        # params as a jit argument, not a closure constant, so the
        # persistent compilation cache works across processes
        dev_params = jax.device_put(params)

        @jax.jit
        def _encode(p, ids, mask):
            return encode(p, cfg, ids, mask).astype(jnp.float16)

        self._encode = lambda ids, mask: _encode(dev_params, ids, mask)

    def __call__(self, texts) -> np.ndarray:
        """texts → (B, out_dim) normalized fp16 (mapper-compatible)."""
        if isinstance(texts, str):
            texts = [texts]
        if self.tokenizer is None:
            raise RuntimeError("no tokenizer loaded for mCLIP")
        encs = [self.tokenizer.encode(t) for t in texts]
        max_len = min(max(len(e.ids) for e in encs), self.cfg.max_positions - 2)
        # pad the sequence dim to a power-of-two bucket: every distinct
        # (B, S) is its own XLA program, and per-request exact lengths in
        # serving would compile the full encoder once per novel length
        bucket = 8
        while bucket < max_len:
            bucket *= 2
        max_len = min(bucket, self.cfg.max_positions - 2)
        ids = np.full((len(texts), max_len), self.cfg.pad_token_id, np.int32)
        mask = np.zeros((len(texts), max_len), np.int32)
        for i, e in enumerate(encs):
            n = min(len(e.ids), max_len)
            ids[i, :n] = e.ids[:n]
            mask[i, :n] = 1
        return np.asarray(self._encode(jnp.asarray(ids), jnp.asarray(mask)))


def _load_projection(model_dir: str):
    """The text→CLIP-space projection, from any of the published layouts:

    - projection.npz           {"w": (hidden, out), "b": (out,)} (our export)
    - 2_Dense/pytorch_model.bin / model.safetensors   the standard
      sentence-transformers Dense module the reference consumes directly
      via SentenceTransformer (`clip_back.py:836-859`): keys
      'linear.weight' (out, in) and 'linear.bias'.
    """
    proj_path = os.path.join(model_dir, "projection.npz")
    if os.path.exists(proj_path):
        with np.load(proj_path) as z:
            return z["w"], (z["b"] if "b" in z.files else None)
    dense_dir = os.path.join(model_dir, "2_Dense")
    st_path = os.path.join(dense_dir, "model.safetensors")
    if os.path.exists(st_path):
        import safetensors.numpy

        sd = safetensors.numpy.load_file(st_path)
        w = np.asarray(sd["linear.weight"], np.float32)
        b = sd.get("linear.bias")
        return w.T, (None if b is None else np.asarray(b, np.float32))
    bin_path = os.path.join(dense_dir, "pytorch_model.bin")
    if os.path.exists(bin_path):
        import torch

        sd = torch.load(bin_path, map_location="cpu", weights_only=False)
        w = np.asarray(sd["linear.weight"].detach().numpy(), np.float32)
        b = sd.get("linear.bias")
        return w.T, (
            None if b is None else np.asarray(b.detach().numpy(), np.float32)
        )
    raise FileNotFoundError(
        f"no projection found in {model_dir}: expected projection.npz or "
        "a sentence-transformers 2_Dense module "
        "(pytorch_model.bin / model.safetensors)"
    )


def load_mclip(model_dir: str) -> MCLIPBundle:
    """Load an M-CLIP-style checkpoint from a local directory.

    Expected layout (sentence-transformers or M-CLIP export):
      config.json            HF encoder config
      pytorch_model.bin | model.npz     encoder weights
      projection.npz or 2_Dense/       text→CLIP projection (see
                                       _load_projection)
      tokenizer.json         tokenizers-library file
    """
    import transformers

    hf_cfg = transformers.AutoConfig.from_pretrained(model_dir)
    proj_w, proj_b = _load_projection(model_dir)
    cfg = config_from_hf(hf_cfg, out_dim=proj_w.shape[1])

    model = transformers.AutoModel.from_pretrained(model_dir)
    sd = model.state_dict()
    prefix = ""
    if not any(k.startswith("embeddings.") for k in sd):
        for cand in ("roberta.", "bert.", "transformer."):
            if any(k.startswith(cand) for k in sd):
                prefix = cand
                break
    params = convert_hf_roberta(sd, cfg, proj_w, proj_b, prefix=prefix)

    tokenizer = None
    tok_path = os.path.join(model_dir, "tokenizer.json")
    if os.path.exists(tok_path):
        from tokenizers import Tokenizer

        tokenizer = Tokenizer.from_file(tok_path)
    return MCLIPBundle(cfg, params, tokenizer)
