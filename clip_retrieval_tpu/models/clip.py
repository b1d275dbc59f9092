"""Functional JAX CLIP: ViT image tower + causal text transformer.

Replaces the reference's torch model loading (`all_clip.load_clip`,
`/root/reference/clip_retrieval/clip_inference/mapper.py:36-47`,
`/root/reference/clip_retrieval/clip_back.py:862-868`) with a first-party,
TPU-first implementation:

- parameters are plain nested dicts of arrays (pjit/shard_map friendly);
- transformer blocks are *stacked* along a leading layer axis and executed
  with `lax.scan`, so compile time is O(1) in depth and XLA sees one fused
  block program;
- patch embedding is expressed as an im2col reshape + one large matmul, which
  maps straight onto the MXU;
- layernorms and softmax run in fp32; matmuls accumulate in fp32 via
  `preferred_element_type`, activations can be bf16 (`compute_dtype`);
- image normalization (CLIP mean/std) is fused into the jitted forward, so
  only uint8 pixels cross the host→HBM boundary.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import attention as attn_ops
from .configs import CLIPConfig

Params = Dict[str, Any]

# CLIP preprocessing constants (match openai/open_clip defaults; the reference
# inherits them via the preprocess fn returned by load_clip).
IMAGE_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], dtype=np.float32)
IMAGE_STD = np.array([0.26862954, 0.26130258, 0.27577711], dtype=np.float32)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _init_block_stack(key, n_layers, width, mlp_dim, dtype=jnp.float32):
    """Stacked transformer block params with leading layer axis."""
    ks = jax.random.split(key, 6)
    w_attn = width ** -0.5
    w_mlp = (2 * width) ** -0.5

    def stack(k, shape, scale):
        return (jax.random.normal(k, (n_layers, *shape), dtype) * scale)

    return {
        "ln_1": {
            "scale": jnp.ones((n_layers, width), dtype),
            "bias": jnp.zeros((n_layers, width), dtype),
        },
        "attn": {
            "wq": stack(ks[0], (width, width), w_attn),
            "wk": stack(ks[1], (width, width), w_attn),
            "wv": stack(ks[2], (width, width), w_attn),
            "wo": stack(ks[3], (width, width), w_attn),
            "bq": jnp.zeros((n_layers, width), dtype),
            "bk": jnp.zeros((n_layers, width), dtype),
            "bv": jnp.zeros((n_layers, width), dtype),
            "bo": jnp.zeros((n_layers, width), dtype),
        },
        "ln_2": {
            "scale": jnp.ones((n_layers, width), dtype),
            "bias": jnp.zeros((n_layers, width), dtype),
        },
        "mlp": {
            "w_in": stack(ks[4], (width, mlp_dim), w_attn),
            "b_in": jnp.zeros((n_layers, mlp_dim), dtype),
            "w_out": stack(ks[5], (mlp_dim, width), w_mlp),
            "b_out": jnp.zeros((n_layers, width), dtype),
        },
    }


def init_clip(cfg: CLIPConfig, key: jax.Array | int = 0) -> Params:
    """Random-init parameters (openai-style scales)."""
    if isinstance(key, int):
        key = jax.random.PRNGKey(key)
    # one independent key per tensor — reusing a key makes two "random"
    # tensors share their leading values (e.g. class_emb duplicating the
    # first row of proj)
    (
        _, kt, kvb, ktb, kproj_v, kproj_t, ktok,
        kcls, kpatch, kblocks_v,
    ) = jax.random.split(key, 10)
    if cfg.vision_kind == "resnet":
        from . import resnet as _resnet

        visual = _resnet.init_resnet_visual(cfg, kvb)
        return {
            "visual": visual,
            "text": _init_text(cfg, kt, ktb, kproj_t, ktok),
            "logit_scale": jnp.array(np.log(1 / 0.07), jnp.float32),
        }
    w = cfg.vision_width
    v_mlp = int(round(cfg.vision_width * cfg.vision_mlp_ratio))
    visual = {
        "patch_embed": {
            "kernel": jax.random.normal(
                kpatch, (cfg.patch_size, cfg.patch_size, 3, w), jnp.float32
            )
            * (w ** -0.5)
        },
        "class_emb": jax.random.normal(kcls, (w,), jnp.float32) * w ** -0.5,
        "pos_emb": jax.random.normal(
            kvb, (cfg.vision_seq_len, w), jnp.float32
        )
        * w ** -0.5,
        "ln_pre": {"scale": jnp.ones((w,)), "bias": jnp.zeros((w,))},
        "blocks": _init_block_stack(kblocks_v, cfg.vision_layers, w, v_mlp),
        "ln_post": {"scale": jnp.ones((w,)), "bias": jnp.zeros((w,))},
        "proj": jax.random.normal(kproj_v, (w, cfg.embed_dim), jnp.float32)
        * w ** -0.5,
    }
    return {
        "visual": visual,
        "text": _init_text(cfg, kt, ktb, kproj_t, ktok),
        "logit_scale": jnp.array(np.log(1 / 0.07), jnp.float32),
    }


def _init_text(cfg: CLIPConfig, kt, ktb, kproj_t, ktok) -> Params:
    tw = cfg.text_width
    t_mlp = int(round(cfg.text_width * cfg.text_mlp_ratio))
    return {
        "token_emb": jax.random.normal(
            ktok, (cfg.vocab_size, tw), jnp.float32
        )
        * 0.02,
        "pos_emb": jax.random.normal(
            ktb, (cfg.context_length, tw), jnp.float32
        )
        * 0.01,
        "blocks": _init_block_stack(kt, cfg.text_layers, tw, t_mlp),
        "ln_final": {"scale": jnp.ones((tw,)), "bias": jnp.zeros((tw,))},
        "proj": jax.random.normal(kproj_t, (tw, cfg.embed_dim), jnp.float32)
        * tw ** -0.5,
    }


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _layer_norm(x, p, eps):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def _act(x, kind):
    if kind == "quick_gelu":
        return x * jax.nn.sigmoid(1.702 * x)
    if kind == "gelu":
        return jax.nn.gelu(x, approximate=False)
    raise ValueError(f"unknown act {kind}")


def _dense(x, w, b=None):
    y = jnp.dot(x, w.astype(x.dtype), preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(x.dtype)


def _block(x, p, *, heads, act, eps, causal, attn_impl):
    y = _layer_norm(x, p["ln_1"], eps)
    a = p["attn"]
    if "wqkv" in a:
        # pre-fused projection: one (W, 3W) matmul instead of three (W, W)
        qkv = _dense(y, a["wqkv"], a["bqkv"])
        q, k, v = jnp.split(qkv, 3, axis=-1)
    else:
        q = _dense(y, a["wq"], a["bq"])
        k = _dense(y, a["wk"], a["bk"])
        v = _dense(y, a["wv"], a["bv"])
    # q/k/v stay in the packed (B, S, W) projection layout: sdpa_packed
    # feeds the Pallas kernel that layout directly on TPU (the head
    # reshape/transposes are real HBM copies around a custom call —
    # measured ~2 ms/layer on ViT-L/14) and reshapes only on fallback.
    o = attn_ops.sdpa_packed(q, k, v, heads, causal=causal, impl=attn_impl)
    x = x + _dense(o, a["wo"], a["bo"])
    y = _layer_norm(x, p["ln_2"], eps)
    m = p["mlp"]
    y = _dense(y, m["w_in"], m["b_in"])
    y = _act(y, act)
    y = _dense(y, m["w_out"], m["b_out"])
    return x + y


def _run_blocks(x, blocks, *, heads, act, eps, causal, attn_impl):
    """lax.scan over the stacked layer axis."""
    import os

    if os.environ.get("CRT_FUSE_QKV") == "1" and "wq" in blocks["attn"]:
        # A/B-only path: fold q/k/v into one (L, W, 3W) weight so each block
        # issues a single wider MXU matmul. Measured SLOWER on v5e ViT-L/14
        # bf16 batch=256 (617.6 vs 662.2 img/s, benchmarks/qkv_fusion_tpu
        # .json): the concat adds an extra HBM pass over the attention
        # weights and XLA already schedules the three (W, W) projections
        # back-to-back, so the default stays unfused.
        a = blocks["attn"]
        blocks = dict(blocks)
        blocks["attn"] = {
            "wqkv": jnp.concatenate([a["wq"], a["wk"], a["wv"]], axis=-1),
            "bqkv": jnp.concatenate([a["bq"], a["bk"], a["bv"]], axis=-1),
            "wo": a["wo"],
            "bo": a["bo"],
        }

    def body(carry, layer_params):
        out = _block(
            carry,
            layer_params,
            heads=heads,
            act=act,
            eps=eps,
            causal=causal,
            attn_impl=attn_impl,
        )
        return out, None

    out, _ = jax.lax.scan(body, x, blocks)
    return out


def normalize_images(images: jax.Array, dtype=jnp.float32) -> jax.Array:
    """uint8 (B,H,W,3) or float in [0,1] → CLIP-normalized float.

    NOTE: `encode_image` applies this ONLY to uint8 inputs — float inputs
    to `encode_image` are assumed already CLIP-normalized (its contract).
    Callers holding [0,1] floats must call this helper themselves (or pass
    uint8)."""
    if images.dtype == jnp.uint8:
        x = images.astype(dtype) / jnp.asarray(255.0, dtype)
    else:
        x = images.astype(dtype)
    mean = jnp.asarray(IMAGE_MEAN, dtype)
    std = jnp.asarray(IMAGE_STD, dtype)
    return (x - mean) / std


def encode_image(
    params: Params,
    cfg: CLIPConfig,
    images: jax.Array,
    *,
    normalize: bool = True,
    compute_dtype=jnp.float32,
    attn_impl: str = "auto",
) -> jax.Array:
    """images: (B, H, W, 3) uint8 or CLIP-normalized float → (B, embed_dim).

    Output is L2-normalized (like `mapper.py:57-67` in the reference) unless
    normalize=False.
    """
    vp = params["visual"]
    p_sz = cfg.patch_size
    g = cfg.grid_size
    if images.dtype == jnp.uint8 or images.dtype in (jnp.float32, jnp.bfloat16):
        x = normalize_images(images, compute_dtype) if (
            images.dtype == jnp.uint8
        ) else images.astype(compute_dtype)
    else:
        raise TypeError(f"bad image dtype {images.dtype}")
    if cfg.vision_kind == "resnet":
        from . import resnet as _resnet

        feats = _resnet.forward_visual(vp, cfg, x, compute_dtype)
        return l2_normalize(feats) if normalize else feats
    b = x.shape[0]
    # im2col patchify: (B, g, P, g, P, 3) → (B, g*g, P*P*3), then one matmul.
    x = x.reshape(b, g, p_sz, g, p_sz, 3)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, g * g, p_sz * p_sz * 3)
    kernel = vp["patch_embed"]["kernel"].reshape(-1, cfg.vision_width)
    x = jnp.dot(
        x, kernel.astype(compute_dtype), preferred_element_type=jnp.float32
    ).astype(compute_dtype)
    cls = jnp.broadcast_to(
        vp["class_emb"].astype(compute_dtype), (b, 1, cfg.vision_width)
    )
    x = jnp.concatenate([cls, x], axis=1)
    x = x + vp["pos_emb"].astype(compute_dtype)
    x = _layer_norm(x, vp["ln_pre"], cfg.layernorm_eps)
    x = _run_blocks(
        x,
        vp["blocks"],
        heads=cfg.vision_heads,
        act=cfg.act,
        eps=cfg.layernorm_eps,
        causal=False,
        attn_impl=attn_impl,
    )
    x = _layer_norm(x[:, 0], vp["ln_post"], cfg.layernorm_eps)
    feats = jnp.dot(
        x, vp["proj"].astype(compute_dtype), preferred_element_type=jnp.float32
    )
    if normalize:
        feats = l2_normalize(feats)
    return feats


def encode_text(
    params: Params,
    cfg: CLIPConfig,
    tokens: jax.Array,
    *,
    normalize: bool = True,
    compute_dtype=jnp.float32,
    attn_impl: str = "auto",
) -> jax.Array:
    """tokens: (B, context_length) int32 → (B, embed_dim).

    Pooled at the EOT position = argmax(tokens) (EOT has the largest id in the
    CLIP vocab, matching openai CLIP and HF's pooling).
    """
    tp = params["text"]
    x = tp["token_emb"][tokens].astype(compute_dtype)
    x = x + tp["pos_emb"][: x.shape[1]].astype(compute_dtype)
    x = _run_blocks(
        x,
        tp["blocks"],
        heads=cfg.text_heads,
        act=cfg.act,
        eps=cfg.layernorm_eps,
        causal=True,
        attn_impl=attn_impl,
    )
    x = _layer_norm(x, tp["ln_final"], cfg.layernorm_eps)
    eot = jnp.argmax(tokens, axis=-1)
    x = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
    feats = jnp.dot(
        x, tp["proj"].astype(compute_dtype), preferred_element_type=jnp.float32
    )
    if normalize:
        feats = l2_normalize(feats)
    return feats


def l2_normalize(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    x32 = x.astype(jnp.float32)
    n = jnp.sqrt(jnp.sum(jnp.square(x32), axis=axis, keepdims=True))
    return x32 / jnp.maximum(n, eps)


def clip_forward(
    params: Params,
    cfg: CLIPConfig,
    images: jax.Array,
    tokens: jax.Array,
    *,
    compute_dtype=jnp.float32,
    attn_impl: str = "auto",
):
    """Joint forward: returns (image_feats, text_feats, logit_scale)."""
    img = encode_image(
        params, cfg, images, compute_dtype=compute_dtype, attn_impl=attn_impl
    )
    txt = encode_text(
        params, cfg, tokens, compute_dtype=compute_dtype, attn_impl=attn_impl
    )
    return img, txt, jnp.exp(params["logit_scale"])


def count_params(params: Params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
