"""TPU-first CLIP ModifiedResNet image tower (RN50/RN101/RN50x{4,16,64}).

The reference reaches these models through `all_clip.load_clip`
(`/root/reference/clip_retrieval/clip_inference/mapper.py:36`), which accepts
any openai CLIP name including the ResNet family; the architecture is the
published openai ModifiedResNet: a 3-conv stem, four bottleneck stages whose
stride-2 blocks downsample with a stride-2 average pool before the conv, and
a single-query attention pool instead of global average pooling.

TPU-first choices:

- **NHWC + HWIO** convolutions (`lax.conv_general_dilated`), bf16-able with
  fp32 accumulation — the layout XLA:TPU tiles onto the MXU without
  transposes.
- **BatchNorm folded into per-channel scale/bias at load time** (inference
  is the only product path): every conv is followed by one fused
  multiply-add (+ relu), which XLA fuses into the conv epilogue; no
  batch-stat subgraphs exist.
- **`lax.scan` over the identical tail blocks of each stage**: only the
  first block of a stage changes width/stride, so blocks 1..n-1 share
  shapes and scan as one compiled body — compile time is O(stages), not
  O(depth) (RN50x64's 36-block stage would otherwise unroll 36 copies).
- The attention pool is a single-query MHA expressed as two einsums — at
  S = grid^2+1 <= 197 tokens there is nothing for a custom kernel to win.

Param tree (under params["visual"], all leaves f32; compute casts per call):

    stem:   conv1/conv2/conv3 -> {kernel (kh,kw,I,O), scale (O,), bias (O,)}
    stages: list of 4 {head: block, tail: stacked block or None}
            block = {conv1, conv2, conv3[, down]} of the same conv triplets
    attnpool: {pos_emb (S+1, C), wq,bq,wk,bk,wv,bv, wc,bc}
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from .configs import CLIPConfig

Params = Dict[str, Any]

_EXPANSION = 4


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _init_conv(key, kh, kw, cin, cout):
    fan_in = kh * kw * cin
    return {
        "kernel": jax.random.normal(key, (kh, kw, cin, cout), jnp.float32)
        * fan_in**-0.5,
        "scale": jnp.ones((cout,), jnp.float32),
        "bias": jnp.zeros((cout,), jnp.float32),
    }


def _init_block(key, cin, planes, *, down: bool):
    ks = jax.random.split(key, 4)
    p = {
        "conv1": _init_conv(ks[0], 1, 1, cin, planes),
        "conv2": _init_conv(ks[1], 3, 3, planes, planes),
        "conv3": _init_conv(ks[2], 1, 1, planes, planes * _EXPANSION),
    }
    if down:
        p["down"] = _init_conv(ks[3], 1, 1, cin, planes * _EXPANSION)
    return p


def init_resnet_visual(cfg: CLIPConfig, key: jax.Array) -> Params:
    assert cfg.resnet_layers, "init_resnet_visual needs resnet_layers"
    w = cfg.vision_width
    ks = jax.random.split(key, 6 + 2 * len(cfg.resnet_layers))
    stem = {
        "conv1": _init_conv(ks[0], 3, 3, 3, w // 2),
        "conv2": _init_conv(ks[1], 3, 3, w // 2, w // 2),
        "conv3": _init_conv(ks[2], 3, 3, w // 2, w),
    }
    stages = []
    cin = w
    for si, n_blocks in enumerate(cfg.resnet_layers):
        planes = w * (2**si)
        head = _init_block(ks[6 + 2 * si], cin, planes, down=True)
        cin = planes * _EXPANSION
        tail = None
        if n_blocks > 1:
            tails = [
                _init_block(k, cin, planes, down=False)
                for k in jax.random.split(ks[7 + 2 * si], n_blocks - 1)
            ]
            tail = jax.tree.map(lambda *xs: jnp.stack(xs), *tails)
        stages.append({"head": head, "tail": tail})
    c = cfg.attnpool_dim
    seq = cfg.grid_size * cfg.grid_size + 1
    kp, kq, kk, kv, kc = jax.random.split(ks[3], 5)
    attnpool = {
        "pos_emb": jax.random.normal(kp, (seq, c), jnp.float32) * c**-0.5,
        "wq": jax.random.normal(kq, (c, c), jnp.float32) * c**-0.5,
        "bq": jnp.zeros((c,), jnp.float32),
        "wk": jax.random.normal(kk, (c, c), jnp.float32) * c**-0.5,
        "bk": jnp.zeros((c,), jnp.float32),
        "wv": jax.random.normal(kv, (c, c), jnp.float32) * c**-0.5,
        "bv": jnp.zeros((c,), jnp.float32),
        "wc": jax.random.normal(kc, (c, cfg.embed_dim), jnp.float32)
        * c**-0.5,
        "bc": jnp.zeros((cfg.embed_dim,), jnp.float32),
    }
    return {"stem": stem, "stages": stages, "attnpool": attnpool}


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _conv(x, p, *, stride: int = 1, relu: bool = True):
    """conv (+folded BN) (+relu).  3x3 kernels use torch-equivalent explicit
    padding (1,1) — XLA's SAME places stride-2 windows differently from
    torch's pad=1, which would shift every feature map half a pixel."""
    k = p["kernel"]
    pad = (k.shape[0] - 1) // 2
    y = jax.lax.conv_general_dilated(
        x,
        k.astype(x.dtype),
        window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    y = y * p["scale"] + p["bias"]
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(x.dtype)


def _avgpool2(x):
    """2x2 stride-2 average pool (torch AvgPool2d(2); all feature maps here
    have even spatial dims)."""
    y = jax.lax.reduce_window(
        x.astype(jnp.float32),
        0.0,
        jax.lax.add,
        (1, 2, 2, 1),
        (1, 2, 2, 1),
        "VALID",
    )
    return (y * 0.25).astype(x.dtype)


def _bottleneck(x, p, *, stride: int):
    out = _conv(x, p["conv1"])
    out = _conv(out, p["conv2"])
    if stride > 1:
        out = _avgpool2(out)
    out = _conv(out, p["conv3"], relu=False)
    if "down" in p:
        idn = _avgpool2(x) if stride > 1 else x
        idn = _conv(idn, p["down"], relu=False)
    else:
        idn = x
    y = out.astype(jnp.float32) + idn.astype(jnp.float32)
    return jnp.maximum(y, 0.0).astype(x.dtype)


def _attnpool(x, p, heads: int, compute_dtype):
    b, h, w, c = x.shape
    t = x.reshape(b, h * w, c)
    mean = jnp.mean(t.astype(jnp.float32), axis=1, keepdims=True).astype(
        t.dtype
    )
    t = jnp.concatenate([mean, t], axis=1)  # (B, S+1, C), mean token first
    t = t + p["pos_emb"].astype(t.dtype)

    def dense(v, wname, bname):
        y = jnp.dot(
            v,
            p[wname].astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )
        return y + p[bname].astype(jnp.float32)

    dh = c // heads
    q = dense(t[:, :1], "wq", "bq").reshape(b, 1, heads, dh)
    k = dense(t, "wk", "bk").reshape(b, -1, heads, dh)
    v = dense(t, "wv", "bv").reshape(b, -1, heads, dh)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) * dh**-0.5  # f32
    attn = jax.nn.softmax(scores, axis=-1)
    o = jnp.einsum("bhqk,bkhd->bqhd", attn, v.astype(jnp.float32))
    o = o.reshape(b, 1, c)[:, 0].astype(compute_dtype)
    return jnp.dot(
        o, p["wc"].astype(compute_dtype), preferred_element_type=jnp.float32
    ) + p["bc"].astype(jnp.float32)


def forward_visual(
    vp: Params, cfg: CLIPConfig, x: jax.Array, compute_dtype
) -> jax.Array:
    """CLIP-normalized float (B,H,W,3) -> unprojected-unnormalized (B, embed_dim)."""
    x = x.astype(compute_dtype)
    x = _conv(x, vp["stem"]["conv1"], stride=2)
    x = _conv(x, vp["stem"]["conv2"])
    x = _conv(x, vp["stem"]["conv3"])
    x = _avgpool2(x)
    for si, stage in enumerate(vp["stages"]):
        x = _bottleneck(x, stage["head"], stride=1 if si == 0 else 2)
        if stage["tail"] is not None:

            def body(carry, block_p):
                return _bottleneck(carry, block_p, stride=1), None

            x, _ = jax.lax.scan(body, x, stage["tail"])
    return _attnpool(
        x, vp["attnpool"], cfg.vision_heads, compute_dtype
    ).astype(jnp.float32)
