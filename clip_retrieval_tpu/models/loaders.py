"""Checkpoint loading: torch/HF CLIP weights → our functional param tree.

The reference gets models from `all_clip.load_clip` which dispatches to
openai-clip / open_clip / HF transformers
(`/root/reference/clip_retrieval/clip_inference/mapper.py:36`).  We accept the
same checkpoint families and convert them into the stacked-layer layout used
by `clip.py` (leading layer axis, x@W kernels):

- HF `transformers.CLIPModel` state dicts  (keys `vision_model.*`)
- openai CLIP / open_clip state dicts      (keys `visual.*`, fused in_proj)

All conversion is numpy-only; torch tensors are accepted and detached.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax.numpy as jnp
import numpy as np

from .configs import CLIPConfig
from .clip import Params


def _np(x) -> np.ndarray:
    if isinstance(x, np.ndarray):
        return x
    # torch tensor (cpu) or anything with .numpy()
    try:
        return x.detach().cpu().numpy()
    except TypeError:
        # torch bf16/fp8 tensors have no numpy dtype — upcast first
        # (bfloat16 checkpoints are common for modern finetunes)
        return x.detach().cpu().float().numpy()
    except AttributeError:
        return np.asarray(x)


def _stack(sd: Mapping[str, np.ndarray], fmt: str, n: int, **kw) -> np.ndarray:
    return np.stack([_np(sd[fmt.format(i=i, **kw)]) for i in range(n)])


# ---------------------------------------------------------------------------
# HF transformers CLIPModel
# ---------------------------------------------------------------------------


def _convert_hf_tower(sd, prefix: str, n_layers: int):
    """One HF encoder tower → stacked block params."""
    L = prefix + ".encoder.layers.{i}."

    def ws(name):  # linear weight, (out,in) → (L, in, out)
        return _stack(sd, L + name + ".weight", n_layers).transpose(0, 2, 1)

    def bs(name):
        return _stack(sd, L + name + ".bias", n_layers)

    return {
        "ln_1": {
            "scale": _stack(sd, L + "layer_norm1.weight", n_layers),
            "bias": _stack(sd, L + "layer_norm1.bias", n_layers),
        },
        "attn": {
            "wq": ws("self_attn.q_proj"),
            "wk": ws("self_attn.k_proj"),
            "wv": ws("self_attn.v_proj"),
            "wo": ws("self_attn.out_proj"),
            "bq": bs("self_attn.q_proj"),
            "bk": bs("self_attn.k_proj"),
            "bv": bs("self_attn.v_proj"),
            "bo": bs("self_attn.out_proj"),
        },
        "ln_2": {
            "scale": _stack(sd, L + "layer_norm2.weight", n_layers),
            "bias": _stack(sd, L + "layer_norm2.bias", n_layers),
        },
        "mlp": {
            "w_in": ws("mlp.fc1"),
            "b_in": bs("mlp.fc1"),
            "w_out": ws("mlp.fc2"),
            "b_out": bs("mlp.fc2"),
        },
    }


def convert_hf_state_dict(sd: Mapping[str, Any], cfg: CLIPConfig) -> Params:
    sd = {k: v for k, v in sd.items()}
    g = lambda k: _np(sd[k])
    # HF has a typo'd key "pre_layrnorm" in CLIPVisionTransformer
    pre_ln = (
        "vision_model.pre_layrnorm"
        if "vision_model.pre_layrnorm.weight" in sd
        else "vision_model.pre_layernorm"
    )
    visual = {
        "patch_embed": {
            # (W, 3, P, P) → (P, P, 3, W)
            "kernel": g(
                "vision_model.embeddings.patch_embedding.weight"
            ).transpose(2, 3, 1, 0)
        },
        "class_emb": g("vision_model.embeddings.class_embedding").reshape(-1),
        "pos_emb": g("vision_model.embeddings.position_embedding.weight"),
        "ln_pre": {
            "scale": g(pre_ln + ".weight"),
            "bias": g(pre_ln + ".bias"),
        },
        "blocks": _convert_hf_tower(sd, "vision_model", cfg.vision_layers),
        "ln_post": {
            "scale": g("vision_model.post_layernorm.weight"),
            "bias": g("vision_model.post_layernorm.bias"),
        },
        "proj": g("visual_projection.weight").T,
    }
    text = {
        "token_emb": g("text_model.embeddings.token_embedding.weight"),
        "pos_emb": g("text_model.embeddings.position_embedding.weight"),
        "blocks": _convert_hf_tower(sd, "text_model", cfg.text_layers),
        "ln_final": {
            "scale": g("text_model.final_layer_norm.weight"),
            "bias": g("text_model.final_layer_norm.bias"),
        },
        "proj": g("text_projection.weight").T,
    }
    return _to_jnp(
        {
            "visual": visual,
            "text": text,
            "logit_scale": _np(sd["logit_scale"]).reshape(()),
        }
    )


# ---------------------------------------------------------------------------
# openai CLIP / open_clip
# ---------------------------------------------------------------------------


def _convert_openai_tower(sd, prefix: str, n_layers: int, width: int):
    L = prefix + ".resblocks.{i}."
    in_w = _stack(sd, L + "attn.in_proj_weight", n_layers)  # (L, 3W, W)
    in_b = _stack(sd, L + "attn.in_proj_bias", n_layers)  # (L, 3W)
    wq, wk, wv = (
        in_w[:, :width].transpose(0, 2, 1),
        in_w[:, width : 2 * width].transpose(0, 2, 1),
        in_w[:, 2 * width :].transpose(0, 2, 1),
    )
    bq, bk, bv = in_b[:, :width], in_b[:, width : 2 * width], in_b[:, 2 * width :]
    return {
        "ln_1": {
            "scale": _stack(sd, L + "ln_1.weight", n_layers),
            "bias": _stack(sd, L + "ln_1.bias", n_layers),
        },
        "attn": {
            "wq": wq,
            "wk": wk,
            "wv": wv,
            "wo": _stack(sd, L + "attn.out_proj.weight", n_layers).transpose(
                0, 2, 1
            ),
            "bq": bq,
            "bk": bk,
            "bv": bv,
            "bo": _stack(sd, L + "attn.out_proj.bias", n_layers),
        },
        "ln_2": {
            "scale": _stack(sd, L + "ln_2.weight", n_layers),
            "bias": _stack(sd, L + "ln_2.bias", n_layers),
        },
        "mlp": {
            "w_in": _stack(sd, L + "mlp.c_fc.weight", n_layers).transpose(
                0, 2, 1
            ),
            "b_in": _stack(sd, L + "mlp.c_fc.bias", n_layers),
            "w_out": _stack(sd, L + "mlp.c_proj.weight", n_layers).transpose(
                0, 2, 1
            ),
            "b_out": _stack(sd, L + "mlp.c_proj.bias", n_layers),
        },
    }


def _fold_conv_bn(sd, conv_key: str, bn_key: str, eps: float = 1e-5):
    """Fold an inference BatchNorm into the preceding bias-free conv:
    y = gamma*(conv(x)-mean)/sqrt(var+eps)+beta == conv(x)*scale + bias.
    Conv weight (O,I,kh,kw) -> HWIO."""
    kernel = _np(sd[conv_key + ".weight"]).transpose(2, 3, 1, 0)
    gamma = _np(sd[bn_key + ".weight"]).astype(np.float64)
    beta = _np(sd[bn_key + ".bias"]).astype(np.float64)
    mean = _np(sd[bn_key + ".running_mean"]).astype(np.float64)
    var = _np(sd[bn_key + ".running_var"]).astype(np.float64)
    scale = gamma / np.sqrt(var + eps)
    return {
        "kernel": kernel,
        "scale": (scale).astype(np.float32),
        "bias": (beta - mean * scale).astype(np.float32),
    }


def convert_openai_resnet_visual(
    sd: Mapping[str, Any], cfg: CLIPConfig
) -> Params:
    """openai ModifiedResNet visual.* keys -> resnet.py param tree (BN
    folded, tail blocks of each stage stacked for lax.scan)."""
    g = lambda k: _np(sd[k])
    stem = {
        f"conv{i}": _fold_conv_bn(sd, f"visual.conv{i}", f"visual.bn{i}")
        for i in (1, 2, 3)
    }

    def block(prefix: str, down: bool):
        p = {
            f"conv{j}": _fold_conv_bn(
                sd, f"{prefix}.conv{j}", f"{prefix}.bn{j}"
            )
            for j in (1, 2, 3)
        }
        if down:
            p["down"] = _fold_conv_bn(
                sd, f"{prefix}.downsample.0", f"{prefix}.downsample.1"
            )
        return p

    stages = []
    for si, n_blocks in enumerate(cfg.resnet_layers):
        head = block(f"visual.layer{si + 1}.0", down=True)
        tail = None
        if n_blocks > 1:
            tails = [
                block(f"visual.layer{si + 1}.{i}", down=False)
                for i in range(1, n_blocks)
            ]
            import jax as _jax

            tail = _jax.tree.map(lambda *xs: np.stack(xs), *tails)
        stages.append({"head": head, "tail": tail})
    attnpool = {
        "pos_emb": g("visual.attnpool.positional_embedding"),
        "wq": g("visual.attnpool.q_proj.weight").T,
        "bq": g("visual.attnpool.q_proj.bias"),
        "wk": g("visual.attnpool.k_proj.weight").T,
        "bk": g("visual.attnpool.k_proj.bias"),
        "wv": g("visual.attnpool.v_proj.weight").T,
        "bv": g("visual.attnpool.v_proj.bias"),
        "wc": g("visual.attnpool.c_proj.weight").T,
        "bc": g("visual.attnpool.c_proj.bias"),
    }
    return {"stem": stem, "stages": stages, "attnpool": attnpool}


def convert_openai_state_dict(sd: Mapping[str, Any], cfg: CLIPConfig) -> Params:
    g = lambda k: _np(sd[k])
    if "visual.layer1.0.conv1.weight" in sd:
        text = {
            "token_emb": g("token_embedding.weight"),
            "pos_emb": g("positional_embedding"),
            "blocks": _convert_openai_tower(
                sd, "transformer", cfg.text_layers, cfg.text_width
            ),
            "ln_final": {
                "scale": g("ln_final.weight"),
                "bias": g("ln_final.bias"),
            },
            "proj": g("text_projection"),
        }
        return _to_jnp(
            {
                "visual": convert_openai_resnet_visual(sd, cfg),
                "text": text,
                "logit_scale": _np(sd["logit_scale"]).reshape(()),
            }
        )
    visual = {
        "patch_embed": {
            "kernel": g("visual.conv1.weight").transpose(2, 3, 1, 0)
        },
        "class_emb": g("visual.class_embedding").reshape(-1),
        "pos_emb": g("visual.positional_embedding"),
        "ln_pre": {
            "scale": g("visual.ln_pre.weight"),
            "bias": g("visual.ln_pre.bias"),
        },
        "blocks": _convert_openai_tower(
            sd, "visual.transformer", cfg.vision_layers, cfg.vision_width
        ),
        "ln_post": {
            "scale": g("visual.ln_post.weight"),
            "bias": g("visual.ln_post.bias"),
        },
        "proj": g("visual.proj"),
    }
    text = {
        "token_emb": g("token_embedding.weight"),
        "pos_emb": g("positional_embedding"),
        "blocks": _convert_openai_tower(
            sd, "transformer", cfg.text_layers, cfg.text_width
        ),
        "ln_final": {
            "scale": g("ln_final.weight"),
            "bias": g("ln_final.bias"),
        },
        "proj": g("text_projection"),
    }
    return _to_jnp(
        {
            "visual": visual,
            "text": text,
            "logit_scale": _np(sd["logit_scale"]).reshape(()),
        }
    )


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------


def _to_jnp(tree):
    import jax

    return jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), tree)


def detect_format(sd: Mapping[str, Any]) -> str:
    if any(k.startswith("vision_model.") for k in sd):
        return "hf"
    if any(k.startswith("visual.") for k in sd):
        return "openai"
    raise ValueError("unrecognized CLIP state dict format")


def convert_state_dict(sd: Mapping[str, Any], cfg: CLIPConfig) -> Params:
    fmt = detect_format(sd)
    if fmt == "hf":
        return convert_hf_state_dict(sd, cfg)
    return convert_openai_state_dict(sd, cfg)


def config_from_hf(hf_config) -> CLIPConfig:
    """Build a CLIPConfig from a transformers CLIPConfig."""
    v, t = hf_config.vision_config, hf_config.text_config
    return CLIPConfig(
        name=getattr(hf_config, "name_or_path", "hf") or "hf",
        embed_dim=hf_config.projection_dim,
        image_size=v.image_size,
        patch_size=v.patch_size,
        vision_width=v.hidden_size,
        vision_layers=v.num_hidden_layers,
        vision_heads=v.num_attention_heads,
        vision_mlp_ratio=v.intermediate_size / v.hidden_size,
        vocab_size=t.vocab_size,
        context_length=t.max_position_embeddings,
        text_width=t.hidden_size,
        text_layers=t.num_hidden_layers,
        text_heads=t.num_attention_heads,
        text_mlp_ratio=t.intermediate_size / t.hidden_size,
        act="quick_gelu" if v.hidden_act == "quick_gelu" else "gelu",
        layernorm_eps=v.layer_norm_eps,
    )


def load_checkpoint(path: str, cfg: CLIPConfig | None = None):
    """Load a .pt/.bin/.npz checkpoint from disk and convert.

    Returns (params, cfg).  cfg is inferred for HF checkpoints sitting next to
    a config.json when not given.
    """
    import os

    if path.endswith(".npz"):
        import numpy as _np_mod

        with _np_mod.load(path) as z:
            sd = {k: z[k] for k in z.files}
    else:
        import torch

        obj = torch.load(path, map_location="cpu", weights_only=False)
        sd = obj.get("state_dict", obj) if isinstance(obj, dict) else (
            obj.state_dict()
        )
    if cfg is None:
        cfg_path = os.path.join(os.path.dirname(path), "config.json")
        if os.path.exists(cfg_path):
            import json
            from transformers import CLIPConfig as HFCLIPConfig

            with open(cfg_path) as f:
                cfg = config_from_hf(HFCLIPConfig(**json.load(f)))
        else:
            raise ValueError("cfg required when no config.json is present")
    return convert_state_dict(sd, cfg), cfg
