"""Checkpoint conversion tool: torch/HF CLIP checkpoints → fast-loading npz.

Usage:
  clip-retrieval-tpu convert --checkpoint /path/model.pt --output /out.npz \
      --clip_model ViT-L/14

The npz holds the original (state-dict-style) arrays; loading goes through
the same `loaders.convert_state_dict` path as torch files but without
importing torch at serve time.
"""

from __future__ import annotations

import os

import numpy as np


def convert(
    checkpoint: str,
    output: str,
    clip_model: str | None = None,
):
    """Convert a torch/HF CLIP checkpoint file to an npz state dict."""
    import torch

    obj = torch.load(checkpoint, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        sd = obj.state_dict()
    elif isinstance(obj, dict):
        sd = obj.get("state_dict", obj)
    else:
        raise ValueError(f"unrecognized checkpoint object {type(obj)}")
    arrays = {}
    for k, v in sd.items():
        try:
            arrays[k] = v.detach().cpu().numpy()
        except TypeError:  # torch bf16 has no numpy dtype
            arrays[k] = v.detach().cpu().float().numpy()
        except AttributeError:
            arrays[k] = np.asarray(v)
    if not output.endswith(".npz"):
        # np.savez appends .npz itself; normalize so the validation step
        # and returned path point at the file actually written
        output += ".npz"
    np.savez(output, **arrays)
    print(f"wrote {len(arrays)} arrays to {output}")
    if clip_model:
        # validation: the converted dict must load into the target config
        from . import loaders
        from .configs import get_config

        params, _ = loaders.load_checkpoint(output, get_config(clip_model))
        n = sum(int(np.prod(x.shape)) for x in _tree_leaves(params))
        print(f"validated against {clip_model}: {n/1e6:.1f}M params")
    return output


def _tree_leaves(tree):
    import jax

    return jax.tree.leaves(tree)


def keras_nsfw_weights(model_dir: str):
    """Extract the published autokeras NSFW classifier's weights
    (reference downloads + `load_model`s it, `clip_back.py:724-766`) into
    our plain [(W, b)] MLP form, reading the SavedModel's variables
    directly via the checkpoint reader — no autokeras needed, and the
    Normalization layer is folded into the first dense layer.

    Returns (weights, final_activation): final_activation is "sigmoid"
    for the binary L/14 head, "softmax" for the multi-class B/32 head.
    """
    import re

    import tensorflow as tf  # baked-in; used only at conversion time

    prefix = os.path.join(model_dir, "variables", "variables")
    groups: dict[int, dict[str, np.ndarray]] = {}
    reader = tf.train.load_checkpoint(prefix)
    for name, _ in tf.train.list_variables(prefix):
        m = re.match(r"layer_with_weights-(\d+)/(\w+)/", name)
        if not m:
            continue
        groups.setdefault(int(m.group(1)), {})[m.group(2)] = reader.get_tensor(
            name
        )
    if not groups:
        raise ValueError(f"no layer variables found under {prefix}")
    norm = None
    weights = []
    for _, g in sorted(groups.items()):
        if "mean" in g and "variance" in g:
            norm = (np.asarray(g["mean"], np.float32),
                    np.asarray(g["variance"], np.float32))
        elif "kernel" in g:
            weights.append(
                (np.asarray(g["kernel"], np.float32),
                 np.asarray(g.get("bias", np.zeros(g["kernel"].shape[1])),
                            np.float32))
            )
    if not weights:
        raise ValueError(f"no dense layers found under {prefix}")
    if norm is not None:
        # fold (x - mean)/std into the first dense: x@(W/std) + (b - (mean/std)@W)
        mean, var = norm
        std = np.maximum(np.sqrt(var), 1e-7)
        w0, b0 = weights[0]
        weights[0] = (w0 / std[:, None], b0 - (mean / std) @ w0)
    final_act = "sigmoid" if weights[-1][0].shape[1] == 1 else "softmax"
    return weights, final_act


def convert_keras_nsfw(model_path: str, output: str) -> str:
    """CLI: autokeras NSFW SavedModel (dir or .zip) → nsfw_mlp.npz."""
    import tempfile
    import zipfile

    if model_path.endswith(".zip"):
        tmp = tempfile.mkdtemp()
        with zipfile.ZipFile(model_path) as z:
            z.extractall(tmp)
        entries = [
            d for d in os.listdir(tmp)
            if os.path.isdir(os.path.join(tmp, d))
        ]
        model_path = os.path.join(tmp, entries[0]) if entries else tmp
    weights, final_act = keras_nsfw_weights(model_path)
    from .safety import save_mlp_npz

    save_mlp_npz(output, weights, final_activation=final_act,
                 relu_last_n_skipped=1)
    print(
        f"wrote {len(weights)}-layer MLP (final={final_act}) to {output}"
    )
    return output
