"""Checkpoint conversion tool: torch/HF CLIP checkpoints → fast-loading npz.

Usage:
  clip-retrieval-tpu convert --checkpoint /path/model.pt --output /out.npz \
      --clip_model ViT-L/14

The npz holds the original (state-dict-style) arrays; loading goes through
the same `loaders.convert_state_dict` path as torch files but without
importing torch at serve time.
"""

from __future__ import annotations

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
        except AttributeError:
            arrays[k] = np.asarray(v)
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
