"""Safety / violence / aesthetic heads as small JAX models.

Reference counterparts (`/root/reference/clip_retrieval/clip_back.py:656-766`,
`h14_nsfw_model.py`): an autokeras NSFW classifier (B/32, L/14), a torch MLP
NSFW detector (H/14), prompt-embedding violence detection, and aesthetic
rating embeddings added to the query.  Here they are all JAX: the MLP runs
jitted on TPU in the query path, violence/aesthetic are tiny einsums.

This environment has zero egress, so weights load from the local cache
(`~/.cache/clip_retrieval_tpu/` or the reference's `~/.cache/clip_retrieval/`
for the H14 .pth). Downloads are attempted only with CRT_ALLOW_DOWNLOAD=1.
Missing weights → None (the corresponding serving option degrades off with a
warning), keeping boot robust offline.
"""

from __future__ import annotations

import functools
import os
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

H14_LAYER_DIMS = [1024, 2048, 1024, 256, 128, 16, 1]  # after the input dim


def cache_folder(clip_model: str) -> str:
    home = os.path.expanduser("~")
    folder = os.path.join(
        home, ".cache", "clip_retrieval_tpu", clip_model.replace("/", "_")
    )
    os.makedirs(folder, exist_ok=True)
    return folder


class JaxMLP:
    """ReLU MLP matching the reference's H14 NSFW detector topology
    (`h14_nsfw_model.py:17-34`): ReLU after all but the last two layers."""

    def __init__(self, weights: List[Tuple[np.ndarray, np.ndarray]],
                 relu_last_n_skipped: int = 2):
        self.weights = [
            (jnp.asarray(w, jnp.float32), jnp.asarray(b, jnp.float32))
            for w, b in weights
        ]
        self.skip = relu_last_n_skipped

        n = len(self.weights)

        def forward(x, weights):
            for i, (w, b) in enumerate(weights):
                x = jnp.dot(x, w, preferred_element_type=jnp.float32) + b
                if i < n - self.skip:
                    x = jnp.maximum(x, 0.0)
            return x

        self._fn = jax.jit(lambda x: forward(x, self.weights))

    def predict(self, embeddings: np.ndarray, batch_size: int | None = None):
        """autokeras-compatible interface (returns (n, 1) scores)."""
        out = self._fn(jnp.asarray(embeddings, jnp.float32))
        return np.asarray(out)

    @classmethod
    def random(cls, input_dim: int, seed: int = 0) -> "JaxMLP":
        """Random-weight instance (tests only)."""
        rng = np.random.default_rng(seed)
        dims = [input_dim] + H14_LAYER_DIMS
        weights = [
            (
                rng.normal(size=(a, b)).astype(np.float32) / np.sqrt(a),
                np.zeros((b,), np.float32),
            )
            for a, b in zip(dims[:-1], dims[1:])
        ]
        return cls(weights)


def _torch_mlp_to_weights(state_dict) -> List[Tuple[np.ndarray, np.ndarray]]:
    """torch nn.Sequential state dict (layers.N.weight/bias) → [(W, b)]."""
    idxs = sorted(
        {
            int(k.split(".")[1])
            for k in state_dict
            if k.startswith("layers.") and k.endswith(".weight")
        }
    )
    out = []
    for i in idxs:
        w = np.asarray(state_dict[f"layers.{i}.weight"])
        b = np.asarray(state_dict[f"layers.{i}.bias"])
        out.append((w.T, b))  # torch stores (out, in)
    return out


def load_safety_model(clip_model: str) -> Optional[JaxMLP]:
    """Load an NSFW scorer for this model's embedding space, or None."""
    candidates = [
        os.path.join(cache_folder(clip_model), "nsfw_mlp.npz"),
        os.path.expanduser("~/.cache/clip_retrieval/h14_nsfw_model/model.pt"),
    ]
    for path in candidates:
        if not os.path.exists(path):
            continue
        if path.endswith(".npz"):
            with np.load(path) as z:
                n = len([k for k in z.files if k.startswith("w")])
                weights = [(z[f"w{i}"], z[f"b{i}"]) for i in range(n)]
            return JaxMLP(weights)
        try:
            import torch

            sd = torch.load(path, map_location="cpu", weights_only=False)
            return JaxMLP(_torch_mlp_to_weights(sd))
        except Exception as e:  # pragma: no cover
            print(f"failed to load NSFW model from {path}: {e}")
    print(
        f"WARNING: no NSFW model weights found for {clip_model}; "
        "use_safety_model requests will be ignored"
    )
    return None


def save_mlp_npz(path: str, weights: List[Tuple[np.ndarray, np.ndarray]]):
    arrays = {}
    for i, (w, b) in enumerate(weights):
        arrays[f"w{i}"] = np.asarray(w)
        arrays[f"b{i}"] = np.asarray(b)
    np.savez(path, **arrays)


def load_violence_detector(clip_model: str) -> Optional[np.ndarray]:
    """(n_prompts, d) prompt embeddings; column 1 = violent class
    (reference clip_back.py:699-721)."""
    name = "violence_detection_" + clip_model.replace("/", "_").replace(
        "-", "_"
    ).lower() + ".npy"
    for folder in (
        cache_folder(clip_model),
        os.path.expanduser(
            "~/.cache/clip_retrieval/" + clip_model.replace("/", "_")
        ),
    ):
        path = os.path.join(folder, name)
        if os.path.exists(path):
            return np.load(path)
    print(
        f"WARNING: no violence-detector prompts for {clip_model}; "
        "use_violence_detector requests will be ignored"
    )
    return None


def get_aesthetic_embedding(clip_model: str) -> Optional[dict[int, np.ndarray]]:
    """rating k → (1, d) embedding, loaded from cache
    (reference clip_back.py:671-696 fetches them from github)."""
    folder = os.path.join(cache_folder(clip_model), "aesthetic")
    embs = {}
    for k in range(10):
        path = os.path.join(folder, f"rating{k}.npy")
        if os.path.exists(path):
            embs[k] = np.load(path)
    if not embs:
        print(
            f"WARNING: no aesthetic embeddings cached for {clip_model}; "
            "aesthetic steering disabled"
        )
        return None
    return embs


@functools.partial(jax.jit)
def violence_scores(embeddings: jax.Array, prompts: jax.Array) -> jax.Array:
    """argmax over prompt classes; class 1 = violent."""
    preds = jnp.einsum(
        "ij,kj->ik", embeddings, prompts, preferred_element_type=jnp.float32
    )
    return jnp.argmax(preds, axis=1)
