"""Safety / violence / aesthetic heads as small JAX models.

Reference counterparts (`/root/reference/clip_retrieval/clip_back.py:656-766`,
`h14_nsfw_model.py`): an autokeras NSFW classifier (B/32, L/14), a torch MLP
NSFW detector (H/14), prompt-embedding violence detection, and aesthetic
rating embeddings added to the query.  Here they are all JAX: the MLP runs
jitted on TPU in the query path, violence/aesthetic are tiny einsums.

Weights load from the local cache (`~/.cache/clip_retrieval_tpu/` or the
reference's `~/.cache/clip_retrieval/` layout, including the published
autokeras SavedModel dirs, converted on first use). With
CRT_ALLOW_DOWNLOAD=1 the published artifacts are fetched from github
exactly as the reference does (`clip_back.py:671-766`). Missing weights →
None (the corresponding serving option degrades off with a warning),
keeping boot robust offline.
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
    """ReLU MLP covering both reference NSFW heads: the torch H14 detector
    (`h14_nsfw_model.py:17-34`, ReLU after all but the last two layers, raw
    output) and the converted autokeras classifiers (`clip_back.py:724-766`,
    ReLU between layers, sigmoid/softmax output)."""

    def __init__(self, weights: List[Tuple[np.ndarray, np.ndarray]],
                 relu_last_n_skipped: int = 2,
                 final_activation: str | None = None):
        self.weights = [
            (jnp.asarray(w, jnp.float32), jnp.asarray(b, jnp.float32))
            for w, b in weights
        ]
        self.skip = relu_last_n_skipped
        self.final_activation = final_activation

        n = len(self.weights)

        def forward(x, weights):
            for i, (w, b) in enumerate(weights):
                x = jnp.dot(x, w, preferred_element_type=jnp.float32) + b
                if i < n - self.skip:
                    x = jnp.maximum(x, 0.0)
            if final_activation == "sigmoid":
                x = jax.nn.sigmoid(x)
            elif final_activation == "softmax":
                x = jax.nn.softmax(x, axis=-1)
            return x

        # weights as jit args (closure capture bakes them into the HLO as
        # constants and defeats the persistent compilation cache)
        self._dev_weights = jax.device_put(
            [(jnp.asarray(w), jnp.asarray(b)) for w, b in self.weights]
        )
        self._jit_forward = jax.jit(forward)
        self._fn = lambda x: self._jit_forward(x, self._dev_weights)

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


_NSFW_ZIP_URLS = {
    # reference clip_back.py:745-752
    "ViT-L/14": (
        "https://raw.githubusercontent.com/LAION-AI/CLIP-based-NSFW-Detector"
        "/main/clip_autokeras_binary_nsfw.zip",
        "clip_autokeras_binary_nsfw",
    ),
    "ViT-B/32": (
        "https://raw.githubusercontent.com/LAION-AI/CLIP-based-NSFW-Detector"
        "/main/clip_autokeras_nsfw_b32.zip",
        "clip_autokeras_nsfw_b32",
    ),
}


def _downloads_allowed() -> bool:
    return os.environ.get("CRT_ALLOW_DOWNLOAD") == "1"


def _reference_cache(clip_model: str) -> str:
    return os.path.expanduser(
        "~/.cache/clip_retrieval/" + clip_model.replace("/", "_")
    )


def _maybe_download(url: str, dest: str) -> bool:
    """Fetch url → dest when CRT_ALLOW_DOWNLOAD=1; False otherwise/on error."""
    if not _downloads_allowed():
        return False
    try:  # pragma: no cover — no egress in CI
        from urllib.request import urlretrieve

        os.makedirs(os.path.dirname(dest), exist_ok=True)
        urlretrieve(url, dest)
        return True
    except Exception as e:
        print(f"download of {url} failed: {e}")
        return False


def _keras_nsfw_dir(clip_model: str) -> Optional[str]:
    """Locate (or, with CRT_ALLOW_DOWNLOAD=1, fetch+unzip) the published
    autokeras SavedModel for this clip model — the exact artifacts the
    reference consumes (`clip_back.py:724-766`)."""
    if clip_model not in _NSFW_ZIP_URLS:
        return None
    url, dirname = _NSFW_ZIP_URLS[clip_model]
    for root in (cache_folder(clip_model), _reference_cache(clip_model)):
        d = os.path.join(root, dirname)
        if os.path.isdir(d):
            return d
    zip_path = os.path.join(cache_folder(clip_model), dirname + ".zip")
    if _maybe_download(url, zip_path):  # pragma: no cover
        import zipfile

        with zipfile.ZipFile(zip_path) as z:
            z.extractall(cache_folder(clip_model))
        d = os.path.join(cache_folder(clip_model), dirname)
        if os.path.isdir(d):
            return d
    return None


def load_safety_model(clip_model: str) -> Optional[JaxMLP]:
    """Load an NSFW scorer for this model's embedding space, or None.

    Sources, in order: converted npz in our cache; the published autokeras
    SavedModel in either cache layout (converted on the fly, then cached as
    npz); the reference's torch H14 checkpoint.  With CRT_ALLOW_DOWNLOAD=1
    the published zips are fetched like the reference does."""
    npz_path = os.path.join(cache_folder(clip_model), "nsfw_mlp.npz")
    candidates = [npz_path]
    if clip_model == "open_clip:ViT-H-14":
        # the torch H14 checkpoint expects 1024-d embeddings — loading it
        # for another model's space would shape-error every safety query
        # (reference clip_back.py:725-766 dispatches strictly by model)
        candidates.append(
            os.path.expanduser(
                "~/.cache/clip_retrieval/h14_nsfw_model/model.pt"
            )
        )
    for path in candidates:
        if not os.path.exists(path):
            continue
        if path.endswith(".npz"):
            return load_mlp_npz(path)
        try:
            import torch

            sd = torch.load(path, map_location="cpu", weights_only=False)
            return JaxMLP(_torch_mlp_to_weights(sd))
        except Exception as e:  # pragma: no cover
            print(f"failed to load NSFW model from {path}: {e}")
    keras_dir = _keras_nsfw_dir(clip_model)
    if keras_dir is not None:
        try:
            from .convert import keras_nsfw_weights

            weights, final_act = keras_nsfw_weights(keras_dir)
            save_mlp_npz(
                npz_path, weights,
                final_activation=final_act, relu_last_n_skipped=1,
            )
            return JaxMLP(
                weights, relu_last_n_skipped=1, final_activation=final_act
            )
        except Exception as e:
            print(f"failed to convert keras NSFW model {keras_dir}: {e}")
    h14_url = (
        "https://github.com/LAION-AI/CLIP-based-NSFW-Detector/raw/main/"
        "h14_nsfw.pth"
    )
    h14_path = os.path.expanduser(
        "~/.cache/clip_retrieval/h14_nsfw_model/model.pt"
    )
    if (
        clip_model == "open_clip:ViT-H-14"
        and not os.path.exists(h14_path)  # candidates loop already tried it
        and _maybe_download(h14_url, h14_path)
    ):  # pragma: no cover
        # load the fetched file directly — recursing would re-download and
        # recurse forever if the artifact is unloadable (e.g. an error page)
        try:
            import torch

            sd = torch.load(h14_path, map_location="cpu", weights_only=False)
            return JaxMLP(_torch_mlp_to_weights(sd))
        except Exception as e:
            print(f"downloaded H14 NSFW checkpoint failed to load: {e}")
    print(
        f"WARNING: no NSFW model weights found for {clip_model}; "
        "use_safety_model requests will be ignored"
    )
    return None


def save_mlp_npz(
    path: str,
    weights: List[Tuple[np.ndarray, np.ndarray]],
    final_activation: str | None = None,
    relu_last_n_skipped: int = 2,
):
    arrays = {}
    for i, (w, b) in enumerate(weights):
        arrays[f"w{i}"] = np.asarray(w)
        arrays[f"b{i}"] = np.asarray(b)
    arrays["final_activation"] = np.asarray(final_activation or "")
    arrays["relu_last_n_skipped"] = np.asarray(relu_last_n_skipped)
    np.savez(path, **arrays)


def load_mlp_npz(path: str) -> JaxMLP:
    with np.load(path) as z:
        n = len([k for k in z.files if k.startswith("w")])
        weights = [(z[f"w{i}"], z[f"b{i}"]) for i in range(n)]
        final_act = (
            str(z["final_activation"]) if "final_activation" in z.files else ""
        )
        skip = (
            int(z["relu_last_n_skipped"])
            if "relu_last_n_skipped" in z.files
            else 2
        )
    return JaxMLP(
        weights, relu_last_n_skipped=skip,
        final_activation=final_act or None,
    )


def load_violence_detector(clip_model: str) -> Optional[np.ndarray]:
    """(n_prompts, d) prompt embeddings; column 1 = violent class
    (reference clip_back.py:699-721)."""
    name = "violence_detection_" + clip_model.replace("/", "_").replace(
        "-", "_"
    ).lower() + ".npy"
    for folder in (cache_folder(clip_model), _reference_cache(clip_model)):
        path = os.path.join(folder, name)
        if os.path.exists(path):
            return np.load(path)
    url = (
        "https://github.com/LAION-AI/CLIP-based-NSFW-Detector/raw/main/"
        + name
    )  # reference clip_back.py:699-721
    dest = os.path.join(cache_folder(clip_model), name)
    if _maybe_download(url, dest):  # pragma: no cover
        return np.load(dest)
    print(
        f"WARNING: no violence-detector prompts for {clip_model}; "
        "use_violence_detector requests will be ignored"
    )
    return None


def get_aesthetic_embedding(clip_model: str) -> Optional[dict[int, np.ndarray]]:
    """rating k → (1, d) embedding (reference clip_back.py:671-696).

    Loads from our cache, the reference's layout, or — with
    CRT_ALLOW_DOWNLOAD=1 — fetches the LAION aesthetic-predictor rating
    embeddings from github exactly as the reference does."""
    tag = {"ViT-B/32": "vit_b_32", "ViT-L/14": "vit_l_14"}.get(clip_model)
    folders = [
        os.path.join(cache_folder(clip_model), "aesthetic"),
        os.path.join(_reference_cache(clip_model), "aesthetic"),
    ]
    for folder in folders:
        embs = {}
        for k in range(10):
            path = os.path.join(folder, f"rating{k}.npy")
            if os.path.exists(path):
                embs[k] = np.load(path)
        if len(embs) == 10:
            return embs
    if tag and _downloads_allowed():  # pragma: no cover — no egress in CI
        folder = folders[0]
        os.makedirs(folder, exist_ok=True)
        ok = all(
            _maybe_download(
                "https://github.com/LAION-AI/aesthetic-predictor/blob/main/"
                f"{tag}_embeddings/rating{k}.npy?raw=true",
                os.path.join(folder, f"rating{k}.npy"),
            )
            for k in range(10)
        )
        if ok:
            return {
                k: np.load(os.path.join(folder, f"rating{k}.npy"))
                for k in range(10)
            }
    print(
        f"WARNING: no aesthetic embeddings cached for {clip_model}; "
        "aesthetic steering disabled"
    )
    return None


@functools.partial(jax.jit)
def violence_scores(embeddings: jax.Array, prompts: jax.Array) -> jax.Array:
    """argmax over prompt classes; class 1 = violent."""
    preds = jnp.einsum(
        "ij,kj->ik", embeddings, prompts, preferred_element_type=jnp.float32
    )
    return jnp.argmax(preds, axis=1)
