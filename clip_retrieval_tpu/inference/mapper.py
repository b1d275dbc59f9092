"""Mapper: batches → L2-normalized fp16 embeddings on TPU.

Reference contract (`/root/reference/clip_retrieval/clip_inference/mapper.py:
49-78`): input batch dict with "image_tensor"/"text_tokens" → output dict with
"image_embs"/"text_embs" as L2-normalized **fp16 numpy**, passing
"image_filename"/"text"/"metadata" through.

TPU-first execution:
- the whole embed step (uint8→float normalize → ViT/text towers → L2-norm →
  fp16 cast) is ONE jitted XLA program; only uint8 pixels and int32 tokens
  cross host→HBM, only fp16 embeddings come back;
- batches are padded to a fixed shape (no recompiles on ragged final
  batches) and sharded across all local TPU cores on a 1-D "dp" mesh —
  the reference leaves intra-host cores idle (1 process = 1 GPU);
- params live replicated on device in the compute dtype (bf16 by default on
  TPU: ViT inference is MXU-bound and bf16 doubles MXU throughput).
- dispatch is async (JAX): the host can decode batch N+1 while the device
  runs batch N; `np.asarray` on the result is the sync point.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models import clip as jclip
from ..models import zoo
from ..parallel.mesh import local_mesh


class ClipMapper:
    """Callable mapping reader batches to embedding dicts."""

    def __init__(
        self,
        enable_image: bool,
        enable_text: bool,
        clip_model: str = "ViT-B/32",
        use_mclip: bool = False,
        mclip_model: str = "",
        checkpoint: str | None = None,
        batch_size: int = 256,
        compute_dtype: str = "auto",
        warmup_batch_size: int | None = None,
    ):
        self.enable_image = enable_image
        self.enable_text = enable_text
        self.batch_size = batch_size
        self.use_mclip = use_mclip
        self.mclip = None
        if use_mclip:
            # reference mapper swaps the text path for sentence-transformers
            # mCLIP (mapper.py:44-47,62-63); ours loads a local checkpoint
            from ..models.mclip import load_mclip

            self.mclip = load_mclip(mclip_model)
        self.bundle = zoo.load_model(clip_model, checkpoint)
        cfg = self.bundle.cfg
        on_tpu = jax.devices()[0].platform == "tpu"
        if compute_dtype == "auto":
            compute_dtype = "bfloat16" if on_tpu else "float32"
        self.compute_dtype = jnp.dtype(compute_dtype)

        self.mesh = local_mesh()
        self.n_dev = self.mesh.devices.size
        rep = NamedSharding(self.mesh, P())
        dp = NamedSharding(self.mesh, P("dp"))
        self.dp_sharding = dp
        # params: replicated once, in fp32 (matmul inputs are cast per-use)
        self.params = jax.device_put(self.bundle.params, rep)

        cdt = self.compute_dtype

        def _embed_images(params, images):
            feats = jclip.encode_image(params, cfg, images, compute_dtype=cdt)
            return feats.astype(jnp.float16)

        def _embed_texts(params, tokens):
            feats = jclip.encode_text(params, cfg, tokens, compute_dtype=cdt)
            return feats.astype(jnp.float16)

        self._embed_images = jax.jit(
            _embed_images,
            in_shardings=(rep, dp),
            out_shardings=dp,
        )
        self._embed_texts = jax.jit(
            _embed_texts,
            in_shardings=(rep, dp),
            out_shardings=dp,
        )
        if warmup_batch_size:
            self.warmup(warmup_batch_size)

    # -- helpers ----------------------------------------------------------

    def pad_batch(self, arr: np.ndarray) -> tuple[np.ndarray, int]:
        """Pad leading dim to the fixed batch size (≥ multiple of n_dev)."""
        n = arr.shape[0]
        target = max(self.batch_size, self.n_dev)
        if target % self.n_dev:
            target += self.n_dev - target % self.n_dev
        if n < target:
            pad = np.zeros((target - n, *arr.shape[1:]), dtype=arr.dtype)
            arr = np.concatenate([arr, pad])
        return arr, n

    _padded = pad_batch  # backwards-compatible alias

    def warmup(self, batch_size: int | None = None):
        if batch_size and batch_size > self.batch_size:
            # every production batch is padded to exactly self.batch_size —
            # a larger warmup would compile minutes of never-used program
            # while leaving the real shape cold
            print(
                f"warmup_batch_size {batch_size} > batch_size "
                f"{self.batch_size}: warming the production shape instead"
            )
            batch_size = None
        cfg = self.bundle.cfg
        if self.enable_image:
            imgs = np.zeros(
                (batch_size or self.batch_size, cfg.image_size, cfg.image_size, 3),
                np.uint8,
            )
            np.asarray(self._embed_padded_images(imgs))
        if self.enable_text:
            toks = np.zeros(
                (batch_size or self.batch_size, cfg.context_length), np.int32
            )
            np.asarray(self._embed_padded_texts(toks))

    def _embed_padded_images(self, images: np.ndarray) -> jax.Array:
        padded, n = self._padded(images)
        return self._embed_images(self.params, padded)[:n]

    def _embed_padded_texts(self, tokens: np.ndarray) -> jax.Array:
        padded, n = self._padded(tokens.astype(np.int32))
        return self._embed_texts(self.params, padded)[:n]

    # -- main entry -------------------------------------------------------

    def __call__(self, batch: dict[str, Any]) -> dict[str, Any]:
        from .staging import STAGED_KEY

        out: dict[str, Any] = {}
        img_dev = txt_dev = None
        staged_n = batch.get(STAGED_KEY)
        # dispatch both towers before synchronizing either (async dispatch)
        if self.enable_image:
            if staged_n is not None:  # already padded + device-resident
                img_dev = self._embed_images(self.params, batch["image_tensor"])[
                    :staged_n
                ]
            else:
                img_dev = self._embed_padded_images(batch["image_tensor"])
        if self.enable_text:
            if self.mclip is not None:
                # mCLIP encodes from raw text (reference mapper.py:62-63)
                out["text_embs"] = self.mclip(batch["text"])
                out["text"] = batch["text"]
            elif staged_n is not None:
                txt_dev = self._embed_texts(self.params, batch["text_tokens"])[
                    :staged_n
                ]
            else:
                txt_dev = self._embed_padded_texts(batch["text_tokens"])
        if img_dev is not None:
            out["image_embs"] = np.asarray(img_dev)
            out["image_filename"] = batch["image_filename"]
        if txt_dev is not None:
            out["text_embs"] = np.asarray(txt_dev)
            out["text"] = batch["text"]
        if "metadata" in batch:
            out["metadata"] = batch["metadata"]
        return out
