"""Image preprocessing: host decode/resize/crop → uint8, device normalize.

The reference preprocesses per-item inside torch DataLoader workers using the
torchvision pipeline returned by `load_clip`
(`/root/reference/clip_retrieval/clip_inference/reader.py:101,163`), producing
fp32 CHW tensors on host.  TPU-first split instead:

- host side (this module): JPEG/PNG decode + bicubic shorter-side resize +
  center crop, staying in **uint8 HWC** — 12× less host→device traffic than
  fp32 CHW;
- device side: uint8 → float scale + CLIP mean/std normalization is fused
  into the jitted encoder (`clip.normalize_images`), so it rides the same XLA
  program as the ViT and costs no extra HBM round-trip.

A batched on-device resize path (`resize_on_device`) covers serving-time
image queries where the input arrives as raw RGB of arbitrary size.
"""

from __future__ import annotations

import io
from typing import Sequence

import numpy as np

try:
    from PIL import Image

    _HAS_PIL = True
except ImportError:  # pragma: no cover
    _HAS_PIL = False


def decode_resize_center_crop(data: bytes | "Image.Image", size: int) -> np.ndarray:
    """bytes/PIL image → (size, size, 3) uint8, CLIP-style bicubic + crop.

    Matches torchvision Resize(size, BICUBIC) + CenterCrop(size) + RGB
    conversion semantics.
    """
    if not _HAS_PIL:
        raise RuntimeError("PIL required for host image decode")
    img = data if isinstance(data, Image.Image) else Image.open(io.BytesIO(data))
    img = img.convert("RGB")
    w, h = img.size
    # shorter side → size
    if w < h:
        nw, nh = size, max(size, int(round(h * size / w)))
    else:
        nh, nw = size, max(size, int(round(w * size / h)))
    img = img.resize((nw, nh), Image.BICUBIC)
    left = (nw - size) // 2
    top = (nh - size) // 2
    img = img.crop((left, top, left + size, top + size))
    return np.asarray(img, dtype=np.uint8)


def decode_batch(items: Sequence[bytes], size: int) -> tuple[np.ndarray, list[int]]:
    """Decode a batch; corrupt images are skipped (reference skips them at
    `reader.py:101-104`). Returns (stacked uint8 array, kept indices)."""
    out, kept = [], []
    for i, data in enumerate(items):
        try:
            out.append(decode_resize_center_crop(data, size))
            kept.append(i)
        except Exception:
            continue
    if not out:
        return np.zeros((0, size, size, 3), np.uint8), []
    return np.stack(out), kept


def resize_on_device(images, size: int):
    """Batched bicubic resize on device: (B, H, W, 3) float/uint8 → (B, size,
    size, 3) float32 in [0,1].  Used by the serving path for raw image
    queries; assumes square-ish inputs or pre-cropped data."""
    import jax
    import jax.numpy as jnp

    x = images.astype(jnp.float32)
    if images.dtype == jnp.uint8:
        x = x / 255.0
    b = x.shape[0]
    return jax.image.resize(x, (b, size, size, 3), method="bicubic")
