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
import os
from typing import Sequence

import numpy as np

try:
    from PIL import Image

    _HAS_PIL = True
except ImportError:  # pragma: no cover
    _HAS_PIL = False


def _native_decode(data: bytes, size: int, fast: bool) -> np.ndarray | None:
    """C++ decode+resize+crop (native/image_decode.cpp); None → PIL path.

    The native library handles JPEG/PNG/WebP; other containers (bmp, tiff,
    gif — rare in web datasets) and exotic color spaces (CMYK) return a
    nonzero code and fall back to PIL for exact reference behavior."""
    from ..native import get_decode_lib

    lib = get_decode_lib()
    if lib is None:
        return None
    out = np.empty((size, size, 3), np.uint8)
    rc = lib.crt_decode_resize_crop(data, len(data), size, int(fast), out)
    if rc == 0:
        return out
    # any nonzero code (unsupported container, or a real decode error where
    # PIL's identical libjpeg will produce the canonical error/skip
    # behavior) falls back to the PIL path
    return None


def decode_resize_center_crop(
    data: bytes | "Image.Image", size: int, *, fast: bool = False
) -> np.ndarray:
    """bytes/PIL image → (size, size, 3) uint8, CLIP-style bicubic + crop.

    Matches torchvision Resize(size, BICUBIC) + CenterCrop(size) + RGB
    conversion semantics.  Uses the native C++ decoder when available
    (pixel-equivalent within ±2/255 of the PIL path; `fast=True` adds
    libjpeg DCT scaling like PIL's Image.draft, trading exactness for
    2-4× decode speed on large JPEGs; CRT_FAST_DECODE=1 flips the default).
    """
    fast = fast or os.environ.get("CRT_FAST_DECODE") == "1"
    if isinstance(data, (bytes, bytearray, memoryview)):
        out = _native_decode(bytes(data), size, fast)
        if out is not None:
            return out
    return _pil_decode_resize_crop(data, size)


def _pil_decode_resize_crop(
    data: bytes | "Image.Image", size: int
) -> np.ndarray:
    """PIL-only path (also the fallback for items the native decoder already
    rejected — re-running the native decoder on those would fail again)."""
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


def decode_batch(
    items: Sequence[bytes], size: int, *, fast: bool = False
) -> tuple[np.ndarray, list[int]]:
    """Decode a batch; corrupt images are skipped (reference skips them at
    `reader.py:101-104`). Returns (stacked uint8 array, kept indices).

    Uses the native OpenMP batch decoder when available (one C call for the
    whole batch, parallel across host cores); items it can't handle fall
    back to the per-item PIL path."""
    fast = fast or os.environ.get("CRT_FAST_DECODE") == "1"
    from ..native import get_decode_lib

    lib = get_decode_lib()
    if lib is not None and items:
        blob = b"".join(bytes(d) for d in items)
        offsets = np.zeros(len(items) + 1, np.int64)
        np.cumsum([len(d) for d in items], out=offsets[1:])
        out = np.empty((len(items), size, size, 3), np.uint8)
        ok = np.empty(len(items), np.int32)
        lib.crt_decode_batch(
            np.frombuffer(blob, np.uint8), offsets, len(items), size,
            int(fast), out, ok,
        )
        rows, kept = [], []
        for i, code in enumerate(ok):
            if code == 0:
                rows.append(out[i])
                kept.append(i)
            else:  # unsupported container / decode error → PIL fallback
                try:
                    # straight to PIL: the native decoder just rejected this
                    # item, retrying it would fail identically
                    rows.append(_pil_decode_resize_crop(items[i], size))
                    kept.append(i)
                except Exception:
                    continue
        if not rows:
            return np.zeros((0, size, size, 3), np.uint8), []
        return np.stack(rows), kept

    out, kept = [], []
    for i, data in enumerate(items):
        try:
            out.append(decode_resize_center_crop(data, size, fast=fast))
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
