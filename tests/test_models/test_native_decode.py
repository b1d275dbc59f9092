"""Native C++ image decode/resize parity vs the PIL reference path.

The reference preprocesses with PIL/torchvision inside DataLoader workers
(`/root/reference/clip_retrieval/clip_inference/reader.py:101,163`); our
native decoder (native/image_decode.cpp) must be pixel-equivalent so the
embeddings match regardless of which path a deployment ends up on.
"""

import io

import numpy as np
import pytest
from PIL import Image

from clip_retrieval_tpu.models import preprocess as pp
from clip_retrieval_tpu.native import get_decode_lib

pytestmark = pytest.mark.skipif(
    get_decode_lib() is None, reason="native decoder unavailable (no g++?)"
)

SIZE = 224


def _img(w, h, seed=0):
    rng = np.random.default_rng(seed)
    # piecewise-smooth content: resample differences on pure noise overstate
    # real-image deviation
    small = rng.integers(0, 255, (h // 8 + 2, w // 8 + 2, 3), dtype=np.uint8)
    return Image.fromarray(small, "RGB").resize((w, h), Image.BILINEAR)


def _pil_path(data: bytes) -> np.ndarray:
    """The pure-PIL pipeline (what decode_resize_center_crop does sans native)."""
    img = Image.open(io.BytesIO(data)).convert("RGB")
    w, h = img.size
    if w < h:
        nw, nh = SIZE, max(SIZE, int(round(h * SIZE / w)))
    else:
        nh, nw = SIZE, max(SIZE, int(round(w * SIZE / h)))
    img = img.resize((nw, nh), Image.BICUBIC)
    left, top = (nw - SIZE) // 2, (nh - SIZE) // 2
    return np.asarray(
        img.crop((left, top, left + SIZE, top + SIZE)), dtype=np.uint8
    )


def _encode(img: Image.Image, fmt: str) -> bytes:
    buf = io.BytesIO()
    img.save(buf, fmt)
    return buf.getvalue()


@pytest.mark.parametrize("fmt", ["JPEG", "PNG", "WEBP"])
@pytest.mark.parametrize(
    "w,h", [(640, 480), (480, 640), (224, 224), (1000, 300), (150, 200)]
)
def test_pixel_parity_vs_pil(fmt, w, h):
    data = _encode(_img(w, h), fmt)
    native = pp._native_decode(data, SIZE, False)
    assert native is not None, f"native decoder refused {fmt} {w}x{h}"
    ref = _pil_path(data)
    diff = np.abs(native.astype(np.int32) - ref.astype(np.int32))
    assert diff.max() <= 2, f"max pixel diff {diff.max()}"
    assert diff.mean() < 0.05


@pytest.mark.parametrize(
    "convert,fmt",
    [("L", "JPEG"), ("P", "PNG"), ("RGBA", "PNG"), ("RGBA", "WEBP")],
)
def test_mode_conversions(convert, fmt):
    data = _encode(_img(300, 400).convert(convert), fmt)
    native = pp._native_decode(data, SIZE, False)
    assert native is not None
    ref = _pil_path(data)
    diff = np.abs(native.astype(np.int32) - ref.astype(np.int32))
    assert diff.max() <= 2


def test_fast_path_bounded_deviation():
    data = _encode(_img(1024, 768), "JPEG")
    fast = pp._native_decode(data, SIZE, True)
    assert fast is not None
    diff = np.abs(fast.astype(np.int32) - _pil_path(data).astype(np.int32))
    # DCT-scaled decode is an approximation; embeddings are insensitive to
    # this much (same trade PIL's Image.draft makes)
    assert diff.mean() < 4.0


def test_truncated_jpeg_is_skipped_like_reference():
    data = _encode(_img(640, 480), "JPEG")
    trunc = data[: len(data) // 2]
    # native rejects instead of padding with gray …
    assert pp._native_decode(trunc, SIZE, False) is None
    # … so the public API raises exactly like PIL and the sample gets
    # skipped (reference reader.py:101-104)
    with pytest.raises(Exception):
        pp.decode_resize_center_crop(trunc, SIZE)


def test_unsupported_container_falls_back_to_pil():
    data = _encode(_img(100, 80), "BMP")
    assert pp._native_decode(data, SIZE, False) is None  # native: rc=1
    out = pp.decode_resize_center_crop(data, SIZE)  # PIL handles it
    assert out.shape == (SIZE, SIZE, 3)


def test_batch_mixed_inputs():
    good = [_encode(_img(400, 300, seed=i), "JPEG") for i in range(4)]
    bmp = _encode(_img(50, 50), "BMP")
    items = good[:2] + [b"not an image"] + [bmp] + good[2:]
    arr, kept = pp.decode_batch(items, SIZE)
    assert arr.shape == (5, SIZE, SIZE, 3)
    assert kept == [0, 1, 3, 4, 5]  # index 2 (garbage) dropped, bmp kept


def test_batch_matches_single():
    items = [_encode(_img(500, 375, seed=i), "JPEG") for i in range(3)]
    arr, kept = pp.decode_batch(items, SIZE)
    assert kept == [0, 1, 2]
    for i, data in enumerate(items):
        single = pp.decode_resize_center_crop(data, SIZE)
        assert np.array_equal(arr[i], single)


def test_decompression_bomb_skipped_not_fatal():
    """A PNG header declaring 50000x50000 must be skipped per-item (PIL
    parity: DecompressionBombError -> skip), never allocate gigabytes or
    kill the process."""
    import struct
    import zlib

    from clip_retrieval_tpu.models.preprocess import decode_batch

    w = h = 50000
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    chunk = b"IHDR" + ihdr
    bomb = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", len(ihdr))
        + chunk
        + struct.pack(">I", zlib.crc32(chunk))
    )
    arr, kept = decode_batch([bomb], 32)
    assert kept == [] and arr.shape[0] == 0
