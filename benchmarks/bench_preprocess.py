"""Host image-preprocess throughput: native C++ decoder vs PIL.

The reference's pipeline is host-preprocessing-bound at scale
(`/root/reference/docs/distributed_clip_inference.md:203-205`: A100 nodes ran
at ~30% solo-GPU throughput because PIL/torchvision decode couldn't keep up).
This measures images/s per core for the pure-PIL path, the native exact path
(native/image_decode.cpp), and the native fast path (libjpeg DCT scaling),
plus the OpenMP batch entry point, and writes benchmarks/preprocess_host.json.

Run:  python benchmarks/bench_preprocess.py
"""

import io
import json
import os
import sys
import time

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_jpeg(w, h, seed=0, quality=90):
    rng = np.random.default_rng(seed)
    small = rng.integers(0, 255, (h // 8 + 2, w // 8 + 2, 3), dtype=np.uint8)
    img = Image.fromarray(small, "RGB").resize((w, h), Image.BILINEAR)
    buf = io.BytesIO()
    img.save(buf, "JPEG", quality=quality)
    return buf.getvalue()


def pil_pipeline(data, size):
    img = Image.open(io.BytesIO(data)).convert("RGB")
    w, h = img.size
    if w < h:
        nw, nh = size, max(size, int(round(h * size / w)))
    else:
        nh, nw = size, max(size, int(round(w * size / h)))
    img = img.resize((nw, nh), Image.BICUBIC)
    left, top = (nw - size) // 2, (nh - size) // 2
    return np.asarray(
        img.crop((left, top, left + size, top + size)), dtype=np.uint8
    )


def rate(fn, data, n):
    fn(data)  # warm
    t0 = time.perf_counter()
    for _ in range(n):
        fn(data)
    return n / (time.perf_counter() - t0)


def main():
    from clip_retrieval_tpu.models import preprocess as pp
    from clip_retrieval_tpu.native import get_decode_lib

    assert get_decode_lib() is not None, "native decoder failed to build"
    size = 224
    results = []
    for w, h in [(500, 375), (1024, 768), (2048, 1536)]:
        data = make_jpeg(w, h)
        n = 80 if w <= 1024 else 30
        pil = rate(lambda d: pil_pipeline(d, size), data, n)
        exact = rate(lambda d: pp._native_decode(d, size, False), data, n)
        fast = rate(lambda d: pp._native_decode(d, size, True), data, n)
        ref = pil_pipeline(data, size).astype(np.int32)
        dev = np.abs(
            pp._native_decode(data, size, True).astype(np.int32) - ref
        )
        results.append(
            {
                "input": f"jpeg_{w}x{h}",
                "pil_img_per_s": round(pil, 1),
                "native_img_per_s": round(exact, 1),
                "native_fast_img_per_s": round(fast, 1),
                "speedup_exact": round(exact / pil, 2),
                "speedup_fast": round(fast / pil, 2),
                "fast_mean_pixel_dev": round(float(dev.mean()), 2),
            }
        )
        print(json.dumps(results[-1]), flush=True)

    # OpenMP batch entry point (n cores on a real TPU host; this harness
    # machine may have 1)
    items = [make_jpeg(500, 375, seed=i) for i in range(64)]
    arr, kept = pp.decode_batch(items, size)
    assert len(kept) == 64
    t0 = time.perf_counter()
    for _ in range(4):
        pp.decode_batch(items, size)
    batch_rate = 4 * 64 / (time.perf_counter() - t0)
    results.append(
        {
            "input": "batch64_jpeg_500x375_omp",
            "cores": os.cpu_count(),
            "img_per_s": round(batch_rate, 1),
        }
    )
    print(json.dumps(results[-1]), flush=True)

    out = os.path.join(os.path.dirname(__file__), "preprocess_host.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
