"""Int8 vs bf16 MXU ceiling at CLIP-relevant matmul shapes.

Decision data for whether a W8A8 int8 encoder path is worth building: on
v5e the int8 MXU only pulls ahead of bf16 when the contraction dim is large
(K≥4096 with big M,N); at CLIP tower shapes (K=1024..4096) int8 is equal or
slower, so the encoders stay bf16 and int8 is used only where it wins —
the index scan tiers (K=d=512-ish with huge N: ops/int8mm.py,
index/sharded_flat.py, index/ivf_int8.py).

Writes benchmarks/int8_mm_<platform>.json.  Run: python benchmarks/bench_int8_mm.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.expanduser("~/.cache/clip_retrieval_tpu/xla_cache"),
)

PEAK_BF16 = 197e12  # v5e
PEAK_INT8 = 394e12


def bench(dtype, m, k, n, iters=24):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    if dtype == "int8":
        amats = [
            jnp.asarray(rng.integers(-100, 100, (m, k), dtype=np.int8))
            for _ in range(4)
        ]
        b = jnp.asarray(rng.integers(-100, 100, (k, n), dtype=np.int8))
        acc_t = jnp.int32
    else:
        amats = [
            jnp.asarray(
                rng.standard_normal((m, k)).astype(np.float32),
                dtype=jnp.bfloat16,
            )
            for _ in range(4)
        ]
        b = jnp.asarray(
            rng.standard_normal((k, n)).astype(np.float32), dtype=jnp.bfloat16
        )
        acc_t = jnp.float32

    @jax.jit
    def f(a, b):
        out = jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=acc_t
        )
        return jnp.sum(out.astype(jnp.float32))  # tiny readback sync point

    for a in amats:
        np.asarray(f(a, b))  # compile + materialize inputs (device_put lazy)
    t0 = time.perf_counter()
    out = None
    for i in range(iters):
        out = f(amats[i % 4], b)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / iters
    ops = 2 * m * k * n / dt
    peak = PEAK_INT8 if dtype == "int8" else PEAK_BF16
    return {
        "dtype": dtype,
        "mkn": [m, k, n],
        "tops": round(ops / 1e12, 1),
        "util_vs_peak": round(ops / peak, 3),
    }


def main():
    import jax

    platform = jax.devices()[0].platform
    results = []
    # (L/14 tower shape: M=B·S, K=width), (H/14-ish), (int8-friendly large-K)
    for m, k, n in [
        (65792, 1024, 1024),
        (8192, 4096, 4096),
        (16384, 4096, 16384),
    ]:
        for dtype in ("int8", "bf16"):
            row = bench(dtype, m, k, n)
            row["platform"] = platform
            results.append(row)
            print(json.dumps(row), flush=True)
    out = os.path.join(
        os.path.dirname(__file__), f"int8_mm_{platform}.json"
    )
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
