"""Search benchmark: int8 sharded tier + IVF-PQ device tier + native host scan.

Prints one JSON line per configuration. Run on TPU:
    python benchmarks/bench_search.py [--n 500000] [--d 512]
"""

import argparse
import json
import os
import time

import numpy as np

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.expanduser("~/.cache/clip_retrieval_tpu/xla_cache"),
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=500_000)
    ap.add_argument("--d", type=int, default=512)
    ap.add_argument("--batches", type=int, default=(256,))
    args = ap.parse_args()

    from clip_retrieval_tpu.index.sharded_flat import ShardedFlatIndex

    rng = np.random.default_rng(0)
    x = rng.normal(size=(args.n, args.d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)

    ix = ShardedFlatIndex.from_vectors(x)
    for B in (1, 16, 256):
        q = x[:B]
        ix.search(q, 40)
        iters = 20
        t0 = time.time()
        for _ in range(iters):
            v, i = ix.search(q, 40)
        dt = (time.time() - t0) / iters
        print(
            json.dumps(
                {
                    "metric": f"int8_flat_search_qps_b{B}",
                    "value": round(B / dt, 1),
                    "unit": "QPS",
                    "n": args.n,
                    "d": args.d,
                    "self_hit": float((i[:, 0] == np.arange(B)).mean()),
                }
            )
        )


if __name__ == "__main__":
    main()
