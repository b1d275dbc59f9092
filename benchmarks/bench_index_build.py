"""Index-build benchmark: TPU k-means + PQ train/encode throughput.

    python benchmarks/bench_index_build.py [--n 500000] [--d 512]
"""

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.expanduser("~/.cache/clip_retrieval_tpu/xla_cache"),
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=500_000)
    ap.add_argument("--d", type=int, default=512)
    ap.add_argument("--index_key", default="IVF2048,PQ64")
    args = ap.parse_args()

    from clip_retrieval_tpu.index.autotune import parse_index_key
    from clip_retrieval_tpu.index.build import (
        EmbeddingShards,
        build_index_from_shards,
    )

    rng = np.random.default_rng(0)
    x = rng.normal(size=(args.n, args.d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    folder = tempfile.mkdtemp()
    np.save(os.path.join(folder, "e.npy"), x.astype(np.float16))

    t0 = time.time()
    timings = {}
    index = build_index_from_shards(
        EmbeddingShards(folder),
        parse_index_key(args.index_key, args.d),
        train_points=200_000,
        timings=timings,
    )
    dt = time.time() - t0
    print(
        json.dumps(
            {
                "metric": "index_build_vectors_per_sec",
                "value": round(args.n / dt, 1),
                "unit": "vectors/s",
                "n": args.n,
                "d": args.d,
                "index_key": args.index_key,
                "build_seconds": round(dt, 1),
                **timings,
            }
        )
    )


if __name__ == "__main__":
    main()
