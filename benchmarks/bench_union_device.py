"""A/B: union="device" (single dispatch, adaptive cap) vs exact (two-phase)
vs static (single dispatch, worst-case cap) on the IVF-int8 serving tier.

The exact-union path (VERDICT r4 next-step #1) scans only what the batch
probed but pays a mid-search readback — 2 host round-trips per batch, and
T_fixed ≈ 9.4 ms/batch through this harness's relay dominates the batch
time at fine probe geometries (docs/big_index_serving.md §6).  The device
mode keeps the exact-union scan size (adaptive ¼-pow2 cap, verified every
batch by an on-device union count in the same readback as the results) in
ONE dispatch: T_fixed halves and the scan stays union-sized.

Writes benchmarks/union_device_tpu.json.  Reference being beaten: FAISS
C++ IVF scan, /root/reference/clip_retrieval/clip_back.py:355-369.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from clip_retrieval_tpu.utils.compile_cache import (  # noqa: E402
    DEFAULT_CACHE_DIR,
)

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", DEFAULT_CACHE_DIR)


def _unit(x):
    return (x / np.linalg.norm(x, axis=-1, keepdims=True)).astype(np.float32)


def device_busy_qps_single_dispatch(ix, batches, k=10):
    """Back-to-back dispatch + one block: device-busy time of any
    single-dispatch mode (static or device).  Warm pass compiles every
    bucket and settles the adaptive caps, so the timed region is pure
    steady state."""
    import jax

    for qb in batches:
        ix.search(qb, k)
    hs = []
    t0 = time.time()
    for qb in batches:
        hs.append(ix._search_int8_dispatch(qb, k))
    jax.block_until_ready(hs[-1]["vals"])
    busy = time.time() - t0
    return sum(b.shape[0] for b in batches) / busy


def main():
    from clip_retrieval_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()

    import jax

    from clip_retrieval_tpu.index.ivf_int8 import IVFInt8Index
    from bench_big_index import device_busy_qps_exact

    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4_000_000)
    ap.add_argument("--d", type=int, default=512)
    ap.add_argument("--nlist", type=int, default=8192)
    ap.add_argument("--nprobe", type=int, default=64)
    ap.add_argument("--clusters", type=int, default=100_000)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "union_device_tpu.json",
        ),
    )
    args = ap.parse_args()

    # clustered corpus in the CLIP-like regime, drawn on device (the same
    # mixture geometry as the 10M/30M rehearsals, bench_index_10m.py)
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    r = 64  # intrinsic dim
    w = _unit(rng.normal(size=(r, args.d)))
    centers = rng.normal(size=(args.clusters, r)).astype(np.float32)
    key = jax.random.PRNGKey(0)

    t0 = time.time()
    shard = 1 << 20
    parts = []
    for off in range(0, args.n, shard):
        m = min(shard, args.n - off)
        key, k1 = jax.random.split(key)
        cid = (np.arange(off, off + m) % args.clusters).astype(np.int32)
        z = jnp.asarray(centers[cid]) + 0.4 / np.sqrt(r) * jax.random.normal(
            k1, (m, r)
        )
        xs = z @ jnp.asarray(w)
        xs = xs / jnp.linalg.norm(xs, axis=-1, keepdims=True)
        parts.append(np.asarray(xs, np.float16))
    x = np.concatenate(parts).astype(np.float32)
    del parts
    print(f"corpus {args.n}x{args.d}: {time.time() - t0:.0f}s", flush=True)

    t0 = time.time()
    ix = IVFInt8Index.from_vectors(
        x, nlist=args.nlist, nprobe=args.nprobe, seed=0
    )
    print(f"build: {time.time() - t0:.0f}s", flush=True)
    del x

    key, kq = jax.random.split(key)
    qcid = rng.integers(0, args.clusters, 256)
    zq = centers[qcid] + 0.4 / np.sqrt(r) * rng.normal(
        size=(256, r)
    ).astype(np.float32)
    q = _unit(zq @ w)

    out = {
        "metric": "ivf_int8_union_mode_ab",
        "platform": jax.devices()[0].platform,
        "n": args.n,
        "d": args.d,
        "nlist": args.nlist,
        "nprobe": args.nprobe,
        "k": args.k,
        "rows": [],
    }
    for B in (1, 16, 64):
        iters = 20 if B <= 16 else 10
        batches = [
            q[(i * B) % (q.shape[0] - B + 1):][:B] for i in range(iters)
        ]
        row = {"batch": B}
        ix.union = "static"
        row["static_qps"] = round(
            device_busy_qps_single_dispatch(ix, batches, args.k), 1
        )
        ix.union = "exact"
        qps_ex, detail = device_busy_qps_exact(ix, batches, args.k)
        row["exact_qps"] = round(qps_ex, 1)
        row["exact_detail"] = detail
        ix.union = "device"
        ix._dev_caps.clear()
        row["device_qps"] = round(
            device_busy_qps_single_dispatch(ix, batches, args.k), 1
        )
        padded_b = 1 << max(0, (B - 1).bit_length())
        cap = ix._dev_caps.get((padded_b, min(args.nprobe, args.nlist)))
        row["device_cap_chunks"] = cap
        row["device_last_union_chunks"] = ix.last_union_chunks
        out["rows"].append(row)
        print(row, flush=True)

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["rows"]))


if __name__ == "__main__":
    main()
