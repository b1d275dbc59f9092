"""Serving-scale search benchmark on the real chip: the int8 exact tier and
the IVF-int8 pruned tier, with recall vs exact ground truth.

Reference baselines (BASELINE.md): clip-back serves ~20 QPS / ~50 ms per
query on CPU FAISS; the north star is 10k QPS at recall@10 ≥ 0.95.  This
measures the device-side rates one chip contributes (multi-chip scales with
the list-sharded tier, index/sharded_ivf.py).

Writes benchmarks/search_<platform>.json.
Run:  python benchmarks/bench_search.py [--n 1000000] [--d 512]
"""

import argparse
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


def make_corpus(n, d, seed=0):
    """Clustered unit vectors — isotropic noise under-represents IVF probe
    recall on real CLIP embeddings (low intrinsic dimension)."""
    rng = np.random.default_rng(seed)
    n_centers = 1024
    centers = rng.normal(size=(n_centers, d)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    x = centers[rng.integers(0, n_centers, n)] + 0.25 * rng.normal(
        size=(n, d)
    ).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return x.astype(np.float32)


def timed_qps(ix, q, k, iters=20):
    ix.search(q, k)  # warm/compile
    t0 = time.perf_counter()
    for _ in range(iters):
        vals, ids = ix.search(q, k)
    dt = (time.perf_counter() - t0) / iters
    return len(q) / dt, ids


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--d", type=int, default=512)
    args = ap.parse_args()

    import jax

    from clip_retrieval_tpu.index.ivf_int8 import IVFInt8Index
    from clip_retrieval_tpu.index.sharded_flat import ShardedFlatIndex
    from clip_retrieval_tpu.ops import kmeans as km
    from clip_retrieval_tpu.ops.int8mm import quantize_rows

    platform = jax.devices()[0].platform
    results = []
    x = make_corpus(args.n, args.d)
    nq = 64
    q = x[:nq] + 0.05 * np.random.default_rng(7).normal(
        size=(nq, args.d)
    ).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)

    # ---- ground truth on host BLAS (exact fp32) ---------------------------
    print("computing ground truth...", flush=True)
    scores = q @ x.T  # (64, n) — a few seconds of sgemm
    gt = np.argpartition(-scores, 40, axis=1)[:, :40]
    gt = np.take_along_axis(
        gt, np.argsort(-np.take_along_axis(scores, gt, axis=1), axis=1), axis=1
    )
    del scores

    # ---- exact-scan int8 tier ----------------------------------------------
    print("building flat int8 tier...", flush=True)
    flat = ShardedFlatIndex.from_vectors(x)
    _, got_flat = flat.search(q, 40)
    flat_recall = float(
        np.mean([len(set(gt[i]) & set(got_flat[i])) / 40 for i in range(nq)])
    )
    results.append(
        {
            "metric": "int8_flat_recall_at_40",
            "value": round(flat_recall, 4),
            "platform": platform,
        }
    )
    print(json.dumps(results[-1]), flush=True)
    for B in (1, 256):
        qb = np.repeat(q, -(-B // nq), axis=0)[:B]
        qps, _ = timed_qps(flat, qb, 40)
        row = {
            "metric": f"int8_flat_qps_b{B}",
            "qps": round(qps, 1),
            "n": args.n,
            "d": args.d,
            "platform": platform,
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    # ---- IVF-int8 pruned tier ---------------------------------------------
    # build manually: coarse on a subsample (FAISS-style), stream-assign all
    nlist = 4096
    print("training coarse quantizer...", flush=True)
    coarse = km.kmeans(x[: 1 << 17], nlist, niter=10, seed=0)
    print("assigning rows...", flush=True)
    assign = km.assign_chunked(x, coarse)
    order = np.argsort(assign, kind="stable")
    counts = np.bincount(assign, minlength=nlist)
    offsets = np.zeros((nlist + 1,), np.int64)
    np.cumsum(counts, out=offsets[1:])
    qv, s = quantize_rows(x[order])
    for nprobe in (16, 64):
        ivf = IVFInt8Index(
            args.d,
            np.asarray(coarse),
            offsets,
            order.astype(np.int64),
            qv,
            s,
            nprobe=nprobe,
        )
        _, got = ivf.search(q, 40)
        recall = float(
            np.mean(
                [len(set(gt[i]) & set(got[i])) / 40 for i in range(nq)]
            )
        )
        for B in (1, 64):
            qb = np.repeat(q, -(-B // nq), axis=0)[:B]
            qps, _ = timed_qps(ivf, qb, 40)
            row = {
                "metric": f"ivf_int8_qps_nprobe{nprobe}_b{B}",
                "qps": round(qps, 1),
                "recall_at_40_vs_exact": round(recall, 4),
                "scan_fraction": round(
                    min(1.0, B * nprobe / nlist), 4
                ),
                "nlist": nlist,
                "n": args.n,
                "platform": platform,
            }
            results.append(row)
            print(json.dumps(row), flush=True)
        ivf._device = None  # free the HBM image before the next config

    out = os.path.join(
        os.path.dirname(__file__), f"search_{platform}.json"
    )
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
