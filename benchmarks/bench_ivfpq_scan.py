"""IVF-PQ streaming CSR device scan vs host C++ scan benchmark.

Builds a synthetic IVF-PQ index (random codes — scan cost is data-
independent), measures the device streaming scan and the batched native
host scan at several query batch sizes, and writes
benchmarks/ivfpq_scan_<platform>.json.

Reference target (BASELINE.md "clip filter kNN" row): <10 ms per query at
an index of K=100,000 vectors; the serving path is
`clip_back.py:355-369` search_and_reconstruct.

Run on TPU:  python benchmarks/bench_ivfpq_scan.py [--n 1000000]
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


def make_index(n, d, m, nlist, seed=0, skew=False):
    from clip_retrieval_tpu.index.ivfpq import IVFPQIndex

    rng = np.random.default_rng(seed)
    if skew:
        # zipf-ish list sizes: a few giant lists, long tail
        w = 1.0 / np.arange(1, nlist + 1) ** 1.1
        sizes = np.floor(w / w.sum() * n).astype(np.int64)
        sizes[0] += n - sizes.sum()
        rng.shuffle(sizes)
    else:
        sizes = np.full(nlist, n // nlist, np.int64)
        sizes[: n % nlist] += 1
    offsets = np.zeros(nlist + 1, np.int64)
    np.cumsum(sizes, out=offsets[1:])
    coarse = rng.normal(size=(nlist, d)).astype(np.float32)
    coarse /= np.linalg.norm(coarse, axis=1, keepdims=True)
    codebooks = (0.05 * rng.normal(size=(m, 256, d // m))).astype(np.float32)
    codes = rng.integers(0, 256, (n, m)).astype(np.uint8)
    ids = np.arange(n, dtype=np.int64)
    return IVFPQIndex(
        d=d,
        coarse_centroids=coarse,
        codebooks=codebooks,
        rotation=None,
        list_offsets=offsets,
        list_ids=ids,
        list_codes=codes,
        nprobe=16,
    )


def bench(fn, iters=20, warmup=3):
    for _ in range(warmup):
        fn()
    t0 = time.time()
    for _ in range(iters):
        fn()
    return (time.time() - t0) / iters


def sustained_device(ix, q, k, nprobe, iters=30):
    """On-chip rate: pipeline many async dispatches of the search plan,
    sync once.  Removes per-call dispatch/readback latency (which through
    this harness's relay is ~30 ms but ~µs on a local host)."""
    import jax
    import jax.numpy as jnp
    from clip_retrieval_tpu.index import ivfpq as ivf

    if ix._device is None:
        ix._build_device()
    dv = ix._device
    if ivf._pick_scorer() == "pallas":
        qr = jnp.asarray(ix._rotate(q))
        # same per-query pow2 budget bucketing as _search_device: the plan
        # (bucket → query subset) is fixed for a fixed query set, so it is
        # computed once here and the dispatches are timed
        worst_chunks, expected = ix._skew_factor(nprobe)
        if worst_chunks > 4 * expected:
            _, _, ctotals = ivf._coarse_probe(
                qr, dv["coarse"], dv["csizes"], nprobe
            )
            buckets = ivf._budget_buckets(np.asarray(ctotals), 8)
        else:
            buckets = {
                ivf._next_pow2(max(worst_chunks, 8)): np.arange(q.shape[0])
            }
        plan = []
        for nchunk_q, sel in buckets.items():
            bpad = ivf._next_pow2(max(len(sel), 1))
            padded = np.concatenate([sel, np.repeat(sel[:1], bpad - len(sel))])
            plan.append((jnp.asarray(qr[padded]), nchunk_q))

        def call():
            out = None
            for qsub, nchunk_q in plan:
                out = ivf._search_pallas(
                    qsub, dv["coarse"], dv["codebooks"], dv["flat_codes"],
                    dv["astarts"], dv["starts"], dv["sizes"],
                    min(k, nchunk_q * ivf._ALIGN), nchunk_q, nprobe, False,
                )
            return out

    else:
        budget = ivf._next_pow2(max(ix._static_budget(nprobe), 1024))
        window = min(ivf._SCAN_WINDOW, budget)
        qr = jnp.asarray(ix._rotate(q))

        def call():
            return ivf._search_one_shot(
                qr, dv["coarse"], dv["codebooks"], dv["flat_codes"],
                dv["astarts"], dv["starts"], dv["sizes"],
                min(k, budget), window, budget // window, nprobe,
            )

    # sync via result readback of the LAST call: the device queue executes
    # in order, so this bounds all dispatched programs.  (Do NOT use
    # block_until_ready here: through this harness's relay it can return
    # before execution completes.)
    np.asarray(call()[0])
    t0 = time.time()
    out = None
    for _ in range(iters):
        out = call()
    np.asarray(out[0])
    return (time.time() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--d", type=int, default=512)
    ap.add_argument("--m", type=int, default=64)
    # ~4√N for the default 1M corpus (autotune picks 8√N-pow2; 1024 was
    # unrealistically coarse and hid list-length skew effects)
    ap.add_argument("--nlist", type=int, default=4096)
    ap.add_argument("--k", type=int, default=40)
    ap.add_argument("--out", type=str, default="")
    args = ap.parse_args()

    import jax

    platform = jax.devices()[0].platform
    rng = np.random.default_rng(1)
    q_all = rng.normal(size=(256, args.d)).astype(np.float32)
    q_all /= np.linalg.norm(q_all, axis=1, keepdims=True)

    results = []
    for skew in (False, True):
        ix = make_index(args.n, args.d, args.m, args.nlist, skew=skew)
        label = "skew" if skew else "uniform"
        for B in (1, 16, 64):
            q = q_all[:B]
            dt_dev = bench(lambda: ix._search_device(q, args.k, 16))
            dt_sus = sustained_device(ix, q, args.k, 16)
            dt_host = bench(
                lambda: ix._search_host(q, args.k, 16),
                iters=5 if args.n > 200_000 else 20,
            )
            row = {
                "metric": f"ivfpq_scan_{label}_b{B}",
                "n": args.n,
                "d": args.d,
                "m": args.m,
                "nlist": args.nlist,
                "nprobe": 16,
                "k": args.k,
                "device_ms_per_query": round(dt_dev / B * 1e3, 3),
                "device_qps": round(B / dt_dev, 1),
                "device_qps_sustained": round(B / dt_sus, 1)
                if dt_sus
                else None,
                "host_cpp_ms_per_query": round(dt_host / B * 1e3, 3),
                "host_cpp_qps": round(B / dt_host, 1),
                "platform": platform,
            }
            results.append(row)
            print(json.dumps(row))
        # ranking parity device vs exact-f32 host scan (bf16 LUT tolerance)
        vd, idd = ix._search_device(q_all[:16], 10, 16)
        vh, idh = ix._search_host(q_all[:16], 10, 16)
        overlap = np.mean(
            [
                len(set(a[a >= 0]) & set(b[b >= 0])) / max((b >= 0).sum(), 1)
                for a, b in zip(idd, idh)
            ]
        )
        row = {
            "metric": f"ivfpq_scan_{label}_top10_overlap_vs_host",
            "value": round(float(overlap), 4),
        }
        results.append(row)
        print(json.dumps(row))
        del ix

    # the BASELINE.md "clip filter kNN <10ms @ K=100,000" configuration
    ix = make_index(100_000, args.d, args.m, 256)
    q = q_all[:1]
    dt = bench(lambda: ix._search_device(q, args.k, 16))
    dt_sus = sustained_device(ix, q, args.k, 16)
    row = {
        "metric": "ivfpq_scan_100k_single_query",
        "device_ms_per_query": round(dt * 1e3, 3),
        "device_ms_sustained": round(dt_sus * 1e3, 3),
        "baseline_ms": 10.0,
        "vs_baseline": round(10.0 / (dt_sus * 1e3), 2),
        "note": "per-call latency through this harness is relay-RTT bound "
        "(~30 ms round trip); sustained removes dispatch latency and is "
        "the on-chip figure a local host would see",
        "platform": platform,
    }
    results.append(row)
    print(json.dumps(row))

    out = args.out or os.path.join(
        os.path.dirname(__file__), f"ivfpq_scan_{platform}.json"
    )
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
