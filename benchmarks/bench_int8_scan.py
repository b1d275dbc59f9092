"""A/B: fused Pallas gather-scan vs XLA gather path, exact-union IVF-int8.

Loads an existing on-disk ivf_int8 index (default: the 10M×512 serving
index), runs the exact-union two-phase search at serving shape, and times
the phase-2 scan dispatch for impl="xla" (gather materialized in HBM, the
r4 path) vs impl="pallas" (ops/int8scan.py — each probed chunk DMA'd once,
GEMM+scale+mask fused).  Writes benchmarks/int8_scan_<platform>.json.

Run:  python benchmarks/bench_int8_scan.py --index /root/bench_artifacts/serve10m/image.index
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--index", default="/root/bench_artifacts/serve10m/image.index"
    )
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--k", type=int, default=40)
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--out_suffix", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from clip_retrieval_tpu.index.ivf_int8 import (
        IVFInt8Index,
        _scan_selected_device,
    )

    ix = IVFInt8Index.load(args.index)
    ix.union = "exact"
    print(
        f"loaded n={ix.ntotal} d={ix.d} nlist={ix.nlist} "
        f"nprobe={ix.nprobe}",
        flush=True,
    )
    rng = np.random.default_rng(0)
    q = rng.normal(size=(args.batch, ix.d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)

    print("uploading device image...", flush=True)
    t0 = time.time()
    ix._ensure_device()
    h = ix._search_int8_dispatch(q, args.k)
    per_q = np.asarray(h["per_q"])  # blocks until coarse + upload done
    print(f"upload+coarse {time.time() - t0:.1f}s", flush=True)
    sel = ix._union_chunk_sel(per_q)
    dv = ix._device
    print(
        f"probed union: {ix.last_union_chunks} chunks "
        f"(padded {sel.shape[0]}) of {dv['rows'].shape[0]} total, "
        f"Lc={dv['rows'].shape[1]}",
        flush=True,
    )

    # measured relay RTT (tiny transfer round-trip)
    rtts = []
    one = jnp.zeros((8, 128), jnp.float32)
    for _ in range(15):
        t0 = time.time()
        np.asarray(one + 1.0)
        rtts.append(time.time() - t0)
    rtt = float(np.median(rtts))
    print(f"relay rtt {rtt * 1e3:.1f} ms", flush=True)

    results = {}
    vals_by_impl = {}
    for impl in ("xla", "pallas"):
        sel_d = jnp.asarray(sel)
        fn = lambda: np.asarray(  # noqa: E731 - bench closure
            _scan_selected_device(
                h["q"], dv["rows"], dv["scales"], dv["ids"], sel_d,
                h["k_dev"], ix.exact_topk, impl=impl,
            )[0]
        )
        t0 = time.time()
        vals_by_impl[impl] = fn()  # compile + first run
        compile_s = time.time() - t0
        samples = []
        for _ in range(args.iters):
            t0 = time.time()
            fn()
            samples.append(time.time() - t0)
        samples.sort()
        p50 = samples[len(samples) // 2]
        dev_ms = max(0.1, (p50 - rtt) * 1e3)
        results[impl] = {
            "first_call_s": round(compile_s, 1),
            "scan_p50_ms": round(p50 * 1e3, 3),
            "scan_device_ms": round(dev_ms, 3),
        }
        print(impl, results[impl], flush=True)

    # identical top-k scores (both paths mask identically)
    agree = np.allclose(
        vals_by_impl["xla"], vals_by_impl["pallas"], rtol=1e-4, atol=1e-5
    )
    speedup = (
        results["xla"]["scan_device_ms"]
        / results["pallas"]["scan_device_ms"]
    )
    union_bytes = int(ix.last_union_chunks) * dv["rows"].shape[1] * ix.d
    out = {
        "metric": "ivf_int8_exact_union_scan_ab",
        "index": {"n": ix.ntotal, "d": ix.d, "nlist": ix.nlist,
                  "nprobe": ix.nprobe},
        "batch": args.batch,
        "k": args.k,
        "union_chunks": int(ix.last_union_chunks),
        "union_mb": round(union_bytes / 1e6, 1),
        "relay_rtt_ms": round(rtt * 1e3, 2),
        "impls": results,
        "topk_scores_match": bool(agree),
        "speedup_device": round(speedup, 2),
        "scan_gbps_pallas": round(
            union_bytes / results["pallas"]["scan_device_ms"] / 1e6, 1
        ),
        "scan_gbps_xla": round(
            union_bytes / results["xla"]["scan_device_ms"] / 1e6, 1
        ),
        "note": "scan_device_ms = blocking phase-2 scan p50 minus one "
        "relay RTT; scan_gbps counts probed int8 row bytes only (the "
        "useful-traffic R_scan of docs/big_index_serving.md §6)",
    }
    platform = jax.devices()[0].platform
    path = os.path.join(
        os.path.dirname(__file__),
        f"int8_scan_{platform}{args.out_suffix}.json"
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
