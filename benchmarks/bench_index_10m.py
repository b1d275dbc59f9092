"""10M-vector end-to-end index benchmark: autotuned build → calibrate →
measure (QPS, recall@10) for device and host search paths.

The at-scale evidence the reference claims with autofaiss ("hundreds of
millions of embeddings in a few hours", `/root/reference/README.md:289`;
BASELINE.md north star: ≥10k QPS @ recall@10 ≥0.95 on 100M).  Corpus is
synthetic **low-intrinsic-dimension** embeddings (unit rows spanning an
r-dim subspace of R^d plus small ambient noise) — CLIP embeddings have low
intrinsic dim, and isotropic noise both under-states IVF probe recall and
over-states k-means quality.

    python benchmarks/bench_index_10m.py [--n 10000000] [--intrinsic 64]
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


def _make_corpus_host(
    folder, n, d, intrinsic, seed, shard_rows, clusters, within,
    skip_shards, w_np, cz_np, noise_std, _p,
):
    """Host-numpy twin of the device draw (see make_corpus): same law
    x = unit(z @ W + 0.05·N(0, I_d)), z = center_{i mod clusters} +
    noise_std·N(0, I_r); per-shard RNG streams keyed on (seed, shard) so
    resumed runs redraw identical shards."""
    block = 1 << 18

    def draw(rng, start, rows):
        out = np.empty((rows, d), np.float16)
        for b0 in range(0, rows, block):
            br = min(block, rows - b0)
            z = rng.standard_normal((br, intrinsic), dtype=np.float32)
            if clusters:
                z *= noise_std
                idx = (np.arange(start + b0, start + b0 + br)) % clusters
                z += cz_np[idx]
            x = z @ w_np
            x += 0.05 * rng.standard_normal((br, d), dtype=np.float32)
            x /= np.linalg.norm(x, axis=1, keepdims=True)
            out[b0 : b0 + br] = x.astype(np.float16)
        return out

    for si, start in enumerate(range(0, n, shard_rows)):
        if si in skip_shards:
            continue
        rows = min(shard_rows, n - start)
        x = draw(np.random.default_rng((seed, si)), start, rows)
        np.save(os.path.join(folder, f"emb_{si:04d}.npy"), x)
        _p(f"corpus shard {si}: rows {start}..{start + rows} written (host)")
    rngq = np.random.default_rng((seed, 1 << 20))
    if clusters:
        qc = cz_np[rngq.integers(0, clusters, 256)]
        z = qc + noise_std * rngq.standard_normal(
            (256, intrinsic), dtype=np.float32
        )
    else:
        z = rngq.standard_normal((256, intrinsic), dtype=np.float32)
    q = z @ w_np + 0.05 * rngq.standard_normal((256, d), dtype=np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return q.astype(np.float32)


def make_corpus(
    folder, n, d, intrinsic, seed=0, shard_rows=1 << 21,
    clusters=0, within=0.4, skip_shards=frozenset(),
):
    """Unit-norm rows x = unit(z @ W + eps), z ~ N(0, I_r): intrinsic dim r
    inside ambient dim d.  Written as fp16 npy shards (the pipeline's
    on-disk contract) without materializing the corpus in RAM.

    With clusters > 0, z is drawn from a mixture of `clusters` isotropic
    blobs in the r-dim subspace instead of one Gaussian — the regime of
    real CLIP embeddings, whose neighbors concentrate in semantic clusters.
    `within` is the within-cluster noise-VECTOR norm relative to the
    cluster-center norm: within=0.4 puts same-cluster cosine ~1/(1+0.4²)
    ≈ 0.86, matching measured top-10 neighbor similarity of CLIP
    embeddings at 10M+ scale, while cross-cluster pairs are near-orthogonal
    (the per-component noise std is within·scale/√r — scaling by `within·
    scale` alone would give a noise vector of norm within·scale·√r, LARGER
    than the center norm, smearing the clusters away entirely).  The
    uniform (clusters=0) regime is near-worst-case for IVF: at 10M rows the
    true top-10 of a query is spread across many Voronoi cells.

    Generation runs on the default JAX device: drawing the ~5e9 gaussians
    a 10M×512 corpus needs takes hours on a single host core but seconds
    on the chip; each fp16 shard streams back once and is written to disk.
    Cluster membership is cyclic — row i belongs to cluster i mod clusters
    — so every cluster has exactly ⌈n/clusters⌉ or ⌊n/clusters⌋ members and
    same-cluster neighbors sit `clusters` ids apart (NOT contiguous: id
    locality must not flatter the refine tier's mmap reads).  Cyclic
    assignment replaces a per-row random gather, which runs orders of
    magnitude below memory bandwidth on TPU; a tiled center table +
    contiguous slices runs at full bandwidth instead.
    """
    import jax
    import jax.numpy as jnp

    t0 = time.time()

    def _p(msg):
        print(f"  [gen +{time.time() - t0:5.0f}s] {msg}", flush=True)

    # one-time setup on host (tiny), per-shard draw on device
    rng = np.random.default_rng(seed)
    w_np = np.linalg.qr(rng.standard_normal((d, d), dtype=np.float32))[0][
        :intrinsic
    ]  # (r, d) orthonormal rows
    scale = float(np.sqrt(intrinsic))  # ||z|| ~ sqrt(r) for the uniform case
    cz_np = None
    if clusters:
        cz_np = rng.standard_normal((clusters, intrinsic), dtype=np.float32)
        cz_np *= scale / np.linalg.norm(cz_np, axis=1, keepdims=True)
    noise_std = within * scale / np.sqrt(intrinsic)  # ||noise|| = within·||c||
    _p("host setup done (w, cluster centers)")
    if os.environ.get("CRT_GEN_HOST"):
        # Same law drawn with numpy on the host. The device path exists
        # because drawing is compute-cheap only at low intrinsic dim — but
        # each fp16 shard must stream back through the harness relay, whose
        # device→host rate is both low and VARIABLE (measured 11 MB/s one
        # day, 3.5 MB/s another: 10 min/2 GB shard). At intrinsic ≤ 64 the
        # host draw (~30 s/shard on one core, matmul + ambient noise
        # dominated) beats any relay rate seen so far; different RNG
        # stream, identical distribution.
        return _make_corpus_host(
            folder, n, d, intrinsic, seed, shard_rows, clusters, within,
            skip_shards, w_np, cz_np, noise_std, _p,
        )
    w = jnp.asarray(w_np)
    key = jax.random.PRNGKey(seed)
    # the harness relay's device→host rate collapses on multi-GB transfers
    # (~30 MB/s at 134 MB, <3 MB/s at 2 GB): draw and read back in blocks
    block_rows = 1 << 17
    big_cz = None
    if clusters:
        # center rows for any [off, off + br) window of the cyclic
        # assignment, off < clusters, br ≤ one draw block — slices are per
        # BLOCK, so tiling past one block window would only waste HBM
        nrep = min(block_rows, shard_rows, n) // clusters + 2
        big_cz = jnp.tile(jnp.asarray(cz_np), (nrep, 1))

    @jax.jit
    def draw_around(k, centers):
        rows = centers.shape[0]
        kz, kn = jax.random.split(k)
        z = centers + noise_std * jax.random.normal(
            kz, (rows, intrinsic), jnp.float32
        )
        x = z @ w + 0.05 * jax.random.normal(kn, (rows, d), jnp.float32)
        x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
        return x.astype(jnp.float16)

    @jax.jit
    def draw_uniform(k, shape_token):
        rows = shape_token.shape[0]
        kz, kn = jax.random.split(k)
        z = jax.random.normal(kz, (rows, intrinsic), jnp.float32)
        x = z @ w + 0.05 * jax.random.normal(kn, (rows, d), jnp.float32)
        x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
        return x.astype(jnp.float16)

    from clip_retrieval_tpu.utils.transfer import to_host_chunked

    def draw_np(k, start, rows):
        out = np.empty((rows, d), np.float16)
        for bi, b0 in enumerate(range(0, rows, block_rows)):
            br = min(block_rows, rows - b0)
            kb = jax.random.fold_in(k, bi)
            if clusters:
                centers = jax.lax.dynamic_slice_in_dim(
                    big_cz, (start + b0) % clusters, br, 0
                )
                out[b0 : b0 + br] = to_host_chunked(draw_around(kb, centers))
            else:
                out[b0 : b0 + br] = to_host_chunked(
                    draw_uniform(kb, jnp.empty((br, 0), jnp.int8))
                )
        return out

    for si, start in enumerate(range(0, n, shard_rows)):
        if si in skip_shards:  # resumable top-up (bench_big_index reuse)
            continue
        rows = min(shard_rows, n - start)
        x = draw_np(jax.random.fold_in(key, si), start, rows)
        np.save(os.path.join(folder, f"emb_{si:04d}.npy"), x)
        _p(f"corpus shard {si}: rows {start}..{start + rows} written")
    # held-out queries: random clusters (small gather, fine) or uniform
    kq = jax.random.fold_in(key, 1 << 20)
    if clusters:
        kpick, kdraw = jax.random.split(kq)
        qcent = big_cz[:clusters][
            np.asarray(jax.random.randint(kpick, (256,), 0, clusters))
        ]
        q = np.asarray(draw_around(kdraw, qcent))
    else:
        q = draw_np(kq, 0, 256)
    return q.astype(np.float32)


def bench_fn(fn, iters, warmup=2):
    for _ in range(warmup):
        fn()
    t0 = time.time()
    for _ in range(iters):
        fn()
    return (time.time() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10_000_000)
    ap.add_argument("--d", type=int, default=512)
    ap.add_argument("--intrinsic", type=int, default=64)
    ap.add_argument(
        "--clusters", type=int, default=0,
        help="draw the corpus from this many clusters in the intrinsic "
        "subspace (0 = one Gaussian; CLIP-like data is clustered)",
    )
    ap.add_argument("--within", type=float, default=0.4)
    ap.add_argument("--budget", default="4G")
    ap.add_argument("--index_key", default=None)
    ap.add_argument("--out", type=str, default="")
    ap.add_argument(
        "--save_index", default="",
        help="also save the built index (image.index layout) here so the "
        "serving bench can load it (--index_folder)",
    )
    ap.add_argument(
        "--corpus", default="",
        help="reuse an existing shard folder instead of generating",
    )
    ap.add_argument(
        "--load_index", default="",
        help="skip the build: load a previously --save_index'd image.index",
    )
    args = ap.parse_args()

    import jax

    from clip_retrieval_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from clip_retrieval_tpu.index.autotune import select_params
    from clip_retrieval_tpu.index.build import (
        EmbeddingShards,
        _exact_ground_truth,
        _recall_vs_gt,
        build_index_from_shards,
        calibrate_nprobe,
    )

    platform = jax.devices()[0].platform
    if args.corpus:
        folder = args.corpus
        print(f"reusing corpus in {folder}", flush=True)
        t0 = time.time()
        queries = np.load(os.path.join(folder, "queries.npz"))["q"]
        gen_s = 0.0
    else:
        folder = tempfile.mkdtemp(prefix="bench10m_")
        print(f"generating {args.n}x{args.d} corpus (intrinsic dim "
              f"{args.intrinsic}) in {folder}", flush=True)
        t0 = time.time()
        queries = make_corpus(
            folder, args.n, args.d, args.intrinsic,
            clusters=args.clusters, within=args.within,
        )
        # .npz: EmbeddingShards globs *.npy, the query file must not look
        # like a corpus shard
        np.savez(os.path.join(folder, "queries.npz"), q=queries)
        gen_s = time.time() - t0

    shards = EmbeddingShards(folder)
    params = select_params(args.n, args.d, args.budget, args.index_key)
    print(f"autotune({args.budget}) -> {params.index_key} "
          f"(refine={params.use_refine})", flush=True)

    t0 = time.time()
    timings = {}
    if args.load_index:
        from clip_retrieval_tpu.index.store import load_index

        index = load_index(os.path.join(args.load_index, "image.index"))
        build_s = 0.0
        print(f"loaded index from {args.load_index}", flush=True)
    else:
        index = build_index_from_shards(
            shards, params, timings=timings, scratch_dir=folder
        )
        build_s = time.time() - t0
        print(f"build done in {build_s:.0f}s ({timings})", flush=True)

    if args.save_index:
        import pandas as pd

        t0 = time.time()
        idx_dir = os.path.join(args.save_index, "image.index")
        os.makedirs(idx_dir, exist_ok=True)
        index.save(idx_dir)
        meta_dir = os.path.join(args.save_index, "metadata")
        os.makedirs(meta_dir, exist_ok=True)
        shard = 1 << 21
        for si, start in enumerate(range(0, args.n, shard)):
            rows = min(shard, args.n - start)
            pd.DataFrame(
                {"url": [f"http://x/{start + i}" for i in range(rows)]}
            ).to_parquet(
                os.path.join(meta_dir, f"metadata_{si:04d}.parquet")
            )
        print(f"saved index to {args.save_index} "
              f"({time.time() - t0:.0f}s)", flush=True)

    # exact ground truth (one brute-force pass, shared by calibration)
    t0 = time.time()
    gt = _exact_ground_truth(shards, queries, 10)
    print(f"ground truth in {time.time() - t0:.0f}s", flush=True)

    cal = calibrate_nprobe(
        index, shards, queries=queries[:100], gt=gt[:100], max_nprobe=512
    )
    print(f"calibrated: {cal}", flush=True)

    # recall@10 at the calibrated nprobe: b1 and batched must agree (the
    # per-query budget path differs from the batched one); both measured
    # over ALL held-out queries so deltas are effects, not sampling noise
    got = np.concatenate(
        [
            index.search(queries[i : i + 1], 10)[1]
            for i in range(queries.shape[0])
        ]
    )
    recall_b1 = _recall_vs_gt(gt, got)
    _, got_b = index.search(queries, 10)
    recall_batch = _recall_vs_gt(gt, got_b)

    results = {
        "metric": "index_10m_end_to_end",
        "n": args.n,
        "d": args.d,
        "intrinsic_dim": args.intrinsic,
        "clusters": args.clusters,
        "budget": args.budget,
        "index_key": params.index_key,
        "corpus_gen_s": round(gen_s, 1),
        "build_s": round(build_s, 1),
        "train_s": timings.get("train_s"),
        "encode_s": timings.get("encode_s"),
        "nprobe_calibration": cal,
        "recall@10_b1": round(recall_b1, 4),
        "recall@10_b256": round(recall_batch, 4),
        "platform": platform,
        "qps": [],
    }

    has_device = hasattr(index, "_search_device")
    for B in (1, 16, 64):
        q = queries[:B]
        iters = 20 if B <= 16 else 10
        row = {"batch": B}
        t = bench_fn(lambda: index.search(q, 10), iters)
        row["search_ms_per_query"] = round(t / B * 1e3, 3)
        row["search_qps"] = round(B / t, 1)
        if has_device and index.refine_vectors is not None:
            # split out the scan vs the host rerank read
            t_scan = bench_fn(
                lambda: index._search_adc(q, 10 * index.rerank_factor), iters
            )
            row["adc_scan_qps"] = round(B / t_scan, 1)
        if has_device:
            # pipelined on-chip rate (removes this harness's ~65 ms relay
            # RTT per dispatch, which a local host does not pay)
            from bench_ivfpq_scan import sustained_device

            t_sus = sustained_device(index, q, 10, index.nprobe, iters=20)
            row["adc_scan_qps_sustained"] = round(B / t_sus, 1)
        if has_device:
            t_host = bench_fn(
                lambda: index._search_host(q, 10, index.nprobe), 3
            )
            row["host_cpp_qps"] = round(B / t_host, 1)
        results["qps"].append(row)
        print(json.dumps(row), flush=True)

    out = args.out or os.path.join(
        os.path.dirname(__file__), f"index_10m_{platform}.json"
    )
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({k: v for k, v in results.items() if k != "qps"}))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
