"""100M-tier rehearsal: shard-build → index_combiner → serve at 30M×512.

VERDICT r3 weak #3: the int8 tier and the combiner talk about the 100M
tier but the largest executed build was 10M and combines were toy-sized.
This bench rehearses the whole tier for real at ≥30M vectors:

  1. corpus: 30M×512 fp16 clustered shards on disk (reuses/extends the
     bench_index_10m clustered corpus — same generator, same law);
  2. train: coarse k-means ONCE on a sample (the tier's train-once /
     encode-per-shard contract, same as the reference's faiss
     merge_ondisk flow: train on one machine, encode shards anywhere —
     `clip_back_prepro/index_combiner.py:10-26`, docs/laion5B_h14_back.md);
  3. shard builds: IVFInt8Index.from_vectors(coarse=, id_offset=) per
     10M-row corpus slice, disk-backed scratch, saved like a real
     multi-host run would;
  4. combine: index_combiner over the shard dirs → populated.index,
     wall-clock + peak RSS measured;
  5. serve:
     - single-chip tier: one 10M shard on the real TPU (the merged 30M
       int8 image is ~17.5 GB with chunk padding — OVER the 16 GB v5e
       HBM; the measured single-chip ceiling is ~20M×512, which is
       exactly why the 100M tier is the MESH tier — see
       docs/big_index_serving.md), QPS at b ∈ {1,16,64} + recall@10
       against shard-local exact ground truth;
     - mesh tier: the merged 30M index on the 8-virtual-device CPU mesh
       (ShardedIVFInt8Index), recall@10 vs global exact ground truth —
       the same sharded program that runs on a real v5e-8.

Each phase runs in its own subprocess so peak-RSS numbers are per-phase,
and every phase is resumable (skips work whose artifact exists).

    python benchmarks/bench_big_index.py --root /root/bench_artifacts/big30m \
        --corpus /tmp/bench10m_XXXX [--phase all]
"""

import argparse
import json
import os
import resource
import subprocess
import sys
import time

import numpy as np

# the package is run from a source checkout, not installed — make it (and
# sibling bench modules) importable from the per-phase subprocesses too
_HERE = os.path.dirname(os.path.abspath(__file__))
for _p in (_HERE, os.path.dirname(_HERE)):
    if _p not in sys.path:
        sys.path.insert(0, _p)

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.expanduser("~/.cache/clip_retrieval_tpu/xla_cache"),
)

# env overrides exist so the whole flow can be smoke-tested at toy scale
# (tests/test_index/test_big_rehearsal_smoke.py) — the defaults are the
# real rehearsal
N = int(os.environ.get("CRT_BIG_N", 30_000_000))
D = int(os.environ.get("CRT_BIG_D", 512))
GEN_SHARD = int(  # must match bench_index_10m's shard_rows for reuse
    os.environ.get("CRT_BIG_GEN_SHARD", 1 << 21)
)
# 3×10M at d=512 (the measured single-chip int8 ceiling); the true-100M
# row-count rehearsal (VERDICT r4 #5) runs N=100M, D=64, SHARDS=4
BUILD_SHARDS = int(os.environ.get("CRT_BIG_SHARDS", 3))
NLIST = int(os.environ.get("CRT_BIG_NLIST", 16_384))
CLUSTERS = int(  # matches the reused clustered-10M corpus draw
    os.environ.get("CRT_BIG_CLUSTERS", 50_000)
)


def _rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def _log(msg):
    print(f"[big30m +{time.time() - T0:6.0f}s] {msg}", flush=True)


T0 = time.time()


# --------------------------------------------------------------------------
# phase: gen — extend the reused corpus folder to N rows (idempotent)
# --------------------------------------------------------------------------

def phase_gen(corpus: str, root: str):
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench_index_10m import make_corpus

    os.makedirs(corpus, exist_ok=True)
    # which gen shards already exist with the right row count?
    needed = -(-N // GEN_SHARD)
    todo = []
    for si in range(needed):
        rows = min(GEN_SHARD, N - si * GEN_SHARD)
        p = os.path.join(corpus, f"emb_{si:04d}.npy")
        ok = False
        if os.path.exists(p):
            a = np.load(p, mmap_mode="r")
            ok = a.shape == (rows, D)
            del a
        if not ok:
            todo.append(si)
    _log(f"gen: {needed - len(todo)}/{needed} shards reusable, "
         f"{len(todo)} to draw")
    if todo:
        q = make_corpus(
            corpus, N, D, 64, clusters=CLUSTERS, within=0.4,
            shard_rows=GEN_SHARD, skip_shards=set(range(needed)) - set(todo),
        )
    else:
        q = None
    qpath = os.path.join(root, "queries_30m.npz")
    if not os.path.exists(qpath):
        if q is None:
            # queries drawn around cluster centers, same recipe as
            # make_corpus's held-out draw
            q = make_corpus(  # draws only queries when every shard exists
                corpus, N, D, 64, clusters=CLUSTERS, within=0.4,
                shard_rows=GEN_SHARD,
                skip_shards=set(range(needed)),
            )
        np.savez(qpath, q=q.astype(np.float32))
    _log(f"gen done (peak rss {_rss_gb():.1f} GB)")


# --------------------------------------------------------------------------
# phase: assemble — 15 gen files → BUILD_SHARDS big memmaps (streaming)
# --------------------------------------------------------------------------

def phase_assemble(corpus: str, root: str, reclaim: bool = False):
    shard_rows = N // BUILD_SHARDS
    gen_paths = [
        os.path.join(corpus, f"emb_{si:04d}.npy")
        for si in range(-(-N // GEN_SHARD))
    ]
    os.makedirs(os.path.join(root, "corpus30m"), exist_ok=True)

    def consumed(i):
        # reclaim disk as we go: once a gen shard is fully copied into a
        # build part it is dead weight (the whole flow peaks ~90 GB on a
        # ~110 GB disk without this)
        if reclaim and os.path.exists(gen_paths[i]):
            os.unlink(gen_paths[i])
            _log(f"assemble: reclaimed {os.path.basename(gen_paths[i])}")

    row = 0
    src_i, src_off = 0, 0
    for bi in range(BUILD_SHARDS):
        rows = shard_rows if bi < BUILD_SHARDS - 1 else N - row
        dst_path = os.path.join(root, "corpus30m", f"part_{bi:02d}.npy")
        if os.path.exists(dst_path):
            a = np.load(dst_path, mmap_mode="r")
            if a.shape == (rows, D):
                _log(f"assemble: part {bi} exists, skipping")
                row += rows
                # advance source cursor past these rows (static sizes —
                # the gen file may already be reclaimed on a resume)
                left = rows
                while left:
                    src_rows = min(GEN_SHARD, N - src_i * GEN_SHARD)
                    take = min(left, src_rows - src_off)
                    src_off += take
                    left -= take
                    if src_off == src_rows:
                        consumed(src_i)
                        src_i += 1
                        src_off = 0
                continue
            del a
        dst = np.lib.format.open_memmap(
            dst_path + ".tmp", mode="w+", dtype=np.float16, shape=(rows, D)
        )
        filled = 0
        pending = []  # reclaim only AFTER this part is finalized: a gen
        # shard can straddle two parts, and deleting it before os.replace
        # would strand a resume that must rebuild the unfinished part
        while filled < rows:
            src = np.load(gen_paths[src_i], mmap_mode="r")
            take = min(rows - filled, src.shape[0] - src_off)
            # stream in bounded chunks: both sides are memmaps
            for o in range(0, take, 1 << 20):
                c = min(1 << 20, take - o)
                dst[filled + o : filled + o + c] = src[
                    src_off + o : src_off + o + c
                ]
            filled += take
            src_off += take
            if src_off == src.shape[0]:
                del src
                pending.append(src_i)
                src_i += 1
                src_off = 0
        dst.flush()
        del dst
        os.replace(dst_path + ".tmp", dst_path)
        for i in pending:
            consumed(i)
        row += rows
        _log(f"assemble: part {bi} ({rows} rows) written "
             f"(rss {_rss_gb():.1f} GB)")


# --------------------------------------------------------------------------
# phase: train — coarse centroids on a sample (once for all shards)
# --------------------------------------------------------------------------

def phase_train(root: str):
    from clip_retrieval_tpu.ops import kmeans as km

    cpath = os.path.join(root, "coarse.npy")
    if os.path.exists(cpath):
        _log("train: coarse.npy exists, skipping")
        return
    parts = sorted(
        os.path.join(root, "corpus30m", p)
        for p in os.listdir(os.path.join(root, "corpus30m"))
        if p.endswith(".npy")
    )
    # ~64 rows/list training sample, drawn evenly from every part; the
    # 100M run (nlist=65536) overrides via env — 1M rows would leave only
    # 16 rows/list
    sample_rows = min(
        int(os.environ.get("CRT_BIG_TRAIN_SAMPLE", 1 << 20)), N
    )
    per = sample_rows // len(parts)
    rng = np.random.default_rng(11)
    blocks = []
    for p in parts:
        a = np.load(p, mmap_mode="r")
        take = min(per, a.shape[0])
        idx = np.sort(rng.choice(a.shape[0], size=take, replace=False))
        blocks.append(np.asarray(a[idx], np.float32))
        del a
    sample = np.concatenate(blocks)
    t0 = time.time()
    coarse = np.asarray(km.kmeans(sample, NLIST, niter=15, seed=5))
    np.save(cpath, coarse)
    _log(f"train: k-means {sample.shape} -> {NLIST} lists in "
         f"{time.time() - t0:.0f}s (rss {_rss_gb():.1f} GB)")


# --------------------------------------------------------------------------
# phase: shards — per-slice int8 builds against the shared centroids
# --------------------------------------------------------------------------

def phase_shards(root: str):
    from clip_retrieval_tpu.index.ivf_int8 import IVFInt8Index

    coarse = np.load(os.path.join(root, "coarse.npy"))
    parts = sorted(
        os.path.join(root, "corpus30m", p)
        for p in os.listdir(os.path.join(root, "corpus30m"))
        if p.endswith(".npy")
    )
    os.makedirs(os.path.join(root, "shards"), exist_ok=True)
    offset = 0
    timings = []
    for bi, p in enumerate(parts):
        out = os.path.join(root, "shards", f"shard_{bi:02d}")
        x = np.load(p, mmap_mode="r")
        if os.path.exists(os.path.join(out, "header.json")):
            _log(f"shards: shard {bi} exists, skipping")
            offset += x.shape[0]
            continue
        t0 = time.time()
        ix = IVFInt8Index.from_vectors(
            x, nlist=NLIST, nprobe=64, coarse=coarse, id_offset=offset
        )
        build_s = time.time() - t0
        t0 = time.time()
        ix.save(out)
        save_s = time.time() - t0
        timings.append(
            {"shard": bi, "rows": int(x.shape[0]),
             "build_s": round(build_s, 1), "save_s": round(save_s, 1),
             "peak_rss_gb": round(_rss_gb(), 2)}
        )
        _log(f"shards: shard {bi} built {build_s:.0f}s saved {save_s:.0f}s "
             f"(rss {_rss_gb():.1f} GB)")
        offset += x.shape[0]
        del ix, x
    tpath = os.path.join(root, "shard_timings.json")
    if not timings and os.path.exists(tpath):
        return  # resume skipped every shard — keep the recorded timings
    with open(tpath, "w") as f:
        json.dump(timings, f, indent=1)


# --------------------------------------------------------------------------
# phase: combine — index_combiner over the shard dirs
# --------------------------------------------------------------------------

def phase_combine(root: str):
    from clip_retrieval_tpu.index.combiner import index_combiner

    merged_dir = os.path.join(root, "merged")
    if os.path.exists(os.path.join(merged_dir, "populated.index",
                                   "header.json")):
        _log("combine: merged index exists, skipping")
        return
    t0 = time.time()
    merged = index_combiner(os.path.join(root, "shards"), merged_dir)
    out = {
        "combine_s": round(time.time() - t0, 1),
        "ntotal": int(merged.ntotal),
        "nlist": int(merged.nlist),
        "peak_rss_gb": round(_rss_gb(), 2),
    }
    with open(os.path.join(root, "combine_stats.json"), "w") as f:
        json.dump(out, f, indent=1)
    _log(f"combine: {out}")


# --------------------------------------------------------------------------
# phase: gt — exact ground truth, global + per-first-shard (streamed)
# --------------------------------------------------------------------------

def phase_gt(root: str):
    import jax
    import jax.numpy as jnp

    gtpath = os.path.join(root, "gt.npz")
    if os.path.exists(gtpath):
        _log("gt: exists, skipping")
        return
    q = np.load(os.path.join(root, "queries_30m.npz"))["q"]
    qd = jnp.asarray(q)
    parts = sorted(
        os.path.join(root, "corpus30m", p)
        for p in os.listdir(os.path.join(root, "corpus30m"))
        if p.endswith(".npy")
    )
    k = 10
    chunk = 1 << 21

    @jax.jit
    def topk_chunk(qd, block):
        scores = qd @ block.T.astype(jnp.float32)
        return jax.lax.top_k(scores, k)

    def merge(vals, ids, nv, ni):
        av = np.concatenate([vals, nv], axis=1)
        ai = np.concatenate([ids, ni], axis=1)
        sel = np.argsort(-av, axis=1)[:, :k]
        r = np.arange(av.shape[0])[:, None]
        return av[r, sel], ai[r, sel]

    g_vals = np.full((q.shape[0], k), -np.inf, np.float32)
    g_ids = np.full((q.shape[0], k), -1, np.int64)
    shard_gt = {}
    base = 0
    for bi, p in enumerate(parts):
        a = np.load(p, mmap_mode="r")
        s_vals = np.full((q.shape[0], k), -np.inf, np.float32)
        s_ids = np.full((q.shape[0], k), -1, np.int64)
        for o in range(0, a.shape[0], chunk):
            block = np.asarray(a[o : o + chunk])
            nv, ni = topk_chunk(qd, jnp.asarray(block))
            nv = np.asarray(nv)
            ni = np.asarray(ni, np.int64) + (base + o)
            s_vals, s_ids = merge(s_vals, s_ids, nv, ni)
        g_vals, g_ids = merge(g_vals, g_ids, s_vals, s_ids)
        shard_gt[f"shard{bi}_ids"] = s_ids
        base += a.shape[0]
        _log(f"gt: part {bi} scanned (rss {_rss_gb():.1f} GB)")
        del a
    np.savez(gtpath, global_ids=g_ids, **shard_gt)
    _log("gt: written")


# --------------------------------------------------------------------------
# phase: serve_chip — single-chip QPS + recall on shard 0 (real TPU)
# --------------------------------------------------------------------------

def device_busy_qps_exact(ix, batches, k=10):
    """Device-busy throughput of the exact-union two-phase search, the
    number a PCIe-attached host would see: dispatch every batch's coarse
    probe back-to-back and block once (device coarse time), build the
    union selections on host (untimed readbacks — pure harness-relay RTT
    a PCIe host does not pay; the ~µs selection build is timed), then
    dispatch every scan back-to-back and block once (device scan time).
    Returns (qps, detail dict).  Batches must be distinct query batches so
    unions differ like production traffic."""
    import jax
    import jax.numpy as jnp

    from clip_retrieval_tpu.index.ivf_int8 import _scan_selected_device

    # full warm pass: compiles the coarse program and every ¼-pow2 scan
    # bucket these batches hit (buckets are deterministic given the data)
    for qb in batches:
        ix.search(qb, k)
    hs = []
    t0 = time.time()
    for qb in batches:
        hs.append(ix._search_int8_dispatch(qb, k))
    jax.block_until_ready(hs[-1]["per_q"])
    t_coarse = time.time() - t0
    sels, t_host, real_unions = [], 0.0, []
    for h in hs:
        pq = np.asarray(h["per_q"])  # harness RTT, untimed
        t1 = time.time()
        sels.append(ix._union_chunk_sel(pq))
        t_host += time.time() - t1
        real_unions.append(ix.last_union_chunks)
    dv = ix._device
    k_dev = hs[0]["k_dev"]
    outs = []
    t0 = time.time()
    for h, sel in zip(hs, sels):
        outs.append(
            _scan_selected_device(
                h["q"], dv["rows"], dv["scales"], dv["ids"],
                jnp.asarray(sel), k_dev, ix.exact_topk,
                # same impl the warm pass (ix.search) compiled — a
                # mismatch would put fresh XLA compiles inside the timed
                # region (measured: 703 ms/batch of pure compile noise)
                impl=ix._scan_impl(),
            )
        )
    jax.block_until_ready(outs[-1])  # single device stream: FIFO
    t_scan = time.time() - t0
    nq = sum(b.shape[0] for b in batches)
    busy = t_coarse + t_host + t_scan
    detail = {
        "coarse_ms_per_batch": round(t_coarse / len(batches) * 1e3, 3),
        "host_sel_ms_per_batch": round(t_host / len(batches) * 1e3, 3),
        "scan_ms_per_batch": round(t_scan / len(batches) * 1e3, 3),
        "union_chunks_mean": round(float(np.mean(real_unions)), 1),
        "padded_chunks_mean": round(
            float(np.mean([len(s) for s in sels])), 1
        ),
    }
    return nq / busy, detail


def device_busy_qps_static(ix, batches, k=10):
    """Static mode is a single dispatch per batch: back-to-back dispatch,
    block once — total device time over the batch stream."""
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


def phase_serve_chip(root: str):
    import jax

    from clip_retrieval_tpu.index.ivf_int8 import (
        IVFInt8Index,
        _next_pow2,
        chunk_budget,
    )

    ix = IVFInt8Index.load(os.path.join(root, "shards", "shard_00"))
    q = np.load(os.path.join(root, "queries_30m.npz"))["q"]
    gt = np.load(os.path.join(root, "gt.npz"))["shard0_ids"]
    from clip_retrieval_tpu.index.build import _recall_vs_gt

    t0 = time.time()
    _ = ix.search(q[:1], 10)  # device image upload + compile
    _log(f"serve_chip: warmup {time.time() - t0:.0f}s")
    rows = {"rows": int(ix.ntotal), "nlist": int(ix.nlist),
            "d": int(ix.d),
            "platform": jax.devices()[0].platform, "qps": [],
            "recall": {}}
    nprobes = [p for p in (16, 32, 64, 128) if p <= NLIST]
    # recall eval in serving-shaped chunks: one 256-query dispatch at
    # nprobe>=64 unions most of the 16384 lists, so the gathered-rows GEMM
    # plus its (nq, rows) score buffer exceeds the 16 GB HBM (measured:
    # 17.7 GB requested).  The serving path micro-batches queries to <=64,
    # so chunking here also measures the shape production actually runs.
    chunk = 64
    for nprobe in nprobes:
        ix.nprobe = nprobe
        got = np.concatenate(
            [np.asarray(ix.search(q[o:o + chunk], 10)[1])
             for o in range(0, q.shape[0], chunk)]
        )
        rows["recall"][str(nprobe)] = round(_recall_vs_gt(gt, got), 4)
    _log(f"serve_chip: recall curve {rows['recall']}")
    # pick the smallest nprobe reaching 0.95, else the largest probed
    chosen = next(
        (p for p in nprobes if rows["recall"][str(p)] >= 0.95),
        nprobes[-1],
    )
    ix.nprobe = chosen
    rows["nprobe"] = chosen
    for B in (1, 16, 64):
        # distinct batches, wrapping over the 256 held-out queries
        iters = 20 if B <= 16 else 10
        batches = [
            q[(i * B) % (q.shape[0] - B + 1):][:B] for i in range(iters)
        ]
        qb = batches[0]
        for _ in range(3):
            ix.search(qb, 10)
        t0 = time.time()
        for _ in range(iters):
            ix.search(qb, 10)
        dt = (time.time() - t0) / iters
        row = {"batch": B, "search_qps": round(B / dt, 1),
               "ms_per_query": round(dt / B * 1e3, 3)}
        # device-busy A/B: exact union vs the r4 static worst case —
        # VERDICT r4 next-step #1 (the ~25x union inflation)
        ix.union = "exact"
        qps_ex, detail = device_busy_qps_exact(ix, batches, 10)
        ix.union = "static"
        qps_st = device_busy_qps_static(ix, batches, 10)
        ix.union = "exact"
        row["device_qps_exact_union"] = round(qps_ex, 1)
        row["device_qps_static_union"] = round(qps_st, 1)
        row["exact_union_detail"] = detail
        if B == 64:
            row["static_chunk_cap"] = int(
                _next_pow2(chunk_budget(ix._chunk_counts, B * chosen))
            )
        rows["qps"].append(row)
        _log(f"serve_chip: {row}")
    rows["union_mode"] = "exact (device_qps_static_union = r4 path)"
    rows["peak_rss_gb"] = round(_rss_gb(), 2)
    with open(os.path.join(root, "serve_chip.json"), "w") as f:
        json.dump(rows, f, indent=1)


# --------------------------------------------------------------------------
# phase: serve_mesh — merged 30M on the 8-device CPU mesh (recall proof)
# --------------------------------------------------------------------------

def phase_serve_mesh(root: str):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from clip_retrieval_tpu.index.build import _recall_vs_gt
    from clip_retrieval_tpu.index.store import load_index

    ix = load_index(
        os.path.join(root, "merged", "populated.index"), sharded=True
    )
    q = np.load(os.path.join(root, "queries_30m.npz"))["q"]
    gt = np.load(os.path.join(root, "gt.npz"))["global_ids"]
    out = {"rows": int(ix.ntotal), "devices": len(jax.devices()),
           "nlist": int(ix.nlist), "d": int(ix.d), "recall": {}}
    nq = 64  # CPU mesh: correctness/recall evidence, not throughput
    sweep = tuple(
        int(s) for s in os.environ.get(
            "CRT_BIG_MESH_NPROBES", "32,64,128"
        ).split(",")
    )
    for nprobe in [p for p in sweep if p <= NLIST]:
        ix.nprobe = nprobe
        # warm first: the first call at each nprobe pays XLA compile (r4's
        # unwarmed serve_mesh read nprobe=32 as 3x SLOWER than nprobe=64
        # because it absorbed the program compile — VERDICT r4 weak #6)
        t0 = time.time()
        ix.search(q[:nq], 10)
        compile_s = time.time() - t0
        t0 = time.time()
        got = ix.search(q[:nq], 10)[1]
        out["recall"][str(nprobe)] = {
            "recall@10": round(_recall_vs_gt(gt[:nq], got), 4),
            "wall_s": round(time.time() - t0, 1),
            "first_call_s": round(compile_s, 1),
        }
        if getattr(ix, "last_union_chunks", None):
            # per-shard probed-union sizes feed the §6 capacity model
            out["recall"][str(nprobe)]["union_chunks_per_shard"] = list(
                map(int, ix.last_union_chunks)
            )
        _log(f"serve_mesh: nprobe={nprobe} {out['recall'][str(nprobe)]}")
    out["peak_rss_gb"] = round(_rss_gb(), 2)
    with open(os.path.join(root, "serve_mesh.json"), "w") as f:
        json.dump(out, f, indent=1)


PHASES = {
    "gen": phase_gen,
    "assemble": phase_assemble,
    "train": phase_train,
    "shards": phase_shards,
    "combine": phase_combine,
    "gt": phase_gt,
    "serve_chip": phase_serve_chip,
    "serve_mesh": phase_serve_mesh,
}
# phases that must run on the CPU mesh (fresh env, 8 virtual devices)
CPU_PHASES = {"serve_mesh"}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--corpus", required=True,
                    help="gen-shard folder (reused/extended in place)")
    ap.add_argument("--phase", default="all")
    ap.add_argument("--reclaim", action="store_true",
                    help="delete gen shards once copied into build parts "
                         "(halves peak disk; gen shards are then gone)")
    ap.add_argument(
        "--out",
        default=os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "big_index_tpu.json"),
    )
    args = ap.parse_args()
    os.makedirs(args.root, exist_ok=True)

    def parts_complete():
        # gen shards are deleted by --reclaim once copied into build parts;
        # on a resume, finished parts + queries mean gen/assemble are done
        row = 0
        shard_rows = N // BUILD_SHARDS
        for bi in range(BUILD_SHARDS):
            rows = shard_rows if bi < BUILD_SHARDS - 1 else N - row
            p = os.path.join(args.root, "corpus30m", f"part_{bi:02d}.npy")
            if not os.path.exists(p):
                return False
            a = np.load(p, mmap_mode="r")
            ok = a.shape == (rows, D)
            del a
            if not ok:
                return False
            row += rows
        return os.path.exists(os.path.join(args.root, "queries_30m.npz"))

    if args.phase == "all":
        results = {}
        skip_src = parts_complete()
        for name in PHASES:
            if name in ("gen", "assemble") and skip_src:
                print(f"[big30m] {name}: assembled parts + queries on "
                      "disk, skipping", flush=True)
                results[name] = {"wall_s": 0.0, "rc": 0}
                continue
            env = dict(os.environ)
            if name in CPU_PHASES:
                env["JAX_PLATFORMS"] = "cpu"
                env["XLA_FLAGS"] = (
                    env.get("XLA_FLAGS", "")
                    + " --xla_force_host_platform_device_count=8"
                )
                # drop the axon sitecustomize so the cpu platform wins
                env["PYTHONPATH"] = os.pathsep.join(
                    p for p in env.get("PYTHONPATH", "").split(os.pathsep)
                    if "axon" not in p
                )
            t0 = time.time()
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--root", args.root, "--corpus", args.corpus,
                 "--phase", name]
                + (["--reclaim"] if args.reclaim else []),
                env=env,
            )
            results[name] = {
                "wall_s": round(time.time() - t0, 1),
                "rc": r.returncode,
            }
            if r.returncode:
                print(json.dumps({"failed": name, **results}))
                sys.exit(1)
        # final summary JSON for benchmarks/
        summary = {"metric": f"big_index_{N // 1_000_000}m_rehearsal",
                   "n": N, "d": D,
                   "nlist": NLIST, "build_shards": BUILD_SHARDS,
                   "phase_wall_s": {k: v["wall_s"] for k, v in
                                    results.items()}}
        for f_ in ("shard_timings", "combine_stats", "serve_chip",
                   "serve_mesh"):
            p = os.path.join(args.root, f_ + ".json")
            if os.path.exists(p):
                with open(p) as fh:
                    summary[f_] = json.load(fh)
        with open(args.out, "w") as fh:
            json.dump(summary, fh, indent=1)
        print(json.dumps(summary))
        print(f"wrote {args.out}")
        return
    if args.phase in ("gen",):
        PHASES[args.phase](args.corpus, args.root)
    elif args.phase in ("assemble",):
        PHASES[args.phase](args.corpus, args.root, reclaim=args.reclaim)
    else:
        PHASES[args.phase](args.root)


if __name__ == "__main__":
    main()
