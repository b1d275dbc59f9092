"""Refine-tier recall at the 100M-tier shape (d=64, true 10^8-row build).

The 100M rehearsal built its shards WITHOUT a refine store (disk budget),
and its recall curve plateaus at ~0.53 per shard / 0.86 mesh@128 — flat in
nprobe, the signature that candidates ARE probed but int8 scoring misranks
them (at d=64 one int8 step is ~1.5 % of a unit vector, an order coarser
than at d=512 — the same plateau mechanism as the 10M clustered PQ run,
README "At scale").  The production answer is the refine tier the build
uses by default at 10M (`IVF…,Flat8,RFlat`): re-score rerank_factor·k
candidates against the original fp16 rows.

The original fp16 rows already sit on disk as the assembled corpus parts
(id order — exactly the ShardRowGather layout), so this bench attaches
part_00 as shard_00's refine store and sweeps rerank_factor at fixed
nprobe: recall must climb off the plateau toward ≥0.95 with NO index
rebuild.  Writes benchmarks/big_index_100m_refine_tpu.json.

Run:  python benchmarks/bench_refine_100m.py --root /root/bench_artifacts/big100m
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
    ap.add_argument("--root", default="/root/bench_artifacts/big100m")
    ap.add_argument("--nprobe", type=int, default=64)
    ap.add_argument("--factors", type=int, nargs="+",
                    default=[1, 4, 8, 16, 32])
    ap.add_argument("--chunk", type=int, default=64)
    args = ap.parse_args()

    from clip_retrieval_tpu.index.build import _recall_vs_gt
    from clip_retrieval_tpu.index.ivf_int8 import IVFInt8Index

    ix = IVFInt8Index.load(os.path.join(args.root, "shards", "shard_00"))
    q = np.load(os.path.join(args.root, "queries_30m.npz"))["q"]
    gt = np.load(os.path.join(args.root, "gt.npz"))["shard0_ids"]
    # shard_00 is built with id_offset=0 over corpus part_00, so its result
    # ids index part_00 directly — the corpus part IS the refine store
    part0 = np.load(
        os.path.join(args.root, "corpus30m", "part_00.npy"), mmap_mode="r"
    )
    assert part0.shape[0] == ix.ntotal, (part0.shape, ix.ntotal)
    ix.nprobe = args.nprobe
    ix.refine_vectors = part0

    print(f"n={ix.ntotal} d={ix.d} nlist={ix.nlist} nprobe={ix.nprobe}",
          flush=True)
    _ = ix.search(q[:1], 10)  # upload + compile
    rows = []
    for rf in args.factors:
        ix.rerank_factor = rf
        t0 = time.time()
        got = np.concatenate(
            [np.asarray(ix.search(q[o:o + args.chunk], 10)[1])
             for o in range(0, q.shape[0], args.chunk)]
        )
        wall = time.time() - t0
        r = round(_recall_vs_gt(gt, got), 4)
        rows.append({"rerank_factor": rf, "recall@10": r,
                     "wall_s": round(wall, 1),
                     "refine_rows_per_query": rf * 10})
        print(rows[-1], flush=True)

    import jax

    out = {
        "metric": "big_index_100m_refine_recall",
        "rows": int(ix.ntotal),
        "d": int(ix.d),
        "nlist": int(ix.nlist),
        "nprobe": args.nprobe,
        "platform": jax.devices()[0].platform,
        "sweep": rows,
        "note": "shard_00 of the 100M d=64 build re-served with the "
        "assembled fp16 corpus part as its refine store (zero rebuild): "
        "rerank_factor=1 is the int8-only plateau, higher factors re-score "
        "rf*10 exact fp16 rows per query (host mmap reads).",
    }
    path = os.path.join(
        os.path.dirname(__file__),
        "big_index_100m_refine_tpu.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
