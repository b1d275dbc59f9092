"""The 10k-QPS@100M capacity model, tied to measured artifacts.

BASELINE.md north star: >=10k QPS at recall@10 >= 0.95 on a 100M-vector
index.  This script derives QPS(mesh, rows/chip, nlist, nprobe) for a
v5e-8 from quantities MEASURED in this repo — no free parameters:

- R_scan (effective scan rate, bytes of probed int8 rows per second of
  device scan time, including the chunk gather, the GEMM, the score
  materialization and the top-k) and T_fixed (coarse probe + host union
  build per batch) come from `serve_chip.json`'s exact-union detail rows
  (real v5e chip, 10M x 512);
- the probed-union model E[distinct lists] = L*(1-(1-1/L)^(B*p)) is
  validated against the per-shard unions the 30M mesh run actually
  probed (`serve_mesh.json: union_chunks_per_shard`);
- per-shard nprobe needed for recall@10 >= 0.95 comes from the measured
  mesh recall curves (30M x 512 and the 100M x 64 true-row-count run).

Mesh timing model (queries replicated, lists sharded — sharded_ivf.py):
every chip scans its own local probed union in parallel, then one
all_gather of (B, k) val+id pairs (B*k*12 bytes per chip over ICI at
45 GB/s per link — microseconds, ignored):

    T_batch = T_fixed + union_bytes_per_chip / R_scan
    QPS     = B / T_batch

Writes benchmarks/capacity_100m.json and prints the derivation; §6 of
docs/big_index_serving.md quotes this output.

    python benchmarks/capacity_model.py \
        --serve_chip /root/bench_artifacts/big30m/serve_chip.json \
        --serve_mesh /root/bench_artifacts/big30m/serve_mesh.json
"""

import argparse
import json
import os

import numpy as np

V5E_HBM_GBPS = 819  # spec sheet, for the speed-of-light comparison only


def expected_distinct(nlists: float, draws: float) -> float:
    """E[distinct lists probed] when B*p per-query choices land ~uniformly
    over `nlists` lists (worst case: real correlated traffic overlaps
    more and probes FEWER)."""
    return nlists * (1.0 - (1.0 - 1.0 / nlists) ** draws)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--serve_chip", required=True)
    ap.add_argument("--serve_mesh", required=True)
    ap.add_argument("--d", type=int, default=512)
    ap.add_argument("--rows", type=int, default=100_000_000)
    ap.add_argument("--n_chips", type=int, default=8)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--lc", type=int, default=256)
    ap.add_argument(
        "--out",
        default=os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "capacity_100m.json"),
    )
    args = ap.parse_args()

    with open(args.serve_chip) as f:
        chip = json.load(f)
    with open(args.serve_mesh) as f:
        mesh = json.load(f)

    # ---- 1. measured scan rate + fixed overhead (real chip) --------------
    row64 = next(r for r in chip["qps"] if r["batch"] == args.batch)
    det = row64["exact_union_detail"]
    chip_d = chip.get("d", 512)
    union_bytes = det["union_chunks_mean"] * args.lc * chip_d  # int8 rows
    r_scan = union_bytes / (det["scan_ms_per_batch"] / 1e3)  # B/s
    t_fixed_s = (
        det["coarse_ms_per_batch"] + det["host_sel_ms_per_batch"]
    ) / 1e3
    measured = {
        "source": os.path.basename(args.serve_chip),
        "rows": chip["rows"],
        "nprobe": chip["nprobe"],
        "batch": args.batch,
        "union_chunks_mean": det["union_chunks_mean"],
        "scan_ms_per_batch": det["scan_ms_per_batch"],
        "R_scan_GBps_effective": round(r_scan / 1e9, 1),
        "hbm_speed_of_light_GBps": V5E_HBM_GBPS,
        "scan_efficiency_vs_hbm": round(r_scan / 1e9 / V5E_HBM_GBPS, 2),
        "T_fixed_ms": round(t_fixed_s * 1e3, 3),
        "device_qps_exact_union": row64["device_qps_exact_union"],
    }

    # ---- 2. validate the union model vs the mesh run's real unions -------
    validation = []
    n_dev_mesh = mesh.get("devices", 8)
    mesh_rows = mesh["rows"]
    # serve_mesh's NLIST isn't stored per entry; recover from the summary
    nlist_mesh = mesh.get("nlist", 16384)
    for nprobe, entry in mesh.get("recall", {}).items():
        per_shard = entry.get("union_chunks_per_shard")
        if not per_shard:
            continue
        l_s = nlist_mesh / n_dev_mesh
        pred_lists = expected_distinct(
            l_s, args.batch * min(int(nprobe), l_s)
        )
        mean_list_rows = mesh_rows / nlist_mesh
        chunks_per_list = max(1.0, np.ceil(mean_list_rows / args.lc))
        pred_chunks = pred_lists * chunks_per_list
        validation.append({
            "nprobe": int(nprobe),
            "measured_mean_chunks_per_shard": round(
                float(np.mean(per_shard)), 1
            ),
            "predicted_chunks_per_shard": round(float(pred_chunks), 1),
            "recall@10": entry["recall@10"],
        })

    # ---- 3. the 100M projection ------------------------------------------
    rows_per_chip = args.rows / args.n_chips
    bytes_per_row = args.d  # int8
    table = []
    for nlist in (16_384, 65_536, 131_072, 262_144):
        l_s = nlist / args.n_chips
        mean_list_rows = args.rows / nlist
        chunks_per_list = float(np.ceil(mean_list_rows / args.lc))
        pad = chunks_per_list * args.lc / mean_list_rows  # chunk padding
        for p_s in (16, 32, 64, 128):
            if p_s > l_s:
                continue
            u_lists = expected_distinct(l_s, args.batch * p_s)
            union_rows = u_lists * chunks_per_list * args.lc
            union_bytes_chip = union_rows * bytes_per_row
            t_batch = t_fixed_s + union_bytes_chip / r_scan
            qps = args.batch / t_batch
            table.append({
                "nlist": nlist,
                "per_shard_nprobe": p_s,
                "effective_global_probes": p_s * args.n_chips,
                "scan_fraction_per_chip": round(
                    union_rows / rows_per_chip, 3
                ),
                "chunk_padding_overhead": round(pad - 1.0, 3),
                "t_batch_ms": round(t_batch * 1e3, 2),
                "qps_one_mesh": round(qps, 0),
                "meshes_for_10k": round(10_000 / qps, 2),
            })

    out = {
        "metric": "capacity_model_100m",
        "target": "10k QPS @ recall@10 >= 0.95 on 100M (BASELINE.md)",
        "mesh": f"v5e-{args.n_chips}",
        "batch": args.batch,
        "d": args.d,
        "measured_inputs": measured,
        "union_model_validation_vs_mesh_run": validation,
        "projection": table,
        "notes": [
            "E[distinct] assumes uniform probes — real correlated traffic "
            "overlaps more, probes FEWER lists, and serves HIGHER QPS; "
            "this is the conservative end.",
            "recall: the 30M mesh measured >=0.97 at per-shard nprobe 32 "
            "(nlist 16384, i.e. 2048 local lists/shard); larger nlist at "
            "fixed per-shard nprobe keeps the same NUMBER of probed lists "
            "per shard while each list is nlist-times smaller — the "
            "per-shard nprobe needed for 0.95 is validated per geometry "
            "by the rehearsal runs, not assumed.",
            "all_gather merge cost ignored: B*k*12 bytes per chip over "
            "ICI is microseconds at B=64,k=40.",
        ],
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
