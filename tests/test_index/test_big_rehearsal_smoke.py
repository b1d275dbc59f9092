"""End-to-end smoke of the 100M-tier rehearsal driver at toy scale.

benchmarks/bench_big_index.py is the script that produces the at-scale
build→combine→serve evidence (big_index_tpu.json); this test proves every
phase of it — corpus gen, assembly, shared-centroid training, per-shard
int8 builds, index_combiner, ground truth, single-device serve, mesh
serve — executes and yields sane recall, so a failure at 30M can only be
scale, not logic.  Marked slow (~3-4 min: eight subprocesses, each paying
JAX startup on one CPU core).
"""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

BENCH = os.path.join(
    os.path.dirname(__file__), "..", "..", "benchmarks", "bench_big_index.py"
)


def test_rehearsal_all_phases(tmp_path):
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        CRT_BIG_N="30000",
        CRT_BIG_D="64",
        CRT_BIG_GEN_SHARD="8192",
        CRT_BIG_NLIST="64",
        CRT_BIG_CLUSTERS="300",
    )
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if "axon" not in p
    )
    out = str(tmp_path / "summary.json")
    r = subprocess.run(
        [sys.executable, os.path.abspath(BENCH),
         "--root", str(tmp_path / "root"),
         "--corpus", str(tmp_path / "corpus"),
         "--phase", "all", "--out", out, "--reclaim"],
        env=env, capture_output=True, text=True, timeout=1200,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    # --reclaim: every gen shard was consumed into a build part and deleted
    assert not [p for p in os.listdir(tmp_path / "corpus")
                if p.startswith("emb_")]
    with open(out) as f:
        summary = json.load(f)
    assert summary["n"] == 30000
    chip = summary["serve_chip"]
    assert chip["rows"] == 10000
    best = max(float(v) for v in chip["recall"].values())
    assert best > 0.9, chip["recall"]
    mesh = summary["serve_mesh"]
    assert mesh["rows"] == 30000
    best_mesh = max(
        v["recall@10"] for v in mesh["recall"].values()
    )
    assert best_mesh > 0.9, mesh["recall"]
    # shard ids must tile the corpus: combine preserved every row
    assert summary["combine_stats"]["ntotal"] == 30000
