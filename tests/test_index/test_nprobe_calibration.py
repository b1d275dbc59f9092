"""Build-time nprobe calibration (autofaiss-parity hyperparameter tuning):
`clip_index(nprobe=None)` picks the smallest nprobe reaching the recall
target, records the curve in the infos json, and persists the choice in the
saved index header so serving uses it by default."""

import json
import os

import numpy as np

from clip_retrieval_tpu.index import load_index
from clip_retrieval_tpu.index.build import (
    EmbeddingShards,
    calibrate_nprobe,
    clip_index,
)
from clip_retrieval_tpu.index.ivf_int8 import IVFInt8Index


def _clustered(n=6000, d=32, centers=64, seed=0):
    rng = np.random.default_rng(seed)
    c = rng.normal(size=(centers, d)).astype(np.float32)
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    x = c[rng.integers(0, centers, n)] + 0.15 * rng.normal(size=(n, d)).astype(
        np.float32
    )
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return x.astype(np.float32)


def test_calibrate_nprobe_hits_target_and_is_minimal():
    x = _clustered()
    ix = IVFInt8Index.from_vectors(x, nlist=64, nprobe=1, kmeans_niter=5)

    import tempfile

    with tempfile.TemporaryDirectory() as td:
        np.save(os.path.join(td, "e.npy"), x.astype(np.float16))
        shards = EmbeddingShards(td)
        cal = calibrate_nprobe(ix, shards, target_recall=0.9, k=10)
    assert cal is not None
    assert ix.nprobe == cal["nprobe"]
    curve = {int(c): r for c, r in cal["recall_curve"].items()}
    assert curve[cal["nprobe"]] >= 0.9
    # minimal: every smaller probed candidate missed the target
    for c, r in curve.items():
        if c < cal["nprobe"]:
            assert r < 0.9


def test_clip_index_auto_nprobe_persists_to_serving(tmp_path):
    x = _clustered(n=4000)
    emb = tmp_path / "emb"
    (emb / "img_emb").mkdir(parents=True)
    np.save(emb / "img_emb" / "img_emb_0.npy", x.astype(np.float16))
    out = tmp_path / "index"
    clip_index(
        str(emb), str(out), index_key="IVF64,Flat8", copy_metadata=False
    )
    infos = json.load(open(out / "image.json"))
    assert "nprobe_calibration" in infos
    chosen = infos["nprobe_calibration"]["nprobe"]
    # the saved header carries the calibrated value → serving default
    loaded = load_index(str(out / "image.index"))
    assert loaded.nprobe == chosen


def test_calibration_skipped_for_flat_and_pinned_nprobe(tmp_path):
    x = _clustered(n=1500)
    emb = tmp_path / "emb"
    (emb / "img_emb").mkdir(parents=True)
    np.save(emb / "img_emb" / "img_emb_0.npy", x.astype(np.float16))
    flat_out = tmp_path / "flat"
    clip_index(str(emb), str(flat_out), index_key="Flat", copy_metadata=False)
    assert "nprobe_calibration" not in json.load(open(flat_out / "image.json"))
    pinned_out = tmp_path / "pinned"
    clip_index(
        str(emb), str(pinned_out), index_key="IVF32,Flat8", nprobe=7,
        copy_metadata=False,
    )
    assert "nprobe_calibration" not in json.load(
        open(pinned_out / "image.json")
    )
    assert load_index(str(pinned_out / "image.index")).nprobe == 7
