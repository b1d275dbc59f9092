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


def test_missed_target_is_stamped_and_warns_at_serving_boot(tmp_path, caplog):
    """A build whose calibration can't reach the recall target must not ship
    silently: the outcome lands in the infos json AND the index header, and
    loading the index for serving logs a visible warning (the reference's
    autofaiss records achieved recall in its infos json; we go further and
    surface it at clip_back boot)."""
    import logging

    # isotropic corpus + nprobe capped at 1 → recall@10 far below target
    rng = np.random.default_rng(3)
    x = rng.normal(size=(4000, 32)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    emb = tmp_path / "emb"
    (emb / "img_emb").mkdir(parents=True)
    np.save(emb / "img_emb" / "img_emb_0.npy", x.astype(np.float16))
    out = tmp_path / "index"
    clip_index(
        str(emb), str(out), index_key="IVF64,Flat8", copy_metadata=False,
        max_nprobe=1,
    )
    cal = json.load(open(out / "image.json"))["nprobe_calibration"]
    assert cal["target_missed"] is True
    assert cal["recall_achieved"] < cal["target_recall"]
    header = json.load(open(out / "image.index" / "header.json"))
    assert header["calibration"]["target_missed"] is True
    with caplog.at_level(logging.WARNING, logger="clip_back"):
        load_index(str(out / "image.index"))
    assert any("MISSED its recall target" in r.message for r in caplog.records)


def test_hit_target_records_no_missed_flag(tmp_path, caplog):
    import logging

    x = _clustered(n=4000)
    emb = tmp_path / "emb"
    (emb / "img_emb").mkdir(parents=True)
    np.save(emb / "img_emb" / "img_emb_0.npy", x.astype(np.float16))
    out = tmp_path / "index"
    clip_index(
        str(emb), str(out), index_key="IVF64,Flat8", copy_metadata=False
    )
    header = json.load(open(out / "image.index" / "header.json"))
    assert header["calibration"]["target_missed"] is False
    with caplog.at_level(logging.WARNING, logger="clip_back"):
        load_index(str(out / "image.index"))
    assert not any(
        "MISSED its recall target" in r.message for r in caplog.records
    )


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


def test_plateau_miss_calibrates_rerank_factor(tmp_path):
    """When the nprobe sweep plateaus below target on a refine-tier index
    (PQ ranking error, not candidate-cell misses — the clustered-corpus
    regime), calibration must raise rerank_factor until the target is met,
    and the choice must persist through save/load like nprobe does."""
    from clip_retrieval_tpu.index.autotune import parse_index_key
    from clip_retrieval_tpu.index.build import build_index_from_shards

    rng = np.random.default_rng(7)
    centers = rng.normal(size=(24, 32)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    x = centers[rng.integers(0, 24, 4000)] + 0.15 * rng.normal(
        size=(4000, 32)
    ).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    folder = tmp_path / "emb"
    folder.mkdir()
    np.save(folder / "e.npy", x.astype(np.float16))
    shards = EmbeddingShards(str(folder))
    # coarse PQ (8 subquantizers on d=32) + refine, but rerank_factor=1:
    # the ADC top-k IS the answer, so recall is PQ-ranking-bound and more
    # nprobe cannot reach the target
    ix = build_index_from_shards(
        shards, parse_index_key("IVF64,PQ8", 32), nprobe=1, refine=True
    )
    ix.rerank_factor = 1
    cal = calibrate_nprobe(ix, shards, target_recall=0.95, k=10)
    assert not cal["target_missed"], cal
    assert cal.get("rerank_factor", 1) > 1
    assert ix.rerank_factor == cal["rerank_factor"]
    assert cal["recall_achieved"] >= 0.95
    assert max(cal["recall_curve"].values()) < 0.95  # nprobe alone missed
    # persisted: serving sees the calibrated factor
    out = tmp_path / "ix"
    ix.save(str(out))
    loaded = load_index(str(out))
    assert loaded.rerank_factor == cal["rerank_factor"]
    assert loaded.nprobe == cal["nprobe"]
