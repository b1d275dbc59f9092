"""Serving with reorder_metadata_by_ivf_index: hdf5 reordered metadata,
old→new id remapping, and the dynamic-nprobe rule."""

import json

import numpy as np
import pandas as pd
import pytest

from clip_retrieval_tpu.back.app import make_app
from clip_retrieval_tpu.back.options import ClipOptions
from clip_retrieval_tpu.back.resources import load_clip_indices
from clip_retrieval_tpu.index.build import clip_index

from .wsgi_client import request

D = 32


def _unit(x):
    return (x / np.linalg.norm(x, axis=-1, keepdims=True)).astype(np.float32)


@pytest.fixture(scope="module")
def reordered_stack(tmp_path_factory):
    root = tmp_path_factory.mktemp("reorder")
    emb = root / "emb"
    (emb / "img_emb").mkdir(parents=True)
    (emb / "metadata").mkdir(parents=True)
    rng = np.random.default_rng(1)
    n = 600
    centers = _unit(rng.normal(size=(8, D)))
    x = _unit(centers[rng.integers(0, 8, n)] + 0.2 * rng.normal(size=(n, D)))
    np.save(emb / "img_emb" / "img_emb_0.npy", x.astype(np.float16))
    pd.DataFrame(
        {
            "caption": [f"cap {i}" for i in range(n)],
            "url": [f"http://x/{i}" for i in range(n)],
        }
    ).to_parquet(emb / "metadata" / "metadata_0.parquet")

    index_folder = str(root / "index")
    clip_index(
        str(emb),
        index_folder,
        index_key="IVF16,PQ16",
        nprobe=16,
        compute_recall=False,
    )
    paths = root / "indices_paths.json"
    paths.write_text(json.dumps({"r": index_folder}))
    resources = load_clip_indices(
        str(paths),
        ClipOptions(
            clip_model="test-tiny",
            columns_to_return=["caption", "url"],
            enable_hdf5=True,
            reorder_metadata_by_ivf_index=True,
            provide_aesthetic_embeddings=False,
        ),
    )
    return {"app": make_app(resources), "x": x, "res": resources["r"]}


def test_reordered_artifacts(reordered_stack):
    res = reordered_stack["res"]
    assert res.metadata_is_ordered_by_ivf
    assert res.ivf_old_to_new_mapping is not None
    # mapping is a permutation
    m = np.asarray(res.ivf_old_to_new_mapping)
    np.testing.assert_array_equal(np.sort(m), np.arange(len(m)))


def test_query_returns_reordered_consistent_metadata(reordered_stack):
    """Result ids are new (IVF-order) ids and the metadata they fetch must
    be the metadata of the original vector."""
    x = reordered_stack["x"]
    q = x[123]
    r = request(
        reordered_stack["app"],
        "POST",
        "/knn-service",
        {
            "embedding_input": q.tolist(),
            "modality": "image",
            "num_images": 5,
            "indice_name": "r",
        },
    )
    results = r["json"]
    assert results, r["body"]
    top = results[0]
    # top hit should be (a near-duplicate of) vector 123 → caption "cap 123"
    # under PQ distortion the true top-1 may rank within the top few
    caps = [item["caption"] for item in results]
    caps = [c.decode() if isinstance(c, bytes) else c for c in caps]
    assert "cap 123" in caps, caps
    assert top["similarity"] <= 1.05


def test_dynamic_nprobe_rule(reordered_stack):
    res = reordered_stack["res"]
    before = res.image_index.nprobe
    r = request(
        reordered_stack["app"],
        "POST",
        "/knn-service",
        {
            "embedding_input": reordered_stack["x"][0].tolist(),
            "modality": "image",
            "num_images": 3,
            "num_result_ids": 150000,  # ≥100k triggers nprobe=ceil(k/3000)
            "indice_name": "r",
        },
    )
    assert r["status"].startswith("200")
    # nprobe restored after the request
    assert res.image_index.nprobe == before
