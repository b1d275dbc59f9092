"""Serving over an IVF-int8 index (the 100M-tier) end-to-end."""

import json

import numpy as np
import pandas as pd
import pytest

from clip_retrieval_tpu.back.app import make_app
from clip_retrieval_tpu.back.options import ClipOptions
from clip_retrieval_tpu.back.resources import load_clip_indices
from clip_retrieval_tpu.index.build import clip_index

from .wsgi_client import request


def test_ivf_int8_backend(tmp_path):
    emb = tmp_path / "emb"
    (emb / "img_emb").mkdir(parents=True)
    (emb / "metadata").mkdir(parents=True)
    rng = np.random.default_rng(3)
    n, d = 3000, 32
    centers = rng.normal(size=(16, d)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    x = centers[rng.integers(0, 16, n)] + 0.05 * rng.normal(size=(n, d)).astype(
        np.float32
    )
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    np.save(emb / "img_emb" / "img_emb_0.npy", x.astype(np.float16))
    pd.DataFrame({"caption": [f"c{i}" for i in range(n)]}).to_parquet(
        emb / "metadata" / "metadata_0.parquet"
    )
    index_folder = str(tmp_path / "index")
    clip_index(
        str(emb), index_folder, index_key="IVF16,Flat8", compute_recall=True
    )
    infos = json.load(open(index_folder + "/image.json"))
    assert infos["index_key"] == "IVF16,Flat8"
    assert infos["recall@40"] > 0.9

    paths = tmp_path / "ip.json"
    paths.write_text(json.dumps({"i8": index_folder}))
    resources = load_clip_indices(
        str(paths),
        ClipOptions(
            clip_model="test-tiny",
            columns_to_return=["caption"],
            provide_aesthetic_embeddings=False,
        ),
    )
    app = make_app(resources)
    r = request(
        app,
        "POST",
        "/knn-service",
        {
            "embedding_input": x[77].tolist(),
            "modality": "image",
            "num_images": 5,
            "indice_name": "i8",
        },
    )
    assert r["status"].startswith("200"), r["body"]
    results = r["json"]
    assert results[0]["id"] == 77
    assert results[0]["similarity"] > 0.98

    # same directory served on the list-sharded multi-chip tier via the
    # per-index JSON option overlay (sharded_index)
    from clip_retrieval_tpu.index.sharded_ivf import ShardedIVFInt8Index

    paths2 = tmp_path / "ip_sharded.json"
    paths2.write_text(
        json.dumps(
            {"i8s": {"indice_folder": index_folder, "sharded_index": True}}
        )
    )
    res2 = load_clip_indices(
        str(paths2),
        ClipOptions(
            clip_model="test-tiny",
            columns_to_return=["caption"],
            provide_aesthetic_embeddings=False,
        ),
    )
    assert isinstance(res2["i8s"].image_index, ShardedIVFInt8Index)
    app2 = make_app(res2)
    r2 = request(
        app2,
        "POST",
        "/knn-service",
        {
            "embedding_input": x[77].tolist(),
            "modality": "image",
            "num_images": 5,
            "indice_name": "i8s",
        },
    )
    assert r2["status"].startswith("200"), r2["body"]
    assert r2["json"][0]["id"] == 77
    assert r2["json"][0]["similarity"] > 0.98
