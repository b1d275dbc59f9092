"""End-to-end: corpus → inference → index → serving → query.

Mirrors the reference's tests/test_end2end.py (which downloads real images
and boots the server as a subprocess); here the corpus is generated locally
and the server is driven in-process through the WSGI app, all on the virtual
CPU mesh with the test-tiny model.
"""

import glob
import json

import numpy as np
import pytest

from clip_retrieval_tpu.back.app import make_app
from clip_retrieval_tpu.back.options import ClipOptions
from clip_retrieval_tpu.back.resources import load_clip_indices
from clip_retrieval_tpu.index.build import clip_index
from clip_retrieval_tpu.inference.main import clip_inference

from tests.test_back.wsgi_client import request
from tests.test_inference.fixtures import make_files_corpus, make_tar_corpus


@pytest.mark.parametrize("input_format", ["files", "webdataset"])
def test_end2end(tmp_path, input_format):
    if input_format == "files":
        dataset = make_files_corpus(
            str(tmp_path / "corpus"), n=24, with_text=True, with_meta=True
        )
        wds_n = 10000
    else:
        dataset = make_tar_corpus(
            str(tmp_path / "tars"), sizes=(8, 8, 8), with_meta=True
        )
        wds_n = 8

    emb = str(tmp_path / "emb")
    clip_inference(
        input_dataset=dataset,
        output_folder=emb,
        input_format=input_format,
        clip_model="test-tiny",
        batch_size=8,
        num_prepro_workers=2,
        enable_metadata=True,
        write_batch_size=10,
        wds_number_file_per_input_file=wds_n,
    )
    total = sum(
        np.load(p).shape[0] for p in glob.glob(emb + "/img_emb/*.npy")
    )
    assert total == 24

    index_folder = str(tmp_path / "index")
    clip_index(emb, index_folder, index_key="Flat", compute_recall=True)
    infos = json.load(open(index_folder + "/image.json"))
    assert infos["ntotal"] == 24
    assert infos["recall@40"] == 1.0  # flat index is exact

    indices_paths = tmp_path / "indices_paths.json"
    indices_paths.write_text(json.dumps({"e2e": index_folder}))
    resources = load_clip_indices(
        str(indices_paths),
        ClipOptions(
            clip_model="test-tiny",
            columns_to_return=["caption", "image_path", "idx"],
            provide_aesthetic_embeddings=False,
        ),
    )
    app = make_app(resources)

    # text query
    r = request(
        app,
        "POST",
        "/knn-service",
        {
            "text": "caption number 3",
            "modality": "image",
            "num_images": 5,
            "indice_name": "e2e",
        },
    )
    assert r["status"].startswith("200"), r["body"]
    results = r["json"]
    assert len(results) == 5
    assert all("caption" in item and "id" in item for item in results)

    # text modality search (text_emb index) also works
    r2 = request(
        app,
        "POST",
        "/knn-service",
        {
            "text": "caption number 3",
            "modality": "text",
            "num_images": 3,
            "indice_name": "e2e",
        },
    )
    assert r2["status"].startswith("200")
    assert len(r2["json"]) == 3
