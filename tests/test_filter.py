"""clip-filter end-to-end (VERDICT r1 weak #8): top-k and threshold paths
against a real on-disk index + metadata, matching the reference tool
`/root/reference/clip_retrieval/clip_filter.py:7-74`."""

import os

import numpy as np
import pandas as pd
import pytest
from PIL import Image

from clip_retrieval_tpu.filter import clip_filter
from clip_retrieval_tpu.index.build import clip_index


def _unit(x):
    return (x / np.linalg.norm(x, axis=-1, keepdims=True)).astype(np.float32)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("filter")
    emb = root / "emb"
    (emb / "img_emb").mkdir(parents=True)
    (emb / "metadata").mkdir(parents=True)
    imgdir = root / "imgs"
    imgdir.mkdir()
    rng = np.random.default_rng(0)
    n = 60
    x = _unit(rng.normal(size=(n, 32)))
    np.save(emb / "img_emb" / "img_emb_0.npy", x.astype(np.float16))
    paths = []
    for i in range(n):
        p = str(imgdir / f"im{i:03d}.jpg")
        Image.new("RGB", (8, 8), (i * 4 % 255, 10, 10)).save(p)
        paths.append(p)
    pd.DataFrame(
        {
            "image_path": paths,
            "url": [f"http://x/{i}.jpg" for i in range(n)],
            "caption": [f"c{i}" for i in range(n)],
        }
    ).to_parquet(emb / "metadata" / "metadata_0.parquet")
    index_folder = root / "index"
    clip_index(
        str(emb), str(index_folder), index_key="Flat", copy_metadata=True,
        compute_recall=False,
    )
    return root, index_folder, x


def test_filter_topk_copies_files(corpus, tmp_path, capsys):
    root, index_folder, x = corpus
    out = tmp_path / "out"
    clip_filter(
        "a red square", str(out), str(index_folder),
        num_results=5, clip_model="test-tiny",
    )
    copied = os.listdir(out)
    assert len(copied) == 5
    assert all(c.endswith(".jpg") for c in copied)
    printed = capsys.readouterr().out
    assert "http://x/" in printed  # urls printed like the reference


def test_filter_threshold_range_search(corpus, tmp_path):
    root, index_folder, x = corpus
    out = tmp_path / "out_thr"
    # threshold -1.0: everything passes (scores in [-1, 1]) → all 60 copied
    clip_filter(
        "anything", str(out), str(index_folder),
        threshold=-1.0, clip_model="test-tiny",
    )
    assert len(os.listdir(out)) == 60
    # threshold 1.1: nothing passes
    out2 = tmp_path / "out_none"
    clip_filter(
        "anything", str(out2), str(index_folder),
        threshold=1.1, clip_model="test-tiny",
    )
    assert os.listdir(out2) == []


def test_filter_image_query(corpus, tmp_path):
    root, index_folder, x = corpus
    query_img = str(root / "imgs" / "im000.jpg")
    out = tmp_path / "out_img"
    clip_filter(
        query_img, str(out), str(index_folder),
        num_results=3, clip_model="test-tiny",
    )
    assert len(os.listdir(out)) == 3
