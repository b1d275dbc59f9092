"""Mapper/writer/runner stage tests (reference test_mapper/test_writer/
test_runner analogues): fp16 normalized outputs, npy/parquet layout, one full
partition through the hot loop."""

import glob
import json
import os

import numpy as np
import pandas as pd
import pytest

from clip_retrieval_tpu.inference.mapper import ClipMapper
from clip_retrieval_tpu.inference.reader import FilesReader
from clip_retrieval_tpu.inference.runner import Runner, Sampler
from clip_retrieval_tpu.inference.writer import NumpyWriter
from clip_retrieval_tpu.inference.logger import LoggerWriter

from .fixtures import make_files_corpus


@pytest.fixture(scope="module")
def mapper():
    return ClipMapper(
        enable_image=True,
        enable_text=True,
        clip_model="test-tiny",
        batch_size=4,
    )


def test_mapper_shapes_and_dtype(mapper):
    cfg = mapper.bundle.cfg
    rng = np.random.default_rng(0)
    batch = {
        "image_tensor": rng.integers(
            0, 255, (3, cfg.image_size, cfg.image_size, 3), dtype=np.uint8
        ),
        "text_tokens": mapper.bundle.tokenize(["a", "bb", "ccc"]),
        "image_filename": ["a.jpg", "b.jpg", "c.jpg"],
        "text": ["a", "bb", "ccc"],
    }
    out = mapper(batch)
    assert out["image_embs"].shape == (3, cfg.embed_dim)
    assert out["image_embs"].dtype == np.float16
    assert out["text_embs"].dtype == np.float16
    norms = np.linalg.norm(out["image_embs"].astype(np.float32), axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=2e-3)
    # padding must not leak into results: same inputs, different batch fill
    out2 = mapper(
        {
            "image_tensor": batch["image_tensor"][:2],
            "text_tokens": batch["text_tokens"][:2],
            "image_filename": batch["image_filename"][:2],
            "text": batch["text"][:2],
        }
    )
    np.testing.assert_array_equal(out["image_embs"][:2], out2["image_embs"])


def test_writer_layout(tmp_path):
    out = str(tmp_path / "emb")
    writer = NumpyWriter(
        partition_id=3,
        output_folder=out,
        enable_text=True,
        enable_image=True,
        enable_metadata=True,
        output_partition_count=12,
    )
    emb = np.ones((2, 8), np.float16)
    for _ in range(2):
        writer(
            {
                "image_embs": emb,
                "text_embs": emb * 0.5,
                "image_filename": ["x.jpg", "y.jpg"],
                "text": ["cx", "cy"],
                "metadata": [json.dumps({"k": 1}), json.dumps({"k": 2})],
            }
        )
    writer.flush()
    img = np.load(out + "/img_emb/img_emb_03.npy")  # zero-padded to 2 digits
    txt = np.load(out + "/text_emb/text_emb_03.npy")
    assert img.shape == (4, 8) and img.dtype == np.float16
    assert txt.shape == (4, 8)
    df = pd.read_parquet(out + "/metadata/metadata_03.parquet")
    assert list(df.columns) == ["image_path", "caption", "k"]
    assert df["k"].tolist() == [1, 2, 1, 2]
    # empty flush writes nothing
    writer.flush()


def test_runner_end_to_end(tmp_path, mapper):
    folder = make_files_corpus(
        str(tmp_path / "corpus"), n=5, with_text=True, with_meta=True
    )
    out = str(tmp_path / "out")
    cfg = mapper.bundle.cfg

    def reader_builder(sampler):
        return FilesReader(
            sampler,
            cfg.image_size,
            lambda t: mapper.bundle.tokenize(t),
            folder,
            batch_size=2,
            num_prepro_workers=2,
            enable_text=True,
            enable_image=True,
            enable_metadata=True,
        )

    def writer_builder(pid):
        return NumpyWriter(pid, out, True, True, True, 2)

    def logger_builder(pid):
        return LoggerWriter(pid, out + "/stats")

    runner = Runner(
        reader_builder, lambda: mapper, writer_builder, logger_builder, 2
    )
    runner(0)
    runner(1)

    imgs = sorted(glob.glob(out + "/img_emb/*.npy"))
    assert [os.path.basename(p) for p in imgs] == [
        "img_emb_0.npy",
        "img_emb_1.npy",
    ]
    total = sum(np.load(p).shape[0] for p in imgs)
    assert total == 5
    # stats files finalized (wip_ renamed away)
    stats = sorted(os.listdir(out + "/stats"))
    assert stats == ["0.json", "1.json"]
    st = json.load(open(out + "/stats/0.json"))
    assert st["sample_count"] == 3
    assert st["inference_duration"] > 0
