"""Reader tests: the modulo-Sampler partition contract, batch-size sequences,
corrupt-image skipping — mirrors the reference's
tests/test_clip_inference/test_reader.py expectations."""

import os

import numpy as np
import pytest

from clip_retrieval_tpu.inference.reader import FilesReader, WebdatasetReader
from clip_retrieval_tpu.inference.runner import Sampler
from clip_retrieval_tpu.models.tokenizer import CLIPTokenizer

from .fixtures import make_files_corpus, make_tar_corpus

TOK = CLIPTokenizer.byte_fallback()


def _tokenize(texts):
    return TOK(texts, context_length=16)


@pytest.mark.parametrize("file_format", ["files", "webdataset"])
def test_reader_partition_batches(file_format, tmp_path):
    if file_format == "files":
        input_dataset = make_files_corpus(str(tmp_path / "imgs"), n=7)
    else:
        input_dataset = make_tar_corpus(str(tmp_path / "tars"), sizes=(3, 3, 3, 2))
    batch_size = 2
    actual = []
    for pid in range(2):
        sampler = Sampler(pid, 2)
        cls = FilesReader if file_format == "files" else WebdatasetReader
        reader = cls(
            sampler,
            16,  # image size
            _tokenize,
            input_dataset,
            batch_size,
            num_prepro_workers=2,
            enable_text=False,
            enable_image=True,
            enable_metadata=False,
        )
        actual.append([b["image_tensor"].shape[0] for b in reader])
    if file_format == "files":
        # 7 keys → partitions of 4 and 3
        assert actual == [[2, 2], [2, 1]]
    else:
        # sampler picks shards: (3+3) and (3+2)
        assert actual == [[2, 2, 2], [2, 2, 1]]


def test_files_reader_all_modalities(tmp_path):
    folder = make_files_corpus(str(tmp_path / "c"), n=4, with_text=True, with_meta=True)
    reader = FilesReader(
        lambda x: x,
        16,
        _tokenize,
        folder,
        batch_size=4,
        num_prepro_workers=2,
        enable_text=True,
        enable_image=True,
        enable_metadata=True,
    )
    batches = list(reader)
    assert len(batches) == 1
    b = batches[0]
    assert b["image_tensor"].shape == (4, 16, 16, 3)
    assert b["image_tensor"].dtype == np.uint8
    assert b["text_tokens"].shape == (4, 16)
    assert len(b["text"]) == 4
    assert "idx" in b["metadata"][0]


def test_corrupt_image_skipped(tmp_path):
    folder = make_files_corpus(str(tmp_path / "c"), n=3, with_text=False)
    with open(os.path.join(folder, "img_999.jpg"), "wb") as f:
        f.write(b"this is not a jpeg")
    reader = FilesReader(
        lambda x: x,
        16,
        _tokenize,
        folder,
        batch_size=8,
        num_prepro_workers=2,
        enable_text=False,
        enable_image=True,
    )
    batches = list(reader)
    assert sum(b["image_tensor"].shape[0] for b in batches) == 3


def test_wds_missing_key_filtered(tmp_path):
    urls = make_tar_corpus(str(tmp_path / "t"), sizes=(3,), with_text=False)
    reader = WebdatasetReader(
        lambda x: x,
        16,
        _tokenize,
        urls,
        batch_size=8,
        num_prepro_workers=1,
        enable_text=True,  # requires txt, which the tar lacks
        enable_image=True,
    )
    assert list(reader) == []
