"""Orchestrator + distributor + task-math tests (reference test_main /
test_distributor / test_get_tasks analogues)."""

import glob

import numpy as np
import pytest

from clip_retrieval_tpu.inference.main import main as clip_inference
from clip_retrieval_tpu.parallel.dist import get_task_list
from clip_retrieval_tpu.utils.braces import braceexpand

from .fixtures import make_files_corpus, make_tar_corpus


def test_no_sample_found(tmp_path):
    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(ValueError, match="no sample found"):
        clip_inference(
            input_dataset=str(empty),
            output_folder=str(tmp_path / "out"),
            clip_model="test-tiny",
        )


@pytest.mark.parametrize("input_format", ["files", "webdataset"])
def test_main_sequential(tmp_path, input_format):
    if input_format == "files":
        dataset = make_files_corpus(str(tmp_path / "c"), n=7, with_text=True)
    else:
        dataset = make_tar_corpus(str(tmp_path / "t"), sizes=(4, 3))
    out = str(tmp_path / "out")
    clip_inference(
        input_dataset=dataset,
        output_folder=out,
        input_format=input_format,
        batch_size=4,
        num_prepro_workers=2,
        clip_model="test-tiny",
        write_batch_size=4,
        wds_number_file_per_input_file=4 if input_format == "webdataset" else 10000,
    )
    total = sum(
        np.load(p).shape[0] for p in glob.glob(out + "/img_emb/*.npy")
    )
    assert total == 7
    ttotal = sum(
        np.load(p).shape[0] for p in glob.glob(out + "/text_emb/*.npy")
    )
    assert ttotal == 7


def test_get_task_list_even():
    assert get_task_list(8, 4, 0) == [0, 1]
    assert get_task_list(8, 4, 3) == [6, 7]


def test_get_task_list_uneven():
    # 10 tasks over 4 ranks → 3,3,2,2
    blocks = [get_task_list(10, 4, r) for r in range(4)]
    assert blocks == [[0, 1, 2], [3, 4, 5], [6, 7], [8, 9]]
    assert sorted(sum(blocks, [])) == list(range(10))


def test_get_task_list_more_ranks_than_tasks():
    blocks = [get_task_list(2, 4, r) for r in range(4)]
    assert blocks == [[0], [1], [], []]


def test_braceexpand():
    assert braceexpand("s-{00..03}.tar") == [
        "s-00.tar",
        "s-01.tar",
        "s-02.tar",
        "s-03.tar",
    ]
    assert braceexpand("{a,b}/{1..2}") == ["a/1", "a/2", "b/1", "b/2"]
    assert braceexpand("plain.tar") == ["plain.tar"]
