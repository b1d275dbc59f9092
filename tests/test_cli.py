"""CLI surface: subcommand dispatch, signature-driven arg parsing, and an
inference→index flow driven entirely through `cli.main` (the reference
exposes the same verbs via fire, `/root/reference/clip_retrieval/cli.py`)."""

import glob
import json

import numpy as np
import pytest
from PIL import Image

from clip_retrieval_tpu import cli


def test_help_lists_reference_subcommands(capsys):
    with pytest.raises(SystemExit):
        cli.main(["--help"])
    out = capsys.readouterr().out
    for cmd in ("inference", "index", "filter", "back", "front", "end2end",
                "index_combiner", "parquet_to_arrow"):
        assert cmd in out


def test_unknown_subcommand_errors():
    with pytest.raises(SystemExit):
        cli.main(["frobnicate"])


def test_cli_inference_then_index(tmp_path, capsys):
    imgs = tmp_path / "imgs"
    imgs.mkdir()
    rng = np.random.default_rng(0)
    for i in range(5):
        Image.fromarray(
            rng.integers(0, 255, (24, 24, 3), dtype=np.uint8)
        ).save(imgs / f"{i}.jpg")
        (imgs / f"{i}.txt").write_text(f"caption {i}")
    emb = tmp_path / "emb"
    cli.main([
        "inference",
        "--input_dataset", str(imgs),
        "--output_folder", str(emb),
        "--clip_model", "test-tiny",
        "--batch_size", "4",
        "--num_prepro_workers", "0",
    ])
    embs = np.load(glob.glob(str(emb / "img_emb" / "*.npy"))[0])
    assert embs.shape[0] == 5 and embs.dtype == np.float16
    out = tmp_path / "index"
    cli.main([
        "index",
        "--embeddings_folder", str(emb),
        "--index_folder", str(out),
        "--index_key", "Flat",
        "--compute_recall", "False",
    ])
    infos = json.load(open(out / "image.json"))
    assert infos["index_key"] == "Flat" and infos["ntotal"] == 5
