"""Tokenizer tests: BPE algorithm parity vs HF CLIPTokenizer on a generated
tiny vocab, plus framing/truncation contract."""

import json

import numpy as np
import pytest

from clip_retrieval_tpu.models.tokenizer import (
    CLIPTokenizer,
    SOT,
    EOT,
    bytes_to_unicode,
)

MERGES = [
    ("t", "h"),
    ("th", "e</w>"),
    ("a", "n"),
    ("an", "d</w>"),
    ("c", "a"),
    ("ca", "t</w>"),
    ("i", "n"),
    ("in", "g</w>"),
]


@pytest.fixture(scope="module")
def tok():
    return CLIPTokenizer(merges=list(MERGES))


def test_byte_fallback_roundtrip():
    t = CLIPTokenizer.byte_fallback()
    s = "hello world! ünïcode 123"
    # decode inserts spaces at word-end markers; compare modulo whitespace
    assert t.decode(t.encode(s)).replace(" ", "") == s.lower().replace(" ", "")
    assert t.encode(t.decode(t.encode(s))) == t.encode(s)
    assert t.vocab_size == 2 * 256 + 2
    assert t.eot_token == t.vocab_size - 1  # argmax pooling relies on this


def test_merges_applied(tok):
    ids = tok.encode("the cat")
    # 'the' → th+e</w> merged into one token, 'cat' likewise
    assert len(ids) == 2
    assert tok.decode(ids).strip() == "the cat"


def test_framing_and_truncation(tok):
    arr = tok(["the cat and the cat"], context_length=5)
    assert arr.shape == (1, 5)
    assert arr[0, 0] == tok.sot_token
    assert arr[0, -1] == tok.eot_token
    arr2 = tok("the", context_length=8)
    row = arr2[0]
    assert row[0] == tok.sot_token
    assert row[2] == tok.eot_token
    assert (row[3:] == 0).all()
    # eot is the max id → argmax pooling lands on it
    assert row.argmax() == 2


def test_hf_parity(tmp_path):
    transformers = pytest.importorskip("transformers")
    ours = CLIPTokenizer(merges=list(MERGES))
    vocab = {tok: i for tok, i in ours.encoder.items()}
    (tmp_path / "vocab.json").write_text(json.dumps(vocab))
    merges_txt = "#version: 0.2\n" + "\n".join(
        f"{a} {b}" for a, b in MERGES
    )
    (tmp_path / "merges.txt").write_text(merges_txt)
    hf = transformers.CLIPTokenizer(
        str(tmp_path / "vocab.json"),
        str(tmp_path / "merges.txt"),
        bos_token=SOT,
        eos_token=EOT,
        unk_token=EOT,
        pad_token=None,
    )
    for text in [
        "the cat and the dog",
        "Thinking, THE CATTLE ran...",
        # (html entities excluded: we follow openai CLIP and unescape them;
        # HF CLIPTokenizer without ftfy does not)
        "punctuation!?~ & odds + ends 42",
        "ünïcode ïs fine ✨",
    ]:
        assert ours.encode(text) == hf(text, add_special_tokens=False)[
            "input_ids"
        ], text
