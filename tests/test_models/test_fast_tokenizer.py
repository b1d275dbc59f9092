"""Fast (rust tokenizers) path parity with the pure-python CLIP BPE."""

import numpy as np
import pytest

from clip_retrieval_tpu.models.tokenizer import CLIPTokenizer

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

TEXTS = [
    "the cat and the dog",
    "Thinking, THE CATTLE ran...",
    "punctuation!?~ & odds + ends 42",
    "ünïcode ïs fine ✨",
    "whitespace   collapse\tand trim ",
    "html entities &amp; &lt;tags&gt;",
    "",
]


def test_fast_matches_python():
    tok = CLIPTokenizer(merges=list(MERGES))
    if tok._fast is None:
        pytest.skip("tokenizers library unavailable")
    slow = CLIPTokenizer(merges=list(MERGES))
    slow._fast = None
    for text in TEXTS:
        fast_arr = tok([text], context_length=32)
        slow_arr = slow([text], context_length=32)
        np.testing.assert_array_equal(fast_arr, slow_arr, err_msg=text)


def test_fast_batch_matches_per_item():
    tok = CLIPTokenizer(merges=list(MERGES))
    if tok._fast is None:
        pytest.skip("tokenizers library unavailable")
    batch = tok(TEXTS[:5], context_length=16)
    singles = np.concatenate([tok([t], 16) for t in TEXTS[:5]])
    np.testing.assert_array_equal(batch, singles)


def test_fast_matches_python_decomposed_unicode_and_special_literals():
    """Decomposed Unicode (NFC normalization) and literal special-token
    strings must tokenize identically on both paths."""
    tok = CLIPTokenizer(merges=list(MERGES))
    if tok._fast is None:
        pytest.skip("tokenizers library unavailable")
    slow = CLIPTokenizer(merges=list(MERGES))
    slow._fast = None
    texts = [
        "cafe\u0301 latte",              # e + combining acute (NFC -> e-acute)
        "the <|endoftext|> marker",
        "<|startoftext|> twice <|startoftext|>",
    ]
    for text in texts:
        np.testing.assert_array_equal(
            tok([text], context_length=32),
            slow([text], context_length=32),
            err_msg=text,
        )
    # the literal maps to the single special id, not BPE subwords
    ids = tok(["x <|endoftext|> y"], context_length=16)[0]
    assert (ids == tok.eot_token).sum() >= 2  # literal + terminator
