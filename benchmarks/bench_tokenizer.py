"""Tokenizer throughput: pure-python CLIP BPE vs the rust `tokenizers` fast
path (GIL-free encode_batch).  Host-only — the tokenizer feeds the text
tower, and at ~8.7k captions/s on the L/14 text tower (see
model_throughput_tpu.json) a slow host tokenizer becomes the bottleneck.

Uses a synthetic merge list when no BPE vocab file is present (zero-egress
environments); relative python-vs-rust cost is representative because both
paths run the same merge table.

Run: python benchmarks/bench_tokenizer.py   → benchmarks/tokenizer_host.json
"""

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clip_retrieval_tpu.models.tokenizer import CLIPTokenizer, default_bpe_path

WORDS = (
    "the cat dog tree photo of a and in running jumping bright red blue "
    "green street city mountain river close up portrait landscape vintage "
    "art painting drawing person child sunset clouds &amp; 42"
).split()


def captions(n: int, seed: int = 0):
    rng = random.Random(seed)
    return [
        " ".join(rng.choices(WORDS, k=rng.randint(4, 16))) for _ in range(n)
    ]


def synthetic_merges():
    merges = []
    for w in ("the", "cat", "dog", "photo", "running", "street", "portrait"):
        for i in range(1, len(w)):
            pair = (w[:i], w[i] + ("</w>" if i == len(w) - 1 else ""))
            if pair not in merges:
                merges.append(pair)
    return merges


def main():
    texts = captions(20_000)
    if default_bpe_path():
        make = lambda: CLIPTokenizer()
        vocab = "file"
    else:
        merges = synthetic_merges()
        make = lambda: CLIPTokenizer(merges=list(merges))
        vocab = "synthetic"

    results = {"n_captions": len(texts), "vocab": vocab}
    fast = make()
    if fast._fast is not None:
        t0 = time.perf_counter()
        fast(texts, context_length=77)
        results["rust_captions_per_sec"] = round(
            len(texts) / (time.perf_counter() - t0), 1
        )
    slow = make()
    slow._fast = None
    t0 = time.perf_counter()
    slow(texts[:2000], context_length=77)
    results["python_captions_per_sec"] = round(
        2000 / (time.perf_counter() - t0), 1
    )
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "tokenizer_host.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
