"""End-to-end quickstart: corpus → embeddings → index → serving → query.

Runs entirely offline with the random-weight `test-tiny` model; swap
`--clip_model` for `"ViT-B/32:/path/to/ckpt.npz"` (see `convert`) for real
embeddings.  Mirrors the reference README's flow (inference → index → back
→ ClipClient).

    python examples/quickstart.py
"""

import json
import os
import tempfile
import threading
import time

import numpy as np
from PIL import Image

from clip_retrieval_tpu import cli
from clip_retrieval_tpu.client import ClipClient, Modality

PORT = 18222
MODEL = os.environ.get("QUICKSTART_CLIP_MODEL", "test-tiny")


def make_corpus(folder: str, n: int = 24):
    os.makedirs(folder, exist_ok=True)
    rng = np.random.default_rng(0)
    subjects = ["cat", "dog", "bird", "tree", "car", "boat"]
    for i in range(n):
        Image.fromarray(
            rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
        ).save(f"{folder}/{i:04d}.jpg")
        with open(f"{folder}/{i:04d}.txt", "w") as f:
            f.write(f"a photo of a {subjects[i % len(subjects)]}")


def main():
    root = tempfile.mkdtemp(prefix="clip_retrieval_tpu_quickstart_")
    imgs, emb, index = (os.path.join(root, d) for d in ("imgs", "emb", "index"))
    make_corpus(imgs)

    print("== 1. batch inference (images+captions → fp16 embeddings) ==")
    cli.main([
        "inference",
        "--input_dataset", imgs,
        "--output_folder", emb,
        "--clip_model", MODEL,
        "--batch_size", "8",
        "--num_prepro_workers", "2",
    ])

    print("== 2. index build (TPU k-means/PQ or flat, autotuned) ==")
    cli.main([
        "index",
        "--embeddings_folder", emb,
        "--index_folder", index,
    ])

    print("== 3. serve ==")
    paths = os.path.join(root, "indices_paths.json")
    with open(paths, "w") as f:
        json.dump({"quickstart": index}, f)
    threading.Thread(
        target=cli.main,
        args=([
            "back",
            "--port", str(PORT),
            "--indices_paths", paths,
            "--clip_model", MODEL,
            "--enable_mclip_option", "False",
            "--provide_safety_model", "False",
            "--provide_violence_detector", "False",
            "--provide_aesthetic_embeddings", "False",
        ],),
        daemon=True,
    ).start()

    client = ClipClient(
        url=f"http://127.0.0.1:{PORT}/knn-service",
        indice_name="quickstart",
        aesthetic_score=0,
        aesthetic_weight=0.0,
        modality=Modality.IMAGE,
        num_images=5,
    )
    for attempt in range(60):
        try:
            results = client.query(text="a photo of a cat")
            break
        except Exception:
            time.sleep(2)
    else:
        raise SystemExit("backend did not come up")

    print("== 4. results ==")
    for r in results:
        print(f"  id={r['id']:>4}  sim={r['similarity']:.3f}  "
              f"caption={r.get('caption', '')!r}")
    print(f"\nartifacts kept in {root} (embeddings, index, indices_paths.json)")


if __name__ == "__main__":
    main()
