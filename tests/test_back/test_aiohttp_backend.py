"""aiohttp serving backend: same surface as the WSGI path, async front."""

import json
import socket
import threading
import time

import numpy as np
import pandas as pd
import pytest
import requests

aiohttp = pytest.importorskip("aiohttp")

from clip_retrieval_tpu.back.app import make_app, serve
from clip_retrieval_tpu.back.options import ClipOptions
from clip_retrieval_tpu.back.resources import load_clip_indices
from clip_retrieval_tpu.index.build import clip_index


@pytest.fixture(scope="module")
def aio_server(tmp_path_factory):
    root = tmp_path_factory.mktemp("aio")
    emb = root / "emb"
    (emb / "img_emb").mkdir(parents=True)
    (emb / "metadata").mkdir(parents=True)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(200, 32)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    np.save(emb / "img_emb" / "img_emb_0.npy", x.astype(np.float16))
    pd.DataFrame({"caption": [f"c{i}" for i in range(200)]}).to_parquet(
        emb / "metadata" / "metadata_0.parquet"
    )
    clip_index(str(emb), str(root / "index"), index_key="Flat",
               compute_recall=False)
    (root / "ip.json").write_text(json.dumps({"a": str(root / "index")}))
    resources = load_clip_indices(
        str(root / "ip.json"),
        ClipOptions(clip_model="test-tiny", columns_to_return=["caption"],
                    provide_aesthetic_embeddings=False),
    )
    app = make_app(resources)
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    threading.Thread(
        target=serve, args=(app, port, "127.0.0.1", "aiohttp"), daemon=True
    ).start()
    base = f"http://127.0.0.1:{port}"
    for _ in range(100):
        try:
            requests.get(base + "/health", timeout=1)
            break
        except Exception:
            time.sleep(0.1)
    return {"base": base, "x": x}


def test_endpoints(aio_server):
    base = aio_server["base"]
    assert requests.get(base + "/health").json() == "ok"
    assert requests.get(base + "/indices-list").json() == ["a"]
    assert b"full_knn" in requests.get(base + "/metrics").content
    r = requests.post(
        base + "/knn-service",
        json={
            "embedding_input": aio_server["x"][9].tolist(),
            "modality": "image",
            "num_images": 3,
            "indice_name": "a",
        },
    )
    assert r.status_code == 200
    assert r.json()[0]["id"] == 9
    bad = requests.post(
        base + "/knn-service", json={"modality": "image", "num_images": 1}
    )
    assert bad.status_code == 400
