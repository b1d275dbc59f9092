"""Real HTTP server test: threaded WSGI server on a socket + ClipClient.

Covers what the reference's test_end2end does with a subprocess backend
(poll /knn-service over HTTP), plus the Python client round trip."""

import json
import socket
import threading
import time

import numpy as np
import pandas as pd
import pytest
import requests

from clip_retrieval_tpu.back.app import make_app
from clip_retrieval_tpu.back.options import ClipOptions
from clip_retrieval_tpu.back.resources import load_clip_indices
from clip_retrieval_tpu.client import ClipClient, Modality
from clip_retrieval_tpu.index.build import clip_index


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def live_server(tmp_path_factory):
    root = tmp_path_factory.mktemp("live")
    emb = root / "emb"
    (emb / "img_emb").mkdir(parents=True)
    (emb / "metadata").mkdir(parents=True)
    rng = np.random.default_rng(0)
    n = 100
    x = rng.normal(size=(n, 32)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    np.save(emb / "img_emb" / "img_emb_0.npy", x.astype(np.float16))
    pd.DataFrame(
        {
            "caption": [f"cap {i}" for i in range(n)],
            "url": [f"http://x/{i}" for i in range(n)],
        }
    ).to_parquet(emb / "metadata" / "metadata_0.parquet")
    clip_index(str(emb), str(root / "index"), index_key="Flat",
               compute_recall=False)
    (root / "indices_paths.json").write_text(
        json.dumps({"live": str(root / "index")})
    )
    resources = load_clip_indices(
        str(root / "indices_paths.json"),
        ClipOptions(
            clip_model="test-tiny",
            columns_to_return=["caption", "url"],
            provide_aesthetic_embeddings=False,
        ),
    )
    app = make_app(resources)
    port = _free_port()

    from wsgiref.simple_server import WSGIServer, make_server
    import socketserver

    class ThreadingWSGIServer(socketserver.ThreadingMixIn, WSGIServer):
        daemon_threads = True
        request_queue_size = 512

    srv = make_server("127.0.0.1", port, app, server_class=ThreadingWSGIServer)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{port}"
    for _ in range(50):
        try:
            requests.get(base + "/health", timeout=1)
            break
        except Exception:
            time.sleep(0.1)
    yield {"base": base, "x": x}
    srv.shutdown()
    srv.server_close()


def test_health_and_indices(live_server):
    base = live_server["base"]
    assert requests.get(base + "/health", timeout=5).json() == "ok"
    assert requests.get(base + "/indices-list", timeout=5).json() == ["live"]


def test_clip_client_roundtrip(live_server):
    client = ClipClient(
        live_server["base"] + "/knn-service",
        "live",
        num_images=7,
        modality=Modality.IMAGE,
        use_safety_model=False,
        use_violence_detector=False,
        deduplicate=False,
    )
    results = client.query(text="a photo of something")
    assert len(results) == 7
    assert {"id", "similarity", "caption", "url"} <= set(results[0])


def test_client_embedding_query(live_server):
    client = ClipClient(
        live_server["base"] + "/knn-service",
        "live",
        num_images=3,
        use_safety_model=False,
        use_violence_detector=False,
        deduplicate=False,
    )
    q = live_server["x"][17].tolist()
    results = client.query(embedding_input=q)
    assert results[0]["id"] == 17


def test_concurrent_requests(live_server):
    from concurrent.futures import ThreadPoolExecutor

    client = ClipClient(
        live_server["base"] + "/knn-service",
        "live",
        num_images=3,
        use_safety_model=False,
        use_violence_detector=False,
        deduplicate=False,
    )

    def one(i):
        return client.query(embedding_input=live_server["x"][i].tolist())[0][
            "id"
        ]

    with ThreadPoolExecutor(8) as ex:
        ids = list(ex.map(one, range(24)))
    assert ids == list(range(24))
