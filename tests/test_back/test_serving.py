"""Serving tests: REST surface parity, query paths, post filters, providers."""

import base64
import io
import json
import os

import numpy as np
import pandas as pd
import pytest

from clip_retrieval_tpu.back.app import clip_back, make_app
from clip_retrieval_tpu.back.options import ClipOptions
from clip_retrieval_tpu.back.resources import load_clip_indices
from clip_retrieval_tpu.index.build import clip_index

from .wsgi_client import request

D = 32  # test-tiny embed dim


def _unit(x):
    return (x / np.linalg.norm(x, axis=-1, keepdims=True)).astype(np.float32)


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    """Build a full serving stack over a synthetic corpus."""
    root = tmp_path_factory.mktemp("serving")
    emb_folder = root / "emb"
    (emb_folder / "img_emb").mkdir(parents=True)
    (emb_folder / "text_emb").mkdir(parents=True)
    (emb_folder / "metadata").mkdir(parents=True)

    rng = np.random.default_rng(0)
    n = 400
    x = _unit(rng.normal(size=(n, D)))
    # plant one duplicate trio for dedup testing (ids 10, 11, 12 identical)
    x[11] = x[10]
    x[12] = x[10]
    np.save(emb_folder / "img_emb" / "img_emb_0.npy", x.astype(np.float16))
    np.save(emb_folder / "text_emb" / "text_emb_0.npy", x.astype(np.float16))
    # one real image on disk so image_path → base64 conversion triggers
    from PIL import Image

    img_path = str(root / "img_0.jpg")
    Image.new("RGB", (16, 16), (200, 30, 30)).save(img_path)
    df = pd.DataFrame(
        {
            "image_path": [img_path if i == 0 else f"/nonexistent/{i}.jpg" for i in range(n)],
            "caption": [f"caption {i}" for i in range(n)],
            "url": [f"http://example.com/{i}.jpg" for i in range(n)],
            "NSFW": ["UNLIKELY"] * n,
        }
    )
    df.to_parquet(emb_folder / "metadata" / "metadata_0.parquet")

    index_folder = root / "index"
    clip_index(
        str(emb_folder),
        str(index_folder),
        index_key="Flat",
        compute_recall=False,
    )
    indices_paths = root / "indices_paths.json"
    indices_paths.write_text(json.dumps({"test_index": str(index_folder)}))

    resources = load_clip_indices(
        str(indices_paths),
        ClipOptions(
            clip_model="test-tiny",
            columns_to_return=["url", "image_path", "caption", "NSFW"],
            provide_aesthetic_embeddings=False,
        ),
    )
    app = make_app(resources)
    return {"app": app, "x": x, "resources": resources, "root": root}


def test_indices_list(served):
    r = request(served["app"], "GET", "/indices-list")
    assert r["status"].startswith("200")
    assert r["json"] == ["test_index"]


def test_knn_text_query(served):
    r = request(
        served["app"],
        "POST",
        "/knn-service",
        {
            "text": "an orange cat",
            "modality": "image",
            "num_images": 7,
            "indice_name": "test_index",
        },
    )
    assert r["status"].startswith("200"), r["body"]
    results = r["json"]
    assert len(results) == 7
    for item in results:
        assert {"id", "similarity", "caption", "url"} <= set(item)
    sims = [item["similarity"] for item in results]
    assert sims == sorted(sims, reverse=True)


def test_knn_embedding_query_matches_index(served):
    q = served["x"][42]
    r = request(
        served["app"],
        "POST",
        "/knn-service",
        {
            "embedding_input": q.tolist(),
            "modality": "image",
            "num_images": 5,
            "indice_name": "test_index",
        },
    )
    results = r["json"]
    assert results[0]["id"] == 42  # nearest neighbor of a stored vector is itself
    assert results[0]["similarity"] > 0.99


def test_knn_dedup(served):
    q = served["x"][10]
    base = {
        "embedding_input": q.tolist(),
        "modality": "image",
        "num_images": 20,
        "indice_name": "test_index",
    }
    no_dedup = request(
        served["app"], "POST", "/knn-service", {**base, "deduplicate": False}
    )["json"]
    ids_no = [item["id"] for item in no_dedup]
    assert {10, 11, 12} <= set(ids_no)
    dedup = request(
        served["app"], "POST", "/knn-service", {**base, "deduplicate": True}
    )["json"]
    ids_yes = [item["id"] for item in dedup]
    assert len({10, 11, 12} & set(ids_yes)) == 1


def test_knn_image_query_and_base64_meta(served):
    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (40, 40), (0, 120, 255)).save(buf, format="JPEG")
    b64 = base64.b64encode(buf.getvalue()).decode()
    r = request(
        served["app"],
        "POST",
        "/knn-service",
        {
            "image": b64,
            "modality": "image",
            "num_images": 3,
            "indice_name": "test_index",
        },
    )
    assert r["status"].startswith("200"), r["body"]
    assert len(r["json"]) == 3
    # id 0's metadata has a real image_path → base64 "image" key
    meta = request(
        served["app"],
        "POST",
        "/metadata",
        {"ids": [0], "indice_name": "test_index"},
    )["json"]
    assert meta[0]["id"] == 0
    assert "image" in meta[0]["metadata"]


def test_knn_image_url_query(served):
    """The image-URL query modality (reference `clip_back.py:157-169`;
    README treats URL queries as first-class): a local http.server serves
    the jpeg so the test runs offline, and the DOWNLOAD_TIME histogram
    must record the fetch."""
    import http.server
    import threading

    from PIL import Image

    from clip_retrieval_tpu.back import metrics as M

    buf = io.BytesIO()
    Image.new("RGB", (40, 40), (230, 40, 20)).save(buf, format="JPEG")
    jpeg = buf.getvalue()

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path == "/cat.jpg":
                self.send_response(200)
                self.send_header("Content-Type", "image/jpeg")
                self.send_header("Content-Length", str(len(jpeg)))
                self.end_headers()
                self.wfile.write(jpeg)
            else:
                self.send_error(404)

        def log_message(self, *a):
            pass

    httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()

    def download_count():
        for metric in M.DOWNLOAD_TIME.collect():
            for s in metric.samples:
                if s.name.endswith("_count"):
                    return s.value
        return 0.0

    try:
        before = download_count()
        r = request(
            served["app"],
            "POST",
            "/knn-service",
            {
                "image_url": f"http://127.0.0.1:{port}/cat.jpg",
                "modality": "image",
                "num_images": 4,
                "indice_name": "test_index",
            },
        )
        assert r["status"].startswith("200"), r["body"]
        results = r["json"]
        assert len(results) == 4
        assert all(np.isfinite(item["similarity"]) for item in results)
        assert download_count() == before + 1
        # a dead URL surfaces as a client error, not a 500 crash
        r_bad = request(
            served["app"],
            "POST",
            "/knn-service",
            {
                "image_url": f"http://127.0.0.1:{port}/missing.jpg",
                "modality": "image",
                "num_images": 4,
                "indice_name": "test_index",
            },
        )
        assert not r_bad["status"].startswith("200")
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_metadata_endpoint(served):
    r = request(
        served["app"],
        "POST",
        "/metadata",
        {"ids": [5, 7], "indice_name": "test_index"},
    )
    metas = r["json"]
    assert [m["id"] for m in metas] == [5, 7]
    assert metas[0]["metadata"]["caption"] == "caption 5"


def test_error_on_empty_query(served):
    r = request(
        served["app"],
        "POST",
        "/knn-service",
        {"modality": "image", "num_images": 5, "indice_name": "test_index"},
    )
    assert r["status"].startswith("400")


def test_serving_stats_and_device_rtt(served):
    """/serving-stats exposes micro-batcher counters (the serving bench's
    relay accounting reads them) and /device-rtt measures the dispatch+
    readback round-trip inside the serving process."""
    r = request(
        served["app"],
        "POST",
        "/knn-service",
        {"text": "a stats query", "modality": "image", "num_images": 3,
         "indice_name": "test_index"},
    )
    assert r["status"].startswith("200")
    r = request(served["app"], "GET", "/serving-stats")
    assert r["status"].startswith("200")
    stats = r["json"]
    enc = stats["encoders"]["test_index"]
    assert enc["text"]["batches"] >= 1
    assert enc["text"]["items"] >= enc["text"]["batches"]
    assert stats["search"]  # at least one search batcher ran
    r = request(served["app"], "GET", "/device-rtt")
    assert r["status"].startswith("200")
    rtt = r["json"]
    assert rtt["iters"] == 20 and rtt["p50_ms"] > 0
    assert rtt["min_ms"] <= rtt["p50_ms"] <= rtt["p90_ms"]


def test_stage_times_and_batch_hist(served):
    """/stage-times measures the per-batch device cost of the two serving
    stages in-process, and /serving-stats carries raw batch-size
    histograms — together the serving bench reconstructs a window's
    device-busy time batch by batch (bench_serving_http.capacity_accounting)."""
    r = request(
        served["app"],
        "POST",
        "/knn-service",
        {"text": "a hist query", "modality": "image", "num_images": 3,
         "indice_name": "test_index"},
    )
    assert r["status"].startswith("200")
    stats = request(served["app"], "GET", "/serving-stats")["json"]
    hist = stats["encoders"]["test_index"]["text"]["batch_sizes"]
    assert sum(hist.values()) == stats["encoders"]["test_index"]["text"]["batches"]
    assert all(int(k) >= 1 for k in hist)
    r = request(
        served["app"],
        "POST",
        "/stage-times",
        {"text_bucket": 2, "search_bucket": 2, "iters": 3, "k": 5},
    )
    assert r["status"].startswith("200")
    st = r["json"]
    assert st["text_encode"]["bucket"] == 2  # pow2 bucket honored
    assert st["text_encode"]["p50_ms"] > 0
    assert st["search"]["p50_ms"] > 0 and st["search"]["k"] == 5
    assert "image_encode" not in st  # probed only on request


def test_stage_times_clamps_and_validates(served):
    """/stage-times is on the same unauthenticated app as /knn-service —
    hostile iters/bucket/k values must be clamped (not allocated) and an
    unknown indice_name must 400, not 500."""
    r = request(
        served["app"],
        "POST",
        "/stage-times",
        {"text_bucket": 2 ** 30, "search_bucket": 10 ** 9, "iters": 10 ** 9,
         "k": 10 ** 9, "image_bucket": 2 ** 30},
    )
    assert r["status"].startswith("200")
    st = r["json"]
    assert st["iters"] <= 64
    assert st["text_encode"]["bucket"] <= 64
    assert st["search"]["batch"] <= 64 and st["search"]["k"] <= 1024
    assert st["image_encode"]["bucket"] <= 64
    assert st["image_encode"]["p50_ms"] > 0
    # iters=0 clamps up to 1 instead of IndexError on an empty sample list
    r = request(served["app"], "POST", "/stage-times", {"iters": 0})
    assert r["status"].startswith("200") and r["json"]["iters"] == 1
    r = request(
        served["app"], "POST", "/stage-times", {"indice_name": "nope"}
    )
    assert r["status"].startswith("400")


def test_metrics_endpoints(served):
    r = request(served["app"], "GET", "/metrics-summary")
    assert r["status"].startswith("200")
    body = r["body"].decode()
    # ranked-cost-table format fidelity with the reference
    # (clip_back.py:95-144): header sentence, pandas table with the same
    # columns, stages sorted by descending average, percentage column
    import re

    assert re.match(
        r"Among \d+ calls to the knn end point with an average latency "
        r"of \d+\.\d{4}s per request, the step costs are \(in order\): ",
        body,
    ), body[:120]
    for col in ("name", "description", "calls", "average", "proportion"):
        assert col in body
    avgs = [float(m) for m in re.findall(r"(\d+\.\d{4})s", body)[1:]]
    assert avgs == sorted(avgs, reverse=True)
    assert re.search(r"\d+\.\d%", body)
    r2 = request(served["app"], "GET", "/metrics")
    assert r2["status"].startswith("200")
    assert b"full_knn_request_time" in r2["body"]


def test_grafana_dashboard_targets_exported_metrics():
    """The shipped dashboard (doc_assets/grafana_dashboard.json, reference
    README.md:421) must only reference metric families the backend exports."""
    import json as _json
    import os
    import re

    from clip_retrieval_tpu.back import metrics as m

    path = os.path.join(
        os.path.dirname(__file__), "..", "..", "doc_assets",
        "grafana_dashboard.json",
    )
    dash = _json.load(open(path))
    exported = {
        h.collect()[0].name
        for h in m._SUB_METRICS + [m.FULL_KNN_REQUEST_TIME]
    }
    exprs = [
        t["expr"]
        for p in dash["panels"]
        for t in p.get("targets", [])
        if "expr" in t
    ]
    assert exprs, "dashboard has no queries"
    for expr in exprs:
        for name in re.findall(r"([a-z_]+_time)(?:_sum|_count|_bucket)?", expr):
            assert name in exported, f"{name} not exported ({expr})"


def test_config_json(served):
    r = request(served["app"], "GET", "/config.json")
    assert r["json"]["urlColumn"] == "url"


def test_front_served(served):
    r = request(served["app"], "GET", "/")
    assert r["status"].startswith("200")
    assert b"clip" in r["body"].lower()


def test_violence_and_safety_filters(served):
    from clip_retrieval_tpu.back.knn import KnnService
    from clip_retrieval_tpu.models.safety import JaxMLP

    svc = KnnService({})
    emb = _unit(np.random.default_rng(1).normal(size=(8, D)))
    # prompts: class 1 = exactly emb[3] → item 3 flagged violent
    prompts = np.stack([-emb[3], emb[3]])
    flagged = svc.get_violent_items(prompts, emb)
    assert 3 in flagged

    mlp = JaxMLP.random(D)
    scores = mlp.predict(emb, batch_size=8)
    assert scores.shape == (8, 1)
    unsafe = svc.get_unsafe_items(mlp, emb, threshold=float(np.median(scores)))
    assert 0 < len(unsafe) < 8
