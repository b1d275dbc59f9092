"""End-to-end HTTP serving benchmark: concurrent /knn-service text queries.

Reference baseline (BASELINE.md): clip-back serves ~20 QPS at ~50 ms/query
(CPU FAISS + torch encode).  Here the whole query path — tokenize → text
encoder on TPU → int8 index search → metadata join — runs behind the
aiohttp backend with server-side micro-batching, so concurrent requests
share device batches (and amortize this harness's ~65 ms relay RTT, which a
real host does not pay).

Boots a server on a random-weight ViT-B/32 over a synthetic 100k×512 corpus,
drives it with N concurrent clients, writes benchmarks/serving_http_<platform>.json.

Run:  python benchmarks/bench_serving_http.py [--n 100000] [--clients 64]
"""

import argparse
import json
import os
import socket
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.expanduser("~/.cache/clip_retrieval_tpu/xla_cache"),
)


def build_corpus(root: str, n: int, d: int = 512):
    import pandas as pd

    emb = os.path.join(root, "emb")
    os.makedirs(os.path.join(emb, "img_emb"), exist_ok=True)
    os.makedirs(os.path.join(emb, "metadata"), exist_ok=True)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    np.save(os.path.join(emb, "img_emb", "img_emb_0.npy"), x.astype(np.float16))
    pd.DataFrame({"url": [f"http://x/{i}" for i in range(n)]}).to_parquet(
        os.path.join(emb, "metadata", "metadata_0.parquet")
    )
    from clip_retrieval_tpu.index.build import clip_index

    clip_index(
        emb,
        os.path.join(root, "index"),
        index_key="Flat8",
        compute_recall=False,
    )
    with open(os.path.join(root, "indices_paths.json"), "w") as f:
        json.dump({"bench": os.path.join(root, "index")}, f)


def wait_port(port, timeout=1500):  # boot warmup compiles through the relay can take ~10 min cold
    t0 = time.time()
    while time.time() - t0 < timeout:
        try:
            with socket.create_connection(("127.0.0.1", port), timeout=2):
                return True
        except OSError:
            time.sleep(2)
    return False


async def drive(port, clients, seconds, num_images):
    import aiohttp

    url = f"http://127.0.0.1:{port}/knn-service"
    latencies = []
    done = 0
    errors = 0
    t_end = time.perf_counter() + seconds

    async def worker(session, wid):
        nonlocal done, errors
        i = 0
        while time.perf_counter() < t_end:
            body = {
                "text": f"query {wid} {i}",
                "modality": "image",
                "num_images": num_images,
                "indice_name": "bench",
                "deduplicate": False,
            }
            t0 = time.perf_counter()
            try:
                async with session.post(url, json=body) as r:
                    await r.json()
                    if r.status == 200:
                        latencies.append(time.perf_counter() - t0)
                        done += 1
                    else:
                        errors += 1
            except Exception:
                errors += 1
            i += 1

    import asyncio

    async with aiohttp.ClientSession() as session:
        await asyncio.gather(*(worker(session, w) for w in range(clients)))
    return done, errors, latencies


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--clients", type=int, default=64)
    ap.add_argument("--seconds", type=int, default=30)
    ap.add_argument("--port", type=int, default=18123)
    ap.add_argument("--num_images", type=int, default=40)
    ap.add_argument(
        "--index_folder", default="",
        help="serve an EXISTING index dir (e.g. the 10M build) instead of "
        "building a synthetic corpus",
    )
    ap.add_argument("--out_suffix", default="")
    args = ap.parse_args()

    import tempfile

    root = tempfile.mkdtemp(prefix="bench_serving_")
    if args.index_folder:
        print(f"serving existing index {args.index_folder}", flush=True)
        with open(os.path.join(root, "indices_paths.json"), "w") as f:
            json.dump({"bench": os.path.abspath(args.index_folder)}, f)
        try:
            with open(os.path.join(args.index_folder, "image.index",
                                   "header.json")) as f:
                args.n = json.load(f).get("ntotal", args.n)
        except (OSError, json.JSONDecodeError):  # best-effort ntotal
            pass
    else:
        print("building corpus + index...", flush=True)
        build_corpus(root, args.n)

    server = subprocess.Popen(
        [
            sys.executable,
            "-m",
            "clip_retrieval_tpu.cli",
            "back",
            "--indices_paths",
            os.path.join(root, "indices_paths.json"),
            "--port",
            str(args.port),
            "--clip_model",
            "ViT-B/32",
            "--provide_aesthetic_embeddings",
            "False",
            "--columns_to_return",
            '["url"]',
        ],
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
        cwd=root,
    )
    try:
        print("waiting for server...", flush=True)
        assert wait_port(args.port), "server did not come up"
        # warm: first queries pay compile
        import urllib.request

        for _ in range(3):
            req = urllib.request.Request(
                f"http://127.0.0.1:{args.port}/knn-service",
                data=json.dumps(
                    {
                        "text": "warmup",
                        "modality": "image",
                        "num_images": 4,
                        "indice_name": "bench",
                    }
                ).encode(),
                headers={"Content-Type": "application/json"},
            )
            urllib.request.urlopen(req, timeout=600).read()
        # concurrent warmup: micro-batching pads to power-of-two buckets and
        # each bucket size is its own jit program — compile them all before
        # the timed window
        print("warming micro-batch buckets...", flush=True)
        import asyncio

        asyncio.run(drive(args.port, args.clients, 20, args.num_images))
        def get_json(path):
            with urllib.request.urlopen(
                f"http://127.0.0.1:{args.port}{path}", timeout=120
            ) as r:
                return json.loads(r.read())

        stats0 = get_json("/serving-stats")
        print("driving load...", flush=True)
        done, errors, lat = asyncio.run(
            drive(args.port, args.clients, args.seconds, args.num_images)
        )
        stats1 = get_json("/serving-stats")
        # device round-trip measured INSIDE the server process (the one
        # holding the chip) — the per-batch cost this harness's relay adds
        # that a PCIe-attached production host does not pay
        rtt = get_json("/device-rtt")

        def total_batches(s):
            n = 0
            for enc in s["encoders"].values():
                n += enc["text"]["batches"] + enc["image"]["batches"]
            for b in s["search"].values():
                n += b["batches"]
            return n

        batches = total_batches(stats1) - total_batches(stats0)
        rtt_s = rtt["p50_ms"] / 1e3
        # upper bound on relay stall: every device batch paying one full
        # un-overlapped round-trip (the pipelined micro-batcher overlaps
        # readback with the next dispatch, so the true stall is lower)
        relay_stall_s = min(batches * rtt_s, 0.9 * args.seconds)
        lat = np.sort(np.array(lat))
        import jax

        platform = jax.devices()[0].platform
        row = {
            "metric": "knn_service_http_qps",
            "qps": round(done / args.seconds, 1),
            "clients": args.clients,
            "errors": errors,
            "p50_ms": round(float(lat[len(lat) // 2] * 1e3), 1),
            "p95_ms": round(float(lat[int(len(lat) * 0.95)] * 1e3), 1),
            "corpus": args.n,
            "model": "ViT-B/32 (random weights, real compute)",
            "reference_baseline_qps": 20,
            "platform": platform,
            "device_rtt_ms_p50": rtt["p50_ms"],
            "device_batches_in_window": batches,
            "relay_stall_upper_bound_s": round(relay_stall_s, 1),
            # what the same schedule yields when each device batch costs
            # ~0 ms of dispatch+readback (PCIe host: device-rtt p50 is
            # sub-ms there).  The stall estimate is an upper bound (the
            # pipelined micro-batcher overlaps part of it), so this is the
            # OPTIMISTIC end; the measured e2e qps is the pessimistic end.
            # The PCIe-host number lies between the two.
            "qps_relay_subtracted_upper": round(
                done / max(args.seconds - relay_stall_s, 1e-3), 1
            ),
            "note": "e2e through the harness TPU relay; "
            "qps_relay_subtracted_upper removes the measured per-batch "
            "device round-trip a PCIe host does not pay (accounting "
            "inputs: device_rtt_ms_p50 x device_batches_in_window); the "
            "true PCIe-host QPS is bracketed by [qps, that]",
        }
        print(json.dumps(row), flush=True)
        out = os.path.join(
            os.path.dirname(__file__),
            f"serving_http_{platform}{args.out_suffix}.json",
        )
        with open(out, "w") as f:
            json.dump([row], f, indent=1)
        print(f"wrote {out}")
    finally:
        server.terminate()
        server.wait(timeout=30)


if __name__ == "__main__":
    main()
