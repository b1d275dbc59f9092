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


def make_query_images(count: int = 8, size: int = 224):
    """A handful of distinct base64 JPEGs for image-modality load (random
    noise content — the server's decode+preprocess+encode cost does not
    depend on image content, only on byte size and pixel count)."""
    import base64
    from io import BytesIO

    from PIL import Image

    rng = np.random.default_rng(7)
    out = []
    for _ in range(count):
        arr = rng.integers(0, 256, size=(size, size, 3), dtype=np.uint8)
        buf = BytesIO()
        Image.fromarray(arr).save(buf, format="JPEG", quality=85)
        out.append(base64.b64encode(buf.getvalue()).decode())
    return out


async def drive(port, clients, seconds, num_images, modality="text",
                query_images=None):
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
            if modality == "image":
                del body["text"]
                body["image"] = query_images[(wid + i) % len(query_images)]
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


def _pow2(n: int) -> int:
    b = 1
    while b < n:
        b *= 2
    return b


def _stage_hists(stats0, stats1):
    """Per-stage pow2-bucket batch histograms over the measured window
    (delta of the server's raw batch-size counters)."""

    def delta(path0, path1):
        out = {}
        for key, c1 in path1.items():
            c = c1 - path0.get(key, 0)
            if c > 0:
                out[_pow2(int(key))] = out.get(_pow2(int(key)), 0) + c
        return out

    text, image, search = {}, {}, {}

    def acc(dst, d):
        for b, c in d.items():
            dst[b] = dst.get(b, 0) + c

    for name, enc in stats1["encoders"].items():
        enc0 = stats0["encoders"].get(
            name, {"text": {"batch_sizes": {}}, "image": {"batch_sizes": {}}}
        )
        acc(text, delta(enc0["text"]["batch_sizes"],
                        enc["text"]["batch_sizes"]))
        acc(image, delta(enc0["image"]["batch_sizes"],
                         enc["image"]["batch_sizes"]))
    for key, b in stats1["search"].items():
        b0 = stats0["search"].get(key, {"batch_sizes": {}})
        acc(search, delta(b0["batch_sizes"], b["batch_sizes"]))
    return text, image, search


def capacity_accounting(post_json, stats0, stats1, rtt_p50_ms, k=40):
    """Reconstruct the window's device-busy time batch by batch.

    For every pow2 batch size the server actually dispatched, measure the
    blocking per-batch time of that stage in-process (`/stage-times`: one
    device round-trip + compute) and subtract the relay RTT — what is left
    is the device compute a PCIe-attached host would pay.  Sum over the
    window's batch histogram = device-busy seconds; requests / that is the
    PCIe-host capacity of this exact serving schedule (the server is a
    single-device single-queue pipeline, so device-busy time is the
    binding resource under load).  `k` must match the window's
    num_result_ids — the search stage cost depends on it."""
    text_h, image_h, search_h = _stage_hists(stats0, stats1)
    text_ms, search_ms, image_ms = {}, {}, {}
    search_rtts = 1
    for b in sorted(set(text_h) | set(search_h)):
        st = post_json(
            "/stage-times",
            {"text_bucket": b, "search_bucket": b, "iters": 12, "k": k},
        )
        text_ms[b] = st["text_encode"]["p50_ms"]
        search_ms[b] = st["search"]["p50_ms"]
        search_rtts = st["search"].get("round_trips", 1)
    for b in sorted(image_h):
        st = post_json("/stage-times", {"image_bucket": b, "iters": 8,
                                        "k": k})
        image_ms[b] = st["image_encode"]["p50_ms"]
    floor_ms = 0.2  # never credit a stage below 0.2 ms of device time

    def stage_busy(hist, ms, rtts=1):
        # exact-union/rerank searches pay `rtts` host↔device round-trips
        # per blocking call (the server reports it); each is one relay RTT
        # here but ~0 on a PCIe host
        return sum(
            c * max(ms[b] - rtts * rtt_p50_ms, floor_ms)
            for b, c in hist.items()
        )

    busy = {
        "text_encode": stage_busy(text_h, text_ms),
        "image_encode": stage_busy(image_h, image_ms),
        "search": stage_busy(search_h, search_ms, search_rtts),
    }
    return {
        "search_round_trips": search_rtts,
        "device_busy_s_est": round(sum(busy.values()) / 1e3, 2),
        "device_busy_s_by_stage": {
            s: round(v / 1e3, 2) for s, v in busy.items()
        },
        "stage_p50_ms": {"text_encode": text_ms, "search": search_ms,
                         "image_encode": image_ms},
        "batch_hist": {"text_encode": text_h, "search": search_h,
                       "image_encode": image_h},
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--clients", type=int, default=64)
    ap.add_argument("--seconds", type=int, default=30)
    ap.add_argument("--port", type=int, default=18123)
    ap.add_argument("--num_images", type=int, default=40)
    ap.add_argument(
        "--modality", choices=("text", "image"), default="text",
        help="query modality for the load window: text tokens or base64 "
        "JPEG images (the reference's slowest path, README.md:425-437)",
    )
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
        # each bucket size is its own jit program — a fixed-length warm can
        # end with buckets still compiling (measured: a 20 s warm left the
        # window eating multi-second compiles → 15 QPS vs the real 383), so
        # warm in rounds until a round discovers NO new bucket
        import asyncio

        def get_json(path):
            with urllib.request.urlopen(
                f"http://127.0.0.1:{args.port}{path}", timeout=120
            ) as r:
                return json.loads(r.read())

        def bucket_set(stats):
            seen = set()
            for name, enc in stats["encoders"].items():
                for mode in ("text", "image"):
                    seen |= {(name, mode, _pow2(int(b)))
                             for b in enc[mode]["batch_sizes"]}
            for key, b in stats["search"].items():
                seen |= {("search", key, _pow2(int(s)))
                         for s in b["batch_sizes"]}
            return seen

        query_images = (
            make_query_images() if args.modality == "image" else None
        )
        print("warming micro-batch buckets...", flush=True)
        seen = bucket_set(get_json("/serving-stats"))
        for round_i in range(8):
            asyncio.run(drive(args.port, args.clients, 15, args.num_images,
                              args.modality, query_images))
            now = bucket_set(get_json("/serving-stats"))
            print(f"warm round {round_i}: {len(now)} buckets "
                  f"(+{len(now - seen)})", flush=True)
            if not (now - seen) and round_i >= 1:
                break
            seen = now

        def post_json(path, body, timeout=600):
            req = urllib.request.Request(
                f"http://127.0.0.1:{args.port}{path}",
                data=json.dumps(body).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=timeout) as r:
                return json.loads(r.read())

        # stage-probe body used for BOTH the idle and the under-load probe —
        # identical buckets, so the delta isolates queueing interactions
        probe_body = {"text_bucket": 32, "search_bucket": 32, "iters": 8,
                      "k": args.num_images}
        if args.modality == "image":
            probe_body["image_bucket"] = 32
        idle_probe = post_json("/stage-times", probe_body)

        # the idle /stage-times probe measures each stage with nothing else
        # in flight, but under load encoder and search dispatches from two
        # batchers interleave in the device queue; probing DURING the window
        # bounds the error of pricing the window with idle stage times
        import threading

        loaded_probe = {}

        def probe_under_load():
            time.sleep(max(2.0, args.seconds * 0.25))
            try:
                loaded_probe.update(post_json("/stage-times", probe_body))
            except Exception as e:  # pragma: no cover - best effort
                loaded_probe["error"] = str(e)

        stats0 = get_json("/serving-stats")
        print("driving load...", flush=True)
        prober = threading.Thread(target=probe_under_load, daemon=True)
        prober.start()
        done, errors, lat = asyncio.run(
            drive(args.port, args.clients, args.seconds, args.num_images,
                  args.modality, query_images)
        )
        prober.join(timeout=600)
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
        cap = capacity_accounting(post_json, stats0, stats1, rtt["p50_ms"],
                                  k=args.num_images)

        # sensitivity: re-price the window with each stage scaled by its
        # measured loaded/idle ratio at the shared probe bucket — the
        # pessimistic end of the capacity range (queueing interactions the
        # idle probe cannot see)
        sensitivity = {"probe_bucket": 32}
        busy_loaded_s = None
        if loaded_probe and "error" not in loaded_probe:
            busy_loaded_s = 0.0
            for stage in ("text_encode", "image_encode", "search"):
                key = "search" if stage == "search" else stage
                idle_ms = idle_probe.get(key, {}).get("p50_ms")
                load_ms = loaded_probe.get(key, {}).get("p50_ms")
                if idle_ms and load_ms:
                    ratio = max(1.0, load_ms / idle_ms)
                else:
                    ratio = 1.0
                sensitivity[stage] = {
                    "idle_p50_ms": idle_ms,
                    "loaded_p50_ms": load_ms,
                    "ratio": round(ratio, 3),
                }
                busy_loaded_s += (
                    cap["device_busy_s_by_stage"][stage] * ratio
                )
            busy_loaded_s = round(busy_loaded_s, 2)
        elif loaded_probe:
            sensitivity["error"] = loaded_probe["error"]
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
            "modality": args.modality,
            "model": "ViT-B/32 (random weights, real compute)",
            "reference_baseline_qps": 20,
            "platform": platform,
            "device_rtt_ms_p50": rtt["p50_ms"],
            "device_batches_in_window": batches,
            **cap,
            # device-busy seconds rebuilt batch-by-batch from the window's
            # batch-size histogram x measured per-stage compute (stage p50
            # minus the relay RTT each in-process probe pays once).  A
            # PCIe host running this exact schedule is device-bound, so
            # requests / device-busy-time is its capacity.
            "pcie_capacity_qps": round(
                done / max(cap["device_busy_s_est"], 1e-3), 1
            ),
            # the pessimistic end: each stage re-priced at its measured
            # under-load/idle p50 ratio (stage_sensitivity)
            "pcie_capacity_qps_loaded": (
                round(done / max(busy_loaded_s, 1e-3), 1)
                if busy_loaded_s else None
            ),
            "stage_sensitivity": sensitivity,
            "note": "e2e through the harness TPU relay; pcie_capacity_qps "
            "re-prices each dispatched batch at its measured device "
            "compute (/stage-times p50 minus /device-rtt p50): the QPS "
            "this schedule sustains on a PCIe-attached host, where the "
            "e2e figure is the relay-bound floor",
        }
        print(json.dumps(row), flush=True)
        mod_suffix = "_image" if args.modality == "image" else ""
        out = os.path.join(
            os.path.dirname(__file__),
            f"serving_http_{platform}{mod_suffix}{args.out_suffix}.json",
        )
        with open(out, "w") as f:
            json.dump([row], f, indent=1)
        print(f"wrote {out}")
    finally:
        server.terminate()
        server.wait(timeout=30)


if __name__ == "__main__":
    main()
