"""KnnService: query encoding on TPU + index search + post-filtering.

Framework-free port of the reference's service logic
(`/root/reference/clip_retrieval/clip_back.py:200-507`): same query semantics
(text / base64 image / image url / raw embedding, aesthetic steering), same
dynamic-nprobe rule (ceil(k/3000) for ≥100k result ids), same post filters
(connected-components dedup via range_search@0.94, violence prompt argmax,
NSFW threshold 0.5), same response shape ({id, similarity, **metadata}).

Query encoding runs as a jitted JAX program per resource (text tower or ViT),
cached on first use.
"""

from __future__ import annotations

import base64
import math
import os
import ssl
import threading
import urllib.request
from collections import defaultdict
from io import BytesIO
from typing import Any, Dict, List, Optional

import numpy as np

from ..index.flat import FlatIndex
from ..models import clip as jclip
from ..models import safety as safety_mod
from ..models.preprocess import decode_resize_center_crop
from . import metrics as M


def normalized(a: np.ndarray, axis: int = -1) -> np.ndarray:
    l2 = np.atleast_1d(np.linalg.norm(a, 2, axis))
    l2[l2 == 0] = 1
    return a / np.expand_dims(l2, axis)


@M.DOWNLOAD_TIME.time()
def download_image(url: str) -> BytesIO:
    req = urllib.request.Request(
        url,
        data=None,
        headers={
            "User-Agent": "Mozilla/5.0 (X11; Ubuntu; Linux x86_64; rv:72.0) "
            "Gecko/20100101 Firefox/72.0"
        },
    )
    ctx = ssl.create_default_context()
    ctx.set_alpn_protocols(["http/1.1"])
    with urllib.request.urlopen(req, timeout=10, context=ctx) as r:
        return BytesIO(r.read())


def convert_metadata_to_base64(meta: Optional[dict]):
    if meta is not None and "image_path" in meta:
        path = meta["image_path"]
        if isinstance(path, bytes):
            path = path.decode()
        if isinstance(path, str) and os.path.exists(path):
            from PIL import Image

            img = Image.open(path)
            buffered = BytesIO()
            img.convert("RGB").save(buffered, format="JPEG")
            meta["image"] = base64.b64encode(buffered.getvalue()).decode(
                "utf-8"
            )


def meta_to_dict(meta: dict) -> dict:
    output = {}
    for k, v in meta.items():
        if isinstance(v, bytes):
            v = v.decode()
        elif type(v).__module__ == np.__name__:
            v = v.item()
        output[k] = v
    return output


def _bucket(n: int) -> int:
    """Power-of-two padding bucket the micro-batchers dispatch."""
    b = 1
    while b < n:
        b *= 2
    return b


class _Encoders:
    """Cached jitted encode closures for one model bundle, with server-side
    micro-batching: concurrent requests share one device batch (padded to
    power-of-two buckets so jit programs are reused)."""

    def __init__(self, bundle, max_batch: int = 64, max_wait_ms: float = 3.0):
        import jax
        import jax.numpy as jnp

        from .batching import MicroBatcher

        self.bundle = bundle
        cfg = bundle.cfg
        # params must be a jit ARGUMENT, not a closure capture: closed-over
        # arrays are baked into the HLO as constants, which (a) defeats the
        # persistent compilation cache across server boots (every checkpoint
        # → new program hash → minutes of compile per micro-batch bucket at
        # boot) and (b) bloats the executable with the weights
        params = jax.device_put(bundle.params)

        @jax.jit
        def encode_text(p, tokens):
            return jclip.encode_text(p, cfg, tokens)

        @jax.jit
        def encode_image(p, images):
            return jclip.encode_image(p, cfg, images)

        self._params = params
        self._encode_text = encode_text
        self._encode_image = encode_image
        self._jnp = jnp

        # dispatch/finish split (MicroBatcher pipelining): dispatch stops at
        # the ASYNC jit call — JAX queues the computation and returns an
        # un-materialized array — and finish does the blocking readback.
        # Batch N+1's tokenize + dispatch then overlaps batch N's readback
        # (one relay round-trip each in this harness).
        def dispatch_text_batch(texts):
            tokens = self.bundle.tokenize(list(texts))
            n = tokens.shape[0]
            pad = _bucket(n) - n
            if pad:
                tokens = np.concatenate(
                    [tokens, np.zeros((pad, tokens.shape[1]), tokens.dtype)]
                )
            return encode_text(params, jnp.asarray(tokens))

        def dispatch_image_batch(arrays):
            batch = np.stack(arrays)
            n = batch.shape[0]
            pad = _bucket(n) - n
            if pad:
                batch = np.concatenate(
                    [batch, np.zeros((pad, *batch.shape[1:]), batch.dtype)]
                )
            return encode_image(params, jnp.asarray(batch))

        def finish_batch(feats_dev, n):
            feats = np.asarray(feats_dev).astype(np.float32)[:n]
            return [feats[i : i + 1] for i in range(n)]

        self._text_batcher = MicroBatcher(
            dispatch_text_batch, max_batch, max_wait_ms, name="text-encode",
            fn_finish=finish_batch,
        )
        self._image_batcher = MicroBatcher(
            dispatch_image_batch, max_batch, max_wait_ms, name="image-encode",
            fn_finish=finish_batch,
        )

    def warm(self, buckets=(1, 64)) -> None:
        """Pre-compile the encode programs for the given micro-batch buckets
        so the first burst of traffic doesn't stall on jit compilation
        (each bucket size is its own program).  Requested sizes are mapped
        to the power-of-two bucket the batchers actually dispatch
        (`_bucket(min(b, max_batch))`) — warming a shape that is never
        dispatched would leave the real shape cold."""
        import jax.numpy as jnp

        cfg = self.bundle.cfg
        max_b = self._text_batcher.max_batch
        buckets = sorted({_bucket(min(b, max_b)) for b in buckets})
        for b in buckets:
            tokens = np.zeros((b, cfg.context_length), np.int32)
            np.asarray(self._encode_text(self._params, jnp.asarray(tokens)))
            images = np.zeros(
                (b, cfg.image_size, cfg.image_size, 3), np.uint8
            )
            np.asarray(self._encode_image(self._params, jnp.asarray(images)))

    def text(self, text: str) -> np.ndarray:
        with M.TEXT_CLIP_INFERENCE_TIME.time():
            return self._text_batcher.submit(text)

    def image(self, img_data: BytesIO) -> np.ndarray:
        with M.IMAGE_PREPRO_TIME.time():
            arr = decode_resize_center_crop(
                img_data.read(), self.bundle.cfg.image_size
            )
        with M.IMAGE_CLIP_INFERENCE_TIME.time():
            return self._image_batcher.submit(arr)


class KnnService:
    """The callable core behind the /knn-service endpoint."""

    def __init__(self, clip_resources: Dict[str, Any]):
        self.clip_resources = clip_resources
        self._encoders: dict[str, _Encoders] = {}
        self._search_batchers: dict[tuple, Any] = {}
        self._lock = threading.Lock()
        self._enc_build_locks: dict[str, threading.Lock] = {}
        self._nprobe_locks: dict[int, threading.Lock] = {}  # per index

    # bound on distinct (index, k) micro-batchers: k is client-controlled
    # (num_result_ids), and each batcher is a permanent daemon thread — an
    # unbounded dict would let a k-sweeping client exhaust threads/memory
    MAX_SEARCH_BATCHERS = 32

    def _search_batched(self, index, query: np.ndarray, k: int):
        """Micro-batched index.search_and_reconstruct: concurrent requests
        against the same (index, k) share one device search batch."""
        from .batching import MicroBatcher

        key = (id(index), k)
        with self._lock:
            batcher = self._search_batchers.get(key)
            if (
                batcher is None
                and len(self._search_batchers) < self.MAX_SEARCH_BATCHERS
            ):

                def run_batch(queries, _index=index, _k=k):
                    batch = np.concatenate(queries, axis=0)
                    d, i, e = _index.search_and_reconstruct(batch, _k)
                    return [
                        (d[j : j + 1], i[j : j + 1], e[j : j + 1])
                        for j in range(batch.shape[0])
                    ]

                batcher = MicroBatcher(
                    run_batch, max_batch=32, max_wait_ms=3.0,
                    name=f"search-k{k}",
                )
                self._search_batchers[key] = batcher
        if batcher is None:  # cap reached: serve unbatched, never crash
            return index.search_and_reconstruct(query, k)
        return batcher.submit(query)

    def serving_stats(self) -> dict:
        """Micro-batcher counters (device batches executed / items served)
        per encoder and search batcher.  `/serving-stats` exposes this so a
        load harness can account device round-trips per request — e.g. the
        HTTP bench subtracts the harness's ~65 ms relay RTT per batch to
        estimate PCIe-host QPS (benchmarks/bench_serving_http.py)."""
        out: dict = {"encoders": {}, "search": {}}
        with self._lock:
            encoders = dict(self._encoders)
            searchers = dict(self._search_batchers)
        def row(b):
            return {"batches": b.n_batches, "items": b.n_items,
                    "batch_sizes": dict(b.batch_sizes)}

        for name, enc in encoders.items():
            out["encoders"][name] = {
                "text": row(enc._text_batcher),
                "image": row(enc._image_batcher),
            }
        for (iid, k), b in searchers.items():
            out["search"][f"{iid}-k{k}"] = row(b)
        return out

    def stage_times(self, body: dict | None = None) -> dict:
        """Time the two per-request device stages — text encode and index
        search — from INSIDE the server process (the one holding the chip),
        blocking per call, p50 over `iters`.  Each sample pays exactly one
        host↔device round-trip on top of the device compute, so a load
        harness can reconstruct what the same batch costs on a PCIe host
        as `stage_p50 - device_rtt_p50` (`/device-rtt`): combined with the
        batch-size histograms in `/serving-stats` this replaces the crude
        "one RTT per batch" upper bound with batch-by-batch accounting
        (benchmarks/bench_serving_http.py)."""
        import time

        import jax.numpy as jnp

        body = body or {}
        name = body.get("indice_name") or next(iter(self.clip_resources))
        if name not in self.clip_resources:
            raise ValueError(f"unknown indice_name: {name!r}")
        # clamp client-controlled knobs: this endpoint is on the same
        # unauthenticated CORS-* app as /knn-service, so unbounded values
        # would let one request allocate a (2^30, context) token array or
        # monopolize the device for iters=10^9 blocking calls
        iters = min(64, max(1, int(body.get("iters", 15))))
        k = min(1024, max(1, int(body.get("k", 40))))
        text_bucket = min(64, max(1, int(body.get("text_bucket", 16))))
        search_bucket = min(64, max(1, int(body.get("search_bucket", 16))))
        # image encode is the most expensive stage (a full ViT forward), so
        # it is probed only on request: image_bucket=0 (default) skips it
        image_bucket = min(64, max(0, int(body.get("image_bucket", 0))))
        enc = self._enc(name)
        cfg = enc.bundle.cfg

        def p50(fn, warm=1):
            for _ in range(warm):
                fn()
            samples = []
            for _ in range(iters):
                t0 = time.perf_counter()
                fn()
                samples.append(time.perf_counter() - t0)
            samples.sort()
            return round(samples[len(samples) // 2] * 1e3, 3)

        tokens = jnp.asarray(
            np.zeros((_bucket(text_bucket), cfg.context_length), np.int32)
        )
        text_ms = p50(
            lambda: np.asarray(enc._encode_text(enc._params, tokens))
        )

        image_row = None
        if image_bucket:
            images = jnp.asarray(
                np.zeros(
                    (_bucket(image_bucket), cfg.image_size, cfg.image_size, 3),
                    np.uint8,
                )
            )
            image_row = {
                "bucket": int(images.shape[0]),
                "p50_ms": p50(
                    lambda: np.asarray(enc._encode_image(enc._params, images))
                ),
            }

        res = self.clip_resources[name]
        index = res.image_index if res.image_index is not None \
            else res.text_index
        if index is None:
            raise ValueError(f"no index loaded for {name!r}")
        rng = np.random.default_rng(0)
        q = rng.normal(size=(search_bucket, index.d)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        search_ms = p50(lambda: index.search_and_reconstruct(q, k))
        # exact-union / rerank searches pay >1 host↔device round-trip per
        # call; a load harness must subtract rtt × round_trips, not rtt × 1
        search_rtts = int(getattr(index, "host_round_trips", 1))

        out = {
            "indice_name": name,
            "iters": iters,
            "text_encode": {"bucket": int(tokens.shape[0]),
                            "p50_ms": text_ms},
            "search": {"batch": search_bucket, "k": k, "p50_ms": search_ms,
                       "round_trips": search_rtts},
        }
        if image_row is not None:
            out["image_encode"] = image_row
        return out

    def _enc(self, indice_name: str) -> _Encoders:
        # locked check-then-insert: two concurrent first requests would
        # otherwise both build _Encoders, leaking a device-resident copy of
        # the model params in the loser's batcher threads.  The build
        # (device_put of the full model, seconds through a relay) happens
        # under a PER-INDEX lock so a cold encoder can't stall searches on
        # other, healthy indices that share the global dict lock.
        enc = self._encoders.get(indice_name)
        if enc is not None:
            return enc
        with self._lock:
            build_lock = self._enc_build_locks.setdefault(
                indice_name, threading.Lock()
            )
        with build_lock:
            enc = self._encoders.get(indice_name)
            if enc is None:
                enc = _Encoders(self.clip_resources[indice_name].bundle)
                self._encoders[indice_name] = enc
        return enc

    # -- query embedding ---------------------------------------------------

    def compute_query(
        self,
        clip_resource,
        indice_name: str,
        text_input,
        image_input,
        image_url_input,
        embedding_input,
        use_mclip: bool,
        aesthetic_score,
        aesthetic_weight,
    ) -> np.ndarray:
        if text_input is not None and text_input != "":
            if use_mclip and clip_resource.model_txt_mclip is not None:
                with M.TEXT_CLIP_INFERENCE_TIME.time():
                    query = normalized(
                        clip_resource.model_txt_mclip(text_input).astype(
                            np.float32
                        )
                    )
            else:
                query = self._enc(indice_name).text(text_input)
        elif image_input is not None or image_url_input is not None:
            if image_input is not None:
                img_data = BytesIO(base64.b64decode(image_input))
            else:
                img_data = download_image(image_url_input)
            query = self._enc(indice_name).image(img_data)
        elif embedding_input is not None:
            query = np.expand_dims(
                np.array(embedding_input).astype("float32"), 0
            )
        else:
            raise ValueError("empty query")

        if (
            clip_resource.aesthetic_embeddings is not None
            and aesthetic_score is not None
            and aesthetic_weight is not None
            and aesthetic_score in clip_resource.aesthetic_embeddings
        ):
            emb = clip_resource.aesthetic_embeddings[aesthetic_score]
            query = query + emb * aesthetic_weight
            query = query / np.linalg.norm(query)
        return query

    # -- post filters ------------------------------------------------------

    @staticmethod
    def hash_based_dedup(embeddings: np.ndarray) -> list[int]:
        """Cheap dedup on rounded-embedding hashes (reference
        clip_back.py:257-268); connected-components dedup below is the one
        used by the query flow."""
        seen: set = set()
        to_remove = []
        for i, embedding in enumerate(embeddings):
            h = hash(np.round(embedding, 2).tobytes())
            if h in seen:
                to_remove.append(i)
            else:
                seen.add(h)
        return to_remove

    @staticmethod
    def connected_components(neighbors: dict) -> list[list]:
        seen: set = set()
        groups = []
        for start in neighbors:
            if start in seen:
                continue
            comp, stack = [], {start}
            while stack:
                node = stack.pop()
                seen.add(node)
                stack |= set(neighbors[node]) - seen
                comp.append(node)
            groups.append(comp)
        return groups

    def get_non_uniques(
        self, embeddings: np.ndarray, threshold: float = 0.94
    ) -> list[int]:
        index = FlatIndex(embeddings.shape[1])
        index.add(embeddings.astype(np.float16))
        lims, _, ids = index.range_search(embeddings, threshold)
        same = defaultdict(list)
        for i in range(embeddings.shape[0]):
            for j in ids[lims[i] : lims[i + 1]]:
                same[int(i)].append(int(j))
        non_uniques: set[int] = set()
        for group in self.connected_components(same):
            non_uniques.update(group[1:])
        return list(non_uniques)

    def get_unsafe_items(
        self, safety_model, embeddings: np.ndarray, threshold: float = 0.5
    ) -> np.ndarray:
        scores = safety_model.predict(
            embeddings, batch_size=embeddings.shape[0]
        )
        x = np.array([e[0] for e in scores])
        return np.where(x > threshold)[0]

    def get_violent_items(
        self, safety_prompts: np.ndarray, embeddings: np.ndarray
    ) -> np.ndarray:
        import jax.numpy as jnp

        results = np.asarray(
            safety_mod.violence_scores(
                jnp.asarray(embeddings), jnp.asarray(safety_prompts)
            )
        )
        return np.where(results == 1)[0]

    def post_filter(
        self,
        safety_model,
        embeddings: np.ndarray,
        deduplicate: bool,
        use_safety_model: bool,
        use_violence_detector: bool,
        violence_detector,
    ) -> set:
        to_remove: set = set()
        if deduplicate:
            with M.DEDUP_TIME.time():
                to_remove = set(self.get_non_uniques(embeddings))
        if use_violence_detector and violence_detector is not None:
            to_remove |= set(
                int(i)
                for i in self.get_violent_items(violence_detector, embeddings)
            )
        if use_safety_model and safety_model is not None:
            with M.SAFETY_TIME.time():
                to_remove |= set(
                    int(i)
                    for i in self.get_unsafe_items(safety_model, embeddings)
                )
        return to_remove

    # -- search ------------------------------------------------------------

    def knn_search(
        self,
        query: np.ndarray,
        modality: str,
        num_result_ids: int,
        clip_resource,
        deduplicate: bool,
        use_safety_model: bool,
        use_violence_detector: bool,
    ):
        index = (
            clip_resource.image_index
            if modality == "image"
            else clip_resource.text_index
        )
        if index is None:
            raise ValueError(f"no index for modality {modality!r}")

        with M.KNN_INDEX_TIME.time():
            previous_nprobe = getattr(index, "nprobe", None)
            poke_nprobe = (
                clip_resource.metadata_is_ordered_by_ivf
                and num_result_ids >= 100000
                and previous_nprobe is not None
            )
            if poke_nprobe:
                # dynamic-nprobe requests mutate index state; serialize the
                # whole poke+search+restore PER INDEX — two concurrent
                # pokes would read each other's transient value as
                # "previous" and leave the inflated nprobe permanently,
                # while a global lock would head-of-line-block unrelated
                # indices; always restore so an exception mid-search can't
                # leak it either.  (Concurrent non-poke searches can still
                # observe the transient value — same semantics as the
                # reference's faiss ParameterSpace poke.)
                with self._lock:
                    nlock = self._nprobe_locks.setdefault(
                        id(index), threading.Lock()
                    )
                with nlock:
                    previous_nprobe = index.nprobe  # re-read under the lock
                    try:
                        index.nprobe = math.ceil(num_result_ids / 3000)
                        distances, indices, embeddings = (
                            index.search_and_reconstruct(
                                query, num_result_ids
                            )
                        )
                    finally:
                        index.nprobe = previous_nprobe
            else:
                distances, indices, embeddings = self._search_batched(
                    index, np.asarray(query, np.float32), num_result_ids
                )
            if clip_resource.metadata_is_ordered_by_ivf:
                # -1 padding must survive the remap as -1: np.take would
                # wrap it to mapping[-1] and fabricate a hit
                raw = indices[0]
                results = np.where(
                    raw >= 0,
                    np.take(
                        clip_resource.ivf_old_to_new_mapping,
                        np.clip(raw, 0, None),
                    ),
                    -1,
                )
            else:
                results = indices[0]

        # truncate at the first -1 (same as reference)
        sentinels = np.where(results == -1)[0]
        nb = sentinels[0] if len(sentinels) > 0 else len(results)
        result_indices = results[:nb]
        result_distances = distances[0][:nb]
        result_embeddings = normalized(embeddings[0][:nb])

        local_remove = self.post_filter(
            clip_resource.safety_model,
            result_embeddings,
            deduplicate,
            use_safety_model,
            use_violence_detector,
            clip_resource.violence_detector,
        )
        indices_to_remove = {int(result_indices[i]) for i in local_remove}
        out_indices, out_distances = [], []
        for ind, dist in zip(result_indices, result_distances):
            if int(ind) not in indices_to_remove:
                indices_to_remove.add(int(ind))
                out_indices.append(ind)
                out_distances.append(dist)
        return out_distances, out_indices

    # -- metadata join -----------------------------------------------------

    def map_to_metadata(
        self, indices, distances, num_images, metadata_provider,
        columns_to_return,
    ) -> List[dict]:
        results = []
        with M.METADATA_GET_TIME.time():
            metas = metadata_provider.get(
                indices[:num_images], columns_to_return
            )
        for key, (dist, ind) in enumerate(zip(distances, indices)):
            output: dict = {}
            meta = None if key + 1 > len(metas) else metas[key]
            convert_metadata_to_base64(meta)
            if meta is not None:
                output.update(meta_to_dict(meta))
            output["id"] = int(ind)
            output["similarity"] = float(dist)
            results.append(output)
        return results

    # -- entry -------------------------------------------------------------

    def query(
        self,
        text_input=None,
        image_input=None,
        image_url_input=None,
        embedding_input=None,
        modality: str = "image",
        num_images: int = 100,
        num_result_ids: int = 100,
        indice_name: str | None = None,
        use_mclip: bool = False,
        deduplicate: bool = True,
        use_safety_model: bool = False,
        use_violence_detector: bool = False,
        aesthetic_score=None,
        aesthetic_weight=None,
    ) -> List[dict]:
        if (
            text_input is None
            and image_input is None
            and image_url_input is None
            and embedding_input is None
        ):
            raise ValueError("must fill one of text, image and image url input")
        if indice_name is None:
            indice_name = next(iter(self.clip_resources.keys()))
        clip_resource = self.clip_resources[indice_name]

        query = self.compute_query(
            clip_resource,
            indice_name,
            text_input,
            image_input,
            image_url_input,
            embedding_input,
            use_mclip,
            aesthetic_score,
            aesthetic_weight,
        )
        distances, indices = self.knn_search(
            query,
            modality=modality,
            num_result_ids=num_result_ids,
            clip_resource=clip_resource,
            deduplicate=deduplicate,
            use_safety_model=use_safety_model,
            use_violence_detector=use_violence_detector,
        )
        if len(distances) == 0:
            return []
        return self.map_to_metadata(
            indices,
            distances,
            num_images,
            clip_resource.metadata_provider,
            clip_resource.columns_to_return,
        )

    @M.FULL_KNN_REQUEST_TIME.time()
    def handle_post(self, json_data: dict) -> List[dict]:
        """Parse a /knn-service request body (same field contract as the
        reference's post, clip_back.py:472-507)."""
        aesthetic_score = json_data.get("aesthetic_score", "")
        aesthetic_score = (
            int(aesthetic_score) if aesthetic_score != "" else None
        )
        aesthetic_weight = json_data.get("aesthetic_weight", "")
        aesthetic_weight = (
            float(aesthetic_weight) if aesthetic_weight != "" else None
        )
        num_images = json_data["num_images"]
        return self.query(
            text_input=json_data.get("text"),
            image_input=json_data.get("image"),
            image_url_input=json_data.get("image_url"),
            embedding_input=json_data.get("embedding_input"),
            modality=json_data.get("modality", "image"),
            num_images=num_images,
            num_result_ids=json_data.get("num_result_ids", num_images),
            indice_name=json_data.get("indice_name"),
            use_mclip=json_data.get("use_mclip", False),
            deduplicate=json_data.get("deduplicate", False),
            use_safety_model=json_data.get("use_safety_model", False),
            use_violence_detector=json_data.get(
                "use_violence_detector", False
            ),
            aesthetic_score=aesthetic_score,
            aesthetic_weight=aesthetic_weight,
        )


class MetadataService:
    """POST /metadata — metadata for explicit ids."""

    def __init__(self, clip_resources: Dict[str, Any]):
        self.clip_resources = clip_resources

    def handle_post(self, json_data: dict):
        ids = json_data["ids"]
        if len(ids) == 0:
            return []
        indice_name = json_data["indice_name"]
        resource = self.clip_resources[indice_name]
        metas = resource.metadata_provider.get(
            ids, resource.columns_to_return
        )
        for meta in metas:
            convert_metadata_to_base64(meta)
        return [
            {"id": item_id, "metadata": meta_to_dict(meta)}
            for item_id, meta in zip(ids, metas)
        ]
