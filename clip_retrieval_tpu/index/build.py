"""clip_index: build TPU indices over embedding folders.

Reference counterpart: `/root/reference/clip_retrieval/clip_index.py:12-66`
(autofaiss.build_index over img_emb/ and text_emb/ → image.index/text.index
+ infos json + metadata copy).  Artifact names match so clip_back and the
end2end flow are drop-in; the index payload itself is our own format
(directory of arrays, see ivfpq.py) since FAISS binary compat is meaningless
without FAISS.

Build path (all FLOP-heavy steps on TPU):
  1. auto-select params from the byte budget (autotune.py)
  2. train: OPQ rotation (alternating Procrustes/PQ) → coarse k-means →
     PQ codebooks on residuals — chunked-Lloyd's matmul programs
  3. encode: stream shards through device (assign + residual PQ encode)
  4. group codes/ids by list (CSR), save, score recall vs brute force
"""

from __future__ import annotations

import glob
import json
import logging
import os
import shutil
import time

import numpy as np

from ..ops import kmeans as kmeans_ops
from .rerank import ShardRowGather
from ..ops import pq as pq_ops
from .autotune import IndexParams, select_params
from .flat import FlatIndex
from .ivfpq import IVFPQIndex

LOGGER = logging.getLogger("clip_index")


class EmbeddingShards:
    """Lazy view over a folder of npy embedding shards (mmap'd)."""

    def __init__(self, folder: str):
        self.paths = sorted(glob.glob(os.path.join(folder, "*.npy")))
        if not self.paths:
            raise ValueError(f"no npy shards found in {folder}")
        self.arrays = [np.load(p, mmap_mode="r") for p in self.paths]
        self.counts = [a.shape[0] for a in self.arrays]
        self.d = self.arrays[0].shape[1]
        self.total = int(sum(self.counts))

    def sample(self, k: int, seed: int = 0) -> np.ndarray:
        """Uniform random sample of ≤k rows across shards."""
        rng = np.random.default_rng(seed)
        k = min(k, self.total)
        idx = np.sort(rng.choice(self.total, size=k, replace=False))
        out = np.empty((k, self.d), np.float32)
        offs = np.cumsum([0] + self.counts)
        for i, (arr, start, end) in enumerate(
            zip(self.arrays, offs[:-1], offs[1:])
        ):
            sel = idx[(idx >= start) & (idx < end)] - start
            if sel.size:
                pos = np.searchsorted(idx, sel + start)
                out[pos] = np.asarray(arr[sel], np.float32)
        return out

    def iter_chunks(self, chunk: int = 1 << 17):
        """Yields (global_start, np.float32 chunk)."""
        offset = 0
        for arr in self.arrays:
            for i in range(0, arr.shape[0], chunk):
                block = np.asarray(arr[i : i + chunk], np.float32)
                yield offset + i, block
            offset += arr.shape[0]


def scratch_memmap(shape, dtype, scratch_dirs=()) -> np.ndarray:
    """Unlinked disk-backed array for corpus-scale transients (refine
    stores are ~n·d·2 bytes — 100 GB at the 100M×512 tier — and must never
    live in RAM).  Tries each candidate dir, skipping unwritable ones
    (read-only artifact mounts), and falls back to the system tmp dir; the
    file is unlinked immediately (linux keeps the mapping alive) so it can
    neither leak nor be picked up by shard globs."""
    import tempfile

    last: OSError | None = None
    for d in [*scratch_dirs, None]:
        tmp_name = None
        try:
            tmp = tempfile.NamedTemporaryFile(
                suffix=".scratch", dir=d, delete=False
            )
            tmp.close()
            tmp_name = tmp.name
            arr = np.lib.format.open_memmap(
                tmp_name, mode="w+", dtype=dtype, shape=shape
            )
            os.unlink(tmp_name)
            return arr
        except OSError as e:  # unwritable/full candidate → next
            last = e
            try:  # best-effort: a failing unlink (EROFS remount, stale
                # NFS) must not abort the fallback chain itself
                if tmp_name is not None and os.path.exists(tmp_name):
                    os.unlink(tmp_name)
            except OSError:
                pass
    raise last  # pragma: no cover — system tmp unwritable


def build_index_from_shards(
    shards: EmbeddingShards,
    params: IndexParams,
    nprobe: int = 16,
    train_points: int = 1 << 20,
    seed: int = 0,
    refine: bool | None = None,
    timings: dict | None = None,
    scratch_dir: str | None = None,
):
    """Train + encode an index over all shard rows (ids = global row order).

    refine=None follows the autotune decision (params.use_refine);
    True/False force the exact re-rank store on/off.  A `timings` dict, if
    given, receives per-phase wall seconds (train_s / encode_s)."""
    if refine is None:
        refine = getattr(params, "use_refine", False)
    n, d = shards.total, shards.d
    if params.kind == "flat":
        index = FlatIndex(d)
        for _, block in shards.iter_chunks():
            index.add(block)
        return index

    scratch = [scratch_dir] if scratch_dir else []
    scratch.append(os.path.dirname(shards.paths[0]))

    if params.kind == "ivf_int8":
        from .ivf_int8 import IVFInt8Index

        # disk-backed: n·d·4 bytes is ~200 GB at the 100M×512 tier
        x = scratch_memmap((n, d), np.float32, scratch)
        for start, block in shards.iter_chunks():
            x[start : start + block.shape[0]] = block
        return IVFInt8Index.from_vectors(
            x,
            nlist=params.nlist,
            nprobe=nprobe,
            seed=seed,
            refine=refine,
            refine_source=ShardRowGather(shards) if refine else None,
        )

    if params.kind == "flat_int8":
        from ..ops.int8mm import quantize_rows
        from .sharded_flat import ShardedFlatIndex

        q = scratch_memmap((n, d), np.int8, scratch)
        s = np.empty((n,), np.float32)
        for start, block in shards.iter_chunks():
            qb, sb = quantize_rows(block)
            q[start : start + block.shape[0]] = qb
            s[start : start + block.shape[0]] = sb
        return ShardedFlatIndex(d, q, s)

    t0 = time.time()
    sample = shards.sample(min(train_points, n), seed)
    LOGGER.info("training on %d samples (d=%d)", sample.shape[0], d)

    rotation = None
    if params.use_opq:
        pq_rot = pq_ops.train_opq(
            sample, params.m, params.ksub, opq_iters=4, pq_niter=8, seed=seed
        )
        rotation = np.asarray(pq_rot.rotation)
        sample_r = sample @ rotation
    else:
        sample_r = sample

    import jax

    mesh = None
    if jax.local_device_count() > 1:  # shard coarse training over local chips
        from ..parallel.mesh import local_mesh

        mesh = local_mesh()
    coarse = kmeans_ops.kmeans(
        sample_r, params.nlist, niter=20, seed=seed, mesh=mesh
    )
    coarse_np = np.asarray(coarse)

    # PQ on residuals of the training sample
    assign = kmeans_ops.assign_chunked(sample_r, coarse)
    residuals = sample_r - coarse_np[assign]
    pq = pq_ops.train_pq(residuals, params.m, params.ksub, niter=15, seed=seed)
    LOGGER.info("train done in %.1fs", time.time() - t0)
    if timings is not None:
        timings["train_s"] = round(time.time() - t0, 1)

    # encode all vectors streaming
    t0 = time.time()
    all_assign = np.empty((n,), np.int32)
    all_codes = np.empty((n, params.m), np.uint8)
    for start, block in shards.iter_chunks():
        br = block @ rotation if rotation is not None else block
        a = kmeans_ops.assign_chunked(br, coarse)
        resid = br - coarse_np[a]
        codes = pq_ops.pq_encode(resid, pq)
        all_assign[start : start + block.shape[0]] = a
        all_codes[start : start + block.shape[0]] = codes
    LOGGER.info("encode done in %.1fs", time.time() - t0)
    if timings is not None:
        timings["encode_s"] = round(time.time() - t0, 1)

    # group by list (CSR)
    order = np.argsort(all_assign, kind="stable")
    list_ids = order.astype(np.int64)
    list_codes = all_codes[order]
    counts = np.bincount(all_assign, minlength=params.nlist)
    offsets = np.zeros((params.nlist + 1,), np.int64)
    np.cumsum(counts, out=offsets[1:])

    refine_vectors = None
    if refine:  # exact re-ranking store: original fp16 vectors in id order
        # the source shards already ARE that store — gather straight from
        # them instead of writing a corpus-sized fp16 scratch copy
        # (~100 GB at the 100M×512 tier); save() persists a real copy
        refine_vectors = ShardRowGather(shards)

    return IVFPQIndex(
        d=d,
        coarse_centroids=coarse_np,
        codebooks=np.asarray(pq.codebooks),
        rotation=rotation,
        list_offsets=offsets,
        list_ids=list_ids,
        list_codes=list_codes,
        nprobe=nprobe,
        refine_vectors=refine_vectors,
    )


def _exact_ground_truth(
    shards: EmbeddingShards, queries: np.ndarray, k: int
) -> np.ndarray:
    """Top-k ids by exact brute force over the full corpus."""
    exact = FlatIndex(shards.d)
    for _, block in shards.iter_chunks():
        exact.add(block.astype(np.float16))
    _, gt = exact.search(queries, k)
    return gt


def _recall_vs_gt(gt: np.ndarray, got: np.ndarray) -> float:
    return float(
        np.mean(
            [
                len(set(gt[i][gt[i] >= 0]) & set(got[i][got[i] >= 0]))
                / max(1, (gt[i] >= 0).sum())
                for i in range(gt.shape[0])
            ]
        )
    )


def score_index(index, shards: EmbeddingShards, n_queries: int = 100,
                k: int = 40, seed: int = 7, queries=None, gt=None) -> dict:
    """Recall@k vs exact brute force on a query sample (the reference
    delegates this to autofaiss score_index, README.md:292).  Pass
    precomputed (queries, gt) to share one brute-force pass with
    calibrate_nprobe — the full-corpus scan is the expensive step."""
    if queries is None:
        queries = shards.sample(n_queries, seed=seed)
    if gt is None:
        gt = _exact_ground_truth(shards, queries, k)
    _, got = index.search(queries, k)
    return {
        f"recall@{k}": _recall_vs_gt(gt[:, :k], got),
        "n_queries": len(queries),
    }


def calibrate_nprobe(
    index,
    shards: EmbeddingShards,
    target_recall: float = 0.95,
    k: int = 10,
    n_queries: int = 100,
    seed: int = 7,
    max_nprobe: int = 256,
    queries=None,
    gt=None,
) -> dict | None:
    """Pick the smallest nprobe whose recall@k vs exact brute force reaches
    the target — the search-hyperparameter tuning autofaiss performs inside
    the reference's `clip_index` (`/root/reference/clip_retrieval/clip_index
    .py:24-31`; autofaiss tunes index.nprobe for its recall target and
    records it in the infos json).  Mutates `index.nprobe` to the chosen
    value (persisted by `index.save`, honored by serving) and returns
    {"nprobe", "target_recall", "recall_curve"} or None for flat indices.

    When the nprobe sweep PLATEAUS below target on a refine-tier index, the
    residual loss is not candidate-cell misses but the ADC→rerank cutoff:
    PQ quantization error drops true neighbors below the rerank_factor·k
    candidate pool (observed on clustered 10M corpora: recall flat at
    ~0.918 from nprobe=16 through 512).  A second sweep then raises
    index.rerank_factor (also persisted) until the target is met — probing
    more cells cannot fix a ranking loss, re-ranking more candidates can."""
    if getattr(index, "nprobe", None) is None:
        # exact tiers carry nprobe=None purely for API parity — nothing to
        # calibrate (and "calibrating" one would record bogus infos)
        return None
    nlist = getattr(index, "nlist", max_nprobe)
    if queries is None:
        queries = shards.sample(n_queries, seed=seed)
    if gt is None:
        gt = _exact_ground_truth(shards, queries, k)
    gt = gt[:, :k]

    def recall_b1():
        # B=1: the int8 IVF tier union-probes the whole query batch, so a
        # batched calibration pass would scan ~n_queries·nprobe lists per
        # query and overstate serving recall; single-query searches measure
        # the guaranteed per-query floor (recall at any serving batch ≥ it)
        got = np.concatenate(
            [index.search(queries[i : i + 1], k)[1] for i in range(len(queries))]
        )
        return _recall_vs_gt(gt, got)

    curve: dict[str, float] = {}
    chosen = None
    cand = 1
    candidates = []
    while cand < min(max_nprobe, nlist):
        candidates.append(cand)
        cand *= 2
    candidates.append(min(max_nprobe, nlist))
    for cand in candidates:
        index.nprobe = cand
        r = recall_b1()
        curve[str(cand)] = round(r, 4)
        if r >= target_recall:
            chosen = cand
            break
    target_missed = chosen is None
    rerank_curve: dict[str, float] = {}
    if target_missed:
        best = max(curve.values())
        # cheapest point on the plateau, not the largest probed: past the
        # plateau knee extra probes cost QPS and buy nothing
        chosen = next(
            int(np_) for np_, r in curve.items() if r >= best - 0.002
        )
        index.nprobe = chosen
        can_rerank = (
            getattr(index, "refine_vectors", None) is not None
            and getattr(index, "rerank_factor", None) is not None
        )
        if can_rerank:
            base_rf = index.rerank_factor
            rf = base_rf
            while rf < 128 and target_missed:
                rf *= 2
                index.rerank_factor = rf
                r = recall_b1()
                rerank_curve[str(rf)] = round(r, 4)
                if r >= target_recall:
                    target_missed = False
            if target_missed and rerank_curve:
                # best effort: keep the largest swept factor (recall is
                # monotone in it) — still better than the base
                index.rerank_factor = rf
    if target_missed:
        LOGGER.warning(
            "calibration missed target recall %.2f (best %.3f at nprobe=%d"
            "%s) — consider more nlist or the refine tier",
            target_recall,
            max([*curve.values(), *rerank_curve.values()]),
            chosen,
            f", rerank_factor={index.rerank_factor}" if rerank_curve else "",
        )
    index.nprobe = chosen
    # recall_achieved / target_missed travel with the index (quantize copies
    # this record into header.json) so a build that ships below its recall
    # contract is visible at serving boot, not just in the build log —
    # autofaiss likewise records achieved recall in its infos json
    # (reference clip_index.py:24-31)
    out = {
        "nprobe": chosen,
        "target_recall": target_recall,
        "recall_k": k,
        "recall_curve": curve,
        "recall_achieved": (
            max(rerank_curve.values()) if rerank_curve else curve[str(chosen)]
        ),
        "target_missed": target_missed,
    }
    if rerank_curve:
        out["rerank_factor"] = index.rerank_factor
        out["rerank_curve"] = rerank_curve
    return out


def quantize(
    embeddings_path: str,
    index_path: str,
    infos_path: str,
    max_index_memory_usage: str,
    index_key: str | None,
    nprobe: int | None,
    compute_recall: bool,
    refine: bool | None = None,
    target_recall: float = 0.95,
    max_nprobe: int = 256,
):
    """nprobe=None → build with the default then calibrate the smallest
    nprobe reaching recall@10 ≥ 0.95 (autofaiss-parity hyperparameter
    tuning); an explicit int pins it."""
    shards = EmbeddingShards(embeddings_path)
    params = select_params(
        shards.total, shards.d, max_index_memory_usage, index_key
    )
    LOGGER.info(
        "building %s over %d×%d", params.index_key, shards.total, shards.d
    )
    if nprobe is not None and nprobe < 1:
        raise ValueError(f"nprobe must be >= 1, got {nprobe}")
    t0 = time.time()
    timings: dict = {}
    index = build_index_from_shards(
        shards,
        params,
        nprobe=16 if nprobe is None else nprobe,
        refine=refine,
        timings=timings,
        scratch_dir=os.path.dirname(os.path.abspath(index_path)),
    )
    infos = {
        "index_key": params.index_key,
        "ntotal": shards.total,
        "d": shards.d,
        **timings,
    }
    # one brute-force ground-truth pass (k=40 ⊇ calibration's k=10) shared
    # between calibration and recall scoring — the full-corpus scan is the
    # expensive evaluation step
    queries = gt = None
    if compute_recall:
        queries = shards.sample(100, seed=7)
        gt = _exact_ground_truth(shards, queries, 40)
    cal = None
    if nprobe is None and compute_recall:
        cal = calibrate_nprobe(
            index,
            shards,
            target_recall=target_recall,
            max_nprobe=max_nprobe,
            queries=queries,
            gt=gt,
        )
        if cal:
            infos["nprobe_calibration"] = cal
    elif nprobe is None and getattr(index, "nprobe", None) is not None:
        # actual IVF tiers only — exact indices carry nprobe=None purely
        # for API parity and have nothing to calibrate
        print(
            "WARNING: nprobe calibration skipped because "
            "compute_recall=False — the index keeps the default "
            f"nprobe={index.nprobe}; pass an explicit nprobe or enable "
            "compute_recall to tune it to the recall target"
        )
    infos["build_seconds"] = time.time() - t0
    index.save(index_path)  # after calibration: nprobe persists in the header
    if cal:
        # stamp the calibration outcome into the index header itself so a
        # build that missed its recall contract warns at serving boot
        # (store.load_index) — the infos json alone never reaches clip_back
        header_path = os.path.join(index_path, "header.json")
        if os.path.exists(header_path):
            with open(header_path) as f:
                header = json.load(f)
            header["calibration"] = cal
            with open(header_path, "w") as f:
                json.dump(header, f)
    if compute_recall:
        infos.update(score_index(index, shards, queries=queries, gt=gt))
    with open(infos_path, "w") as f:
        json.dump(infos, f)
    return index, infos


def clip_index(
    embeddings_folder: str,
    index_folder: str,
    max_index_memory_usage: str = "4G",
    current_memory_available: str = "16G",  # accepted for CLI parity
    copy_metadata: bool = True,
    image_subfolder: str = "img_emb",
    text_subfolder: str = "text_emb",
    index_key: str | None = None,
    nprobe: int | None = None,  # None = calibrate to recall@10 ≥ 0.95
    compute_recall: bool = True,
    refine: bool | None = None,  # None = autotune decides (use_refine)
    nb_cores: int | None = None,  # accepted for CLI parity
    target_recall: float = 0.95,  # calibration contract (autofaiss default)
    max_nprobe: int = 256,  # calibration search cap; raise for 10M+ corpora
):
    """Build image/text indices from an inference output folder."""
    if current_memory_available != "16G":
        print(
            "WARNING: current_memory_available is accepted for CLI parity "
            "with the reference (autofaiss) but ignored — the TPU build "
            "sizes its own transients from max_index_memory_usage"
        )
    if nb_cores is not None:
        print(
            "WARNING: nb_cores is accepted for CLI parity but ignored — "
            "host-side work uses OpenMP/thread defaults"
        )
    os.makedirs(index_folder, exist_ok=True)
    img_path = os.path.join(embeddings_folder, image_subfolder)
    txt_path = os.path.join(embeddings_folder, text_subfolder)
    if os.path.exists(img_path):
        quantize(
            img_path,
            os.path.join(index_folder, "image.index"),
            os.path.join(index_folder, "image.json"),
            max_index_memory_usage,
            index_key,
            nprobe,
            compute_recall,
            refine,
            target_recall,
            max_nprobe,
        )
    if os.path.exists(txt_path):
        quantize(
            txt_path,
            os.path.join(index_folder, "text.index"),
            os.path.join(index_folder, "text.json"),
            max_index_memory_usage,
            index_key,
            nprobe,
            compute_recall,
            refine,
            target_recall,
            max_nprobe,
        )
    metadata_src = os.path.join(embeddings_folder, "metadata")
    if copy_metadata and os.path.exists(metadata_src):
        shutil.copytree(
            metadata_src,
            os.path.join(index_folder, "metadata"),
            dirs_exist_ok=True,
        )
