"""IVF-PQ index with TPU ADC search.

Replaces faiss IndexIVFPQ (+OPQ pretransform) built by autofaiss for the
reference (`/root/reference/clip_retrieval/clip_index.py:24-31`) and searched
by clip_back (`clip_back.py:355-369`, `search_and_reconstruct`, dynamic
nprobe).

Layout (all plain arrays — "inverted list introspection" that needs FAISS
C++ in the reference, `ivf_metadata_ordering.py:50-62`, is trivial here):

  coarse_centroids (nlist, d)   rotated space
  codebooks        (M, 256, dsub)  PQ on residuals (by_residual=True)
  rotation         (d, d) or None  OPQ: x_rot = x @ R
  list_offsets     (nlist+1,)   CSR offsets into the two below
  list_ids         (N,)         original vector ids, grouped by list
  list_codes      (N, M) uint8  PQ codes, grouped by list

Search (device path) is a **streaming CSR scan** — device memory is bounded
by the codes themselves (N×M bytes), never a padded (nlist, Lmax) image:

  1. one matmul + top_k picks the nprobe coarse lists per query, and the
     per-query candidate total (sum of probed list sizes) comes back to the
     host, which selects a power-of-2 slot budget ≥ the max total (exact:
     nothing is dropped, so results match the host scan bit-for-bit);
  2. a windowed `lax.scan` walks the slot range: each window turns slot
     indices into CSR row numbers with a searchsorted over the probe-size
     cumsum, gathers the u8 code rows from the flat (N, M) device array,
     scores them against the per-query ADC LUT (+ the q·centroid coarse
     term — IP decomposition q·c + q·r̂), and folds a running top-k carry —
     the transient is one window, independent of list skew;
  3. the kernel returns CSR *positions*; original (possibly >2³¹) ids are
     mapped on host via one flat_ids[rows] gather of k rows per query.

Indices whose flat codes exceed the HBM budget fall back to the host CSR
scan: a single batched call into the C++ OpenMP scanner
(native/adc_scan.cpp, `adc_search_batch`) with per-query top-k heaps, or a
numpy gather loop when no toolchain exists.
"""

from __future__ import annotations

import functools
import json
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.pq import PQCodebooks, adc_lut, pq_decode
from ..utils import transfer

_DEVICE_BYTES_CAP = 6 << 30  # max flat-codes bytes to keep resident on device
_SCAN_WINDOW = 1 << 17  # slots per scan step (transient ≈ W·M·9 bytes/query)
_SLOT_BUDGET_PER_QUERY = 1 << 28  # split query batches beyond this many slots
_STATIC_BUDGET_MAX = 1 << 21  # one-shot path when worst case ≤ this many slots
# device list-start alignment MUST equal the Pallas scan chunk: block
# indices (astarts // chunk) and k_eff (nchunk_q · align) silently corrupt
# if they ever diverge, so derive one from the other
from ..ops.adc_scan import DEFAULT_CHUNK as _ALIGN  # noqa: E402
_PALLAS_MAX_B = 128  # MXU result width: larger batches are split


def _pick_scorer() -> str:
    """"pallas" (one-hot MXU kernel) on real TPUs, "xla" elsewhere;
    override with CRT_IVFPQ_SCORER=pallas|xla."""
    forced = os.environ.get("CRT_IVFPQ_SCORER", "auto")
    if forced in ("pallas", "xla"):
        return forced
    if os.environ.get("CRT_DISABLE_FLASH") == "1":  # tests force XLA paths
        return "xla"
    import jax as _jax

    return "pallas" if _jax.devices()[0].platform == "tpu" else "xla"


@functools.partial(jax.jit, static_argnames=("nprobe",))
def _coarse_probe(qr, coarse, sizes, nprobe: int):
    """(B,d)×(nlist,d) → top-nprobe lists + per-query candidate totals."""
    scores = jnp.dot(qr, coarse.T, preferred_element_type=jnp.float32)
    probe_vals, probe_idx = jax.lax.top_k(scores, nprobe)  # (B, P)
    totals = jnp.sum(sizes[probe_idx], axis=1)  # (B,)
    return probe_vals, probe_idx, totals


@functools.partial(
    jax.jit, static_argnames=("k", "window", "nwin", "nprobe")
)
def _search_one_shot(
    qr, coarse, codebooks, flat_codes, astarts_all, cstarts_all, sizes_all,
    k: int, window: int, nwin: int, nprobe: int,
):
    """The whole search as ONE program: coarse probe → CSR resolve →
    windowed ADC scan → top-k.  Used when the static worst-case slot
    budget (sum of the nprobe largest lists) is affordable; one dispatch +
    one readback per query batch (dispatch latency dominates small-index
    serving, ~µs on a local host but ~30 ms through a relay)."""
    scores = jnp.dot(qr, coarse.T, preferred_element_type=jnp.float32)
    probe_vals, probe_idx = jax.lax.top_k(scores, nprobe)
    astarts = jnp.take(astarts_all, probe_idx)
    cstarts = jnp.take(cstarts_all, probe_idx)
    psizes = jnp.take(sizes_all, probe_idx)
    return _scan_device.__wrapped__(
        qr, codebooks, flat_codes, astarts, cstarts, psizes, probe_vals,
        k, window, nwin,
    )


@functools.partial(
    jax.jit, static_argnames=("k", "nchunk_q", "nprobe", "interpret")
)
def _search_pallas(
    qr, coarse, codebooks, flat_codes, astarts_all, cstarts_all, sizes_all,
    k: int, nchunk_q: int, nprobe: int, interpret: bool = False,
):
    """One program: coarse probe → chunk worklist → Pallas streaming ADC
    (ops/adc_scan.py, one-hot MXU scoring) → top-k → CSR positions.

    Each query owns nchunk_q chunks of C rows; probe p of query b occupies
    chunk range [padcum[b,p], padcum[b,p]+ceil(size/C)) of b's chunk space,
    so the (B, nchunk_q·C) score matrix reshapes straight out of the
    kernel's (B·nchunk_q, C) output."""
    from ..ops.adc_scan import adc_scan, DEFAULT_CHUNK

    c = DEFAULT_CHUNK
    b = qr.shape[0]
    scores = jnp.dot(qr, coarse.T, preferred_element_type=jnp.float32)
    probe_vals, probe_idx = jax.lax.top_k(scores, nprobe)  # (B, P)
    psizes = jnp.take(sizes_all, probe_idx)  # (B, P)
    pchunks = -(-psizes // c)  # chunks per probe
    padcum = jnp.cumsum(pchunks, axis=1) - pchunks  # exclusive, chunk units
    astart_blk = jnp.take(astarts_all, probe_idx) // c  # aligned block idx
    cstarts = jnp.take(cstarts_all, probe_idx)

    j = jax.lax.broadcasted_iota(jnp.int32, (nchunk_q,), 0)
    seg = (
        jax.vmap(lambda cu: jnp.searchsorted(cu, j, side="right"))(padcum)
        - 1
    )  # (B, NCq): probe owning chunk j (same skip-empty semantics as
    # _scan_device's slot searchsorted)
    within = j[None, :] - jnp.take_along_axis(padcum, seg, axis=1)
    nvalid = jnp.clip(
        jnp.take_along_axis(psizes, seg, axis=1) - within * c, 0, c
    )
    blocks = jnp.take_along_axis(astart_blk, seg, axis=1) + within
    blocks = jnp.where(nvalid > 0, blocks, 0)
    coarse_term = jnp.take_along_axis(probe_vals, seg, axis=1)
    owner = jnp.broadcast_to(
        jax.lax.broadcasted_iota(jnp.int32, (b, 1), 0), (b, nchunk_q)
    )

    lut = adc_lut(qr, codebooks)  # (B, M, 256)
    lut_t = lut.transpose(2, 1, 0).reshape(-1, b)  # row v·M+m = lut[b,m,v]
    out = adc_scan(
        flat_codes, lut_t,
        blocks.reshape(-1), nvalid.reshape(-1),
        owner.reshape(-1), coarse_term.reshape(-1),
        chunk=c, interpret=interpret,
    )  # (B·NCq, C)
    all_scores = out.reshape(b, nchunk_q * c)
    vals, slots = jax.lax.top_k(all_scores, k)  # (B, k)
    # winning slot → CSR position: chunk j = slot // C, row r = slot % C
    win_j = slots // c
    win_seg = jnp.take_along_axis(seg, win_j, axis=1)
    win_within = win_j - jnp.take_along_axis(padcum, win_seg, axis=1)
    rows = (
        jnp.take_along_axis(cstarts, win_seg, axis=1)
        + win_within * c
        + slots % c
    )
    rows = jnp.where(jnp.isfinite(vals), rows, -1)
    return vals, rows


@functools.partial(jax.jit, static_argnames=("k", "window", "nwin"))
def _scan_device(
    qr,  # (B, d) rotated queries f32
    codebooks,  # (M, ksub, dsub) f32
    flat_codes,  # (Na, M) u8 — codes with list starts aligned to _ALIGN
    astarts,  # (B, P) i32 — aligned start row of each probed list
    cstarts,  # (B, P) i32 — CSR start (for reporting original positions)
    psizes,  # (B, P) i32 — probed list sizes
    probe_vals,  # (B, P) f32 — q · centroid of each probed list
    k: int,
    window: int,
    nwin: int,
):
    """Exact-f32 XLA scan (gather-based).  Reference semantics for the
    Pallas kernel (ops/adc_scan.py) and the path on non-TPU backends."""
    b, p = astarts.shape
    n = flat_codes.shape[0]
    lut = adc_lut(qr, codebooks)  # (B, M, ksub)
    cum = jnp.cumsum(psizes, axis=1) - psizes  # exclusive prefix (B, P)

    def scan_window(carry, w):
        top_vals, top_rows = carry  # (B, k)
        slots = w * window + jax.lax.broadcasted_iota(
            jnp.int32, (window,), 0
        )  # (W,)
        # seg[b, j] = last probe whose exclusive-cumsum ≤ slot j
        # (side="right" skips zero-size lists; slots past the total land on
        # the final probe and fail the `within < size` check below)
        seg = (
            jax.vmap(lambda c: jnp.searchsorted(c, slots, side="right"))(cum)
            - 1
        )  # (B, W)
        within = slots[None, :] - jnp.take_along_axis(cum, seg, axis=1)
        valid = within < jnp.take_along_axis(psizes, seg, axis=1)
        grows = jnp.take_along_axis(astarts, seg, axis=1) + within
        rows_safe = jnp.where(valid, jnp.minimum(grows, n - 1), 0)
        crows = jnp.take_along_axis(cstarts, seg, axis=1) + within
        crows = jnp.where(valid, crows, 0)
        codes = flat_codes[rows_safe]  # (B, W, M) u8 gather
        codes_t = codes.transpose(0, 2, 1).astype(jnp.int32)  # (B, M, W)
        scores = jnp.sum(
            jnp.take_along_axis(lut, codes_t, axis=2), axis=1
        )  # (B, W)
        scores = scores + jnp.take_along_axis(probe_vals, seg, axis=1)
        scores = jnp.where(valid, scores, -jnp.inf)
        all_vals = jnp.concatenate([top_vals, scores], axis=1)
        all_rows = jnp.concatenate([top_rows, crows], axis=1)
        top_vals, pos = jax.lax.top_k(all_vals, k)
        top_rows = jnp.take_along_axis(all_rows, pos, axis=1)
        return (top_vals, top_rows), None

    init = (
        jnp.full((b, k), -jnp.inf, jnp.float32),
        jnp.zeros((b, k), jnp.int32),
    )
    (vals, rows), _ = jax.lax.scan(
        scan_window, init, jnp.arange(nwin, dtype=jnp.int32)
    )
    rows = jnp.where(jnp.isfinite(vals), rows, -1)
    return vals, rows


def _next_pow2(n: int) -> int:
    return 1 << max(0, int(n - 1).bit_length())


def _budget_buckets(totals: np.ndarray, floor: int) -> dict[int, np.ndarray]:
    """Group query indices by the power-of-2 budget ≥ each query's probed
    total.  Under skew this is the fix for the batch-max trap: one query
    probing a giant list gets its own big-budget dispatch instead of
    inflating every other query's scan range; pow2 budgets bound compile
    diversity to one program per (bucket, padded-batch) pair."""
    budgets = np.maximum(np.asarray(totals, np.int64), floor)
    budgets = np.int64(1) << np.int64(
        np.ceil(np.log2(budgets.astype(np.float64)))
    )
    return {
        int(bud): np.nonzero(budgets == bud)[0]
        for bud in np.unique(budgets)
    }


class IVFPQIndex:
    index_type = "ivfpq"

    def __init__(
        self,
        d: int,
        coarse_centroids: np.ndarray,
        codebooks: np.ndarray,
        rotation: np.ndarray | None,
        list_offsets: np.ndarray,
        list_ids: np.ndarray,
        list_codes: np.ndarray,
        nprobe: int = 16,
        refine_vectors: np.ndarray | None = None,
        rerank_factor: int = 4,
    ):
        self.d = d
        self.coarse_centroids = np.asarray(coarse_centroids, np.float32)
        self.codebooks = np.asarray(codebooks, np.float32)
        self.rotation = (
            None if rotation is None else np.asarray(rotation, np.float32)
        )
        self.list_offsets = np.asarray(list_offsets, np.int64)
        self.list_ids = list_ids  # may be mmap
        self.list_codes = list_codes  # may be mmap
        self.nprobe = nprobe
        # optional exact re-ranking over original fp16 vectors (faiss
        # IndexRefineFlat analogue): ADC selects rerank_factor*k candidates,
        # the true vectors re-score them — lifts recall to near-exact while
        # reading only rerank_factor*k mmap'd rows per query
        self.refine_vectors = refine_vectors  # (ntotal, d) fp16, id order
        self.rerank_factor = rerank_factor
        self._device = None
        self._id_to_pos = None
        self._sizes_desc_cumsum = None
        self._chunks_desc_cumsum = None

    # -- basic props -------------------------------------------------------

    @property
    def nlist(self) -> int:
        return self.coarse_centroids.shape[0]

    @property
    def m(self) -> int:
        return self.codebooks.shape[0]

    @property
    def ntotal(self) -> int:
        return int(self.list_ids.shape[0])

    @property
    def pq(self) -> PQCodebooks:
        return PQCodebooks(
            codebooks=jnp.asarray(self.codebooks),
            rotation=None if self.rotation is None else jnp.asarray(self.rotation),
        )

    def list_sizes(self) -> np.ndarray:
        return np.diff(self.list_offsets)

    # -- device image ------------------------------------------------------

    def _device_bytes(self) -> int:
        """HBM needed for the device path: the flat CSR codes plus the
        bounded list-start alignment pad (≤ nlist·C rows)."""
        return (self.ntotal + self.nlist * _ALIGN) * self.m

    def _build_device(self):
        """Stage the CSR codes on device with every list start aligned to
        the Pallas chunk size C — memory is the codes plus ≤ nlist·C pad
        rows regardless of list skew (never an (nlist, Lmax) image), and
        aligned starts let the kernel stream lists via plain BlockSpec
        DMAs.  Construction is fully vectorized (no per-list Python loop)."""
        sizes = self.list_sizes().astype(np.int64)
        csr_starts = self.list_offsets[:-1].astype(np.int64)
        chunk_sizes = -(-sizes // _ALIGN)
        pad_sizes = chunk_sizes * _ALIGN
        astarts = np.zeros(self.nlist, np.int64)
        np.cumsum(pad_sizes[:-1], out=astarts[1:])
        n_aligned = int(astarts[-1] + pad_sizes[-1]) if self.nlist else 0
        n_aligned = max(n_aligned, _ALIGN)
        codes = np.asarray(self.list_codes)
        aligned = np.zeros((n_aligned, self.m), np.uint8)
        if self.ntotal:
            # dst row of CSR row r = astart[list(r)] + (r - csr_start[list(r)])
            dst = (
                np.repeat(astarts - csr_starts, sizes)
                + np.arange(self.ntotal, dtype=np.int64)
            )
            aligned[dst] = codes
        self._device = {
            "coarse": jnp.asarray(self.coarse_centroids),
            "codebooks": jnp.asarray(self.codebooks),
            "rotation": None
            if self.rotation is None
            else jnp.asarray(self.rotation),
            "flat_codes": transfer.device_put_chunked(aligned),
            "astarts": jnp.asarray(astarts.astype(np.int32)),
            "starts": jnp.asarray(csr_starts.astype(np.int32)),
            "sizes": jnp.asarray(sizes.astype(np.int32)),
            "csizes": jnp.asarray(chunk_sizes.astype(np.int32)),
        }

    # -- search ------------------------------------------------------------

    def _rotate(self, q: np.ndarray) -> np.ndarray:
        q = np.asarray(q, np.float32)
        return q if self.rotation is None else q @ self.rotation

    def search(self, queries: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
        if self.refine_vectors is not None and self.rerank_factor > 1:
            from .rerank import exact_rerank

            _, ids = self._search_adc(queries, k * self.rerank_factor)
            return exact_rerank(self.refine_vectors, queries, ids, k)
        return self._search_adc(queries, k)

    def _search_adc(self, queries: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
        if self.ntotal == 0:
            b = np.asarray(queries).shape[0]
            return (
                np.full((b, k), -np.inf, np.float32),
                np.full((b, k), -1, np.int64),
            )
        nprobe = min(self.nprobe, self.nlist)
        if self._device_bytes() <= _DEVICE_BYTES_CAP:
            return self._search_device(queries, k, nprobe)
        return self._search_host(queries, k, nprobe)

    def _static_budget(self, nprobe: int) -> int:
        """Worst-case probed total for any query: the nprobe largest lists.
        A slot budget this size makes the scan exact without a per-call
        device→host sync on the actual totals."""
        if self._sizes_desc_cumsum is None:
            sizes = np.sort(self.list_sizes())[::-1]
            self._sizes_desc_cumsum = np.cumsum(sizes)
        return int(self._sizes_desc_cumsum[min(nprobe, self.nlist) - 1])

    def _static_chunk_budget(self, nprobe: int) -> int:
        """Worst-case probed chunk count (Pallas path): the nprobe largest
        per-list chunk counts ceil(size/C)."""
        if self._chunks_desc_cumsum is None:
            chunks = np.sort(-(-self.list_sizes() // _ALIGN))[::-1]
            self._chunks_desc_cumsum = np.cumsum(chunks)
        return int(self._chunks_desc_cumsum[min(nprobe, self.nlist) - 1])

    def _skew_factor(self, nprobe: int) -> tuple[int, int]:
        """(worst_chunks, expected_chunks): the static worst-case probed
        chunk budget vs what a typical query probes.  worst ≫ expected is
        the skew regime where batch-max budgets over-scan badly."""
        worst_chunks = self._static_chunk_budget(nprobe)
        total_chunks = int(self._chunks_desc_cumsum[-1])
        expected = max(
            8, total_chunks * min(nprobe, self.nlist) // max(self.nlist, 1)
        )
        return worst_chunks, expected

    def _search_device(
        self, queries: np.ndarray, k: int, nprobe: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Streaming CSR scan on device (see module docstring)."""
        if self._device is None:
            self._build_device()
        dv = self._device
        qr = jnp.asarray(self._rotate(queries))
        b = qr.shape[0]
        worst = self._static_budget(nprobe)
        use_pallas = (
            _pick_scorer() == "pallas" and self.codebooks.shape[1] == 256
        )
        # every branch fills these full-size outputs (short buckets leave
        # their -inf/-1 tail in place)
        vals = np.full((b, k), -np.inf, np.float32)
        rows = np.full((b, k), -1, np.int64)
        if use_pallas and worst <= _STATIC_BUDGET_MAX:
            # Pallas streaming ADC (one-hot MXU).  The static chunk budget
            # covers the worst possible probe set (exact).  Under skew the
            # worst case over-scans typical queries badly — one query
            # probing a giant list must not drag the whole batch — so pay
            # one (B,)-vector sync for the actual per-query totals and
            # dispatch per-query-right-sized pow2 budget buckets.
            worst_chunks, expected = self._skew_factor(nprobe)
            interp = jax.devices()[0].platform != "tpu"
            if worst_chunks > 4 * expected:
                _, _, ctotals = _coarse_probe(
                    qr, dv["coarse"], dv["csizes"], nprobe
                )
                buckets = _budget_buckets(np.asarray(ctotals), 8)
            else:
                buckets = {
                    _next_pow2(max(worst_chunks, 8)): np.arange(b)
                }
            pending = []
            for nchunk_q, sel in buckets.items():
                k_eff = min(k, nchunk_q * _ALIGN)
                for s in range(0, len(sel), _PALLAS_MAX_B):
                    sub = sel[s : s + _PALLAS_MAX_B]
                    # pad the bucket to a pow2 batch so compile diversity
                    # stays one program per (budget, padded-batch) pair
                    bpad = _next_pow2(max(len(sub), 1))
                    padded = np.concatenate(
                        [sub, np.repeat(sub[:1], bpad - len(sub))]
                    )
                    v, r = _search_pallas(
                        qr[padded], dv["coarse"], dv["codebooks"],
                        dv["flat_codes"], dv["astarts"], dv["starts"],
                        dv["sizes"],
                        k_eff, nchunk_q, nprobe, interp,
                    )
                    pending.append((sub, k_eff, v, r))
            # all dispatches are in flight before the first readback —
            # through a high-RTT relay the syncs overlap with execution
            for sub, k_eff, v, r in pending:
                v, r = jax.device_get((v, r))
                kk = min(k, k_eff)
                vals[sub, :kk] = v[: len(sub), :kk]
                rows[sub, :kk] = r[: len(sub), :kk]
        elif worst <= _STATIC_BUDGET_MAX and worst <= 4 * max(
            8 * _ALIGN,
            self.ntotal * min(nprobe, self.nlist) // max(self.nlist, 1),
        ):
            # uniform lists: one static-budget dispatch + one readback,
            # exact because the budget covers the worst possible probe set
            slot_budget = _next_pow2(max(worst, 1024))
            window = min(_SCAN_WINDOW, slot_budget)
            nwin = slot_budget // window
            k_eff = min(k, slot_budget)
            v, r = _search_one_shot(
                qr, dv["coarse"], dv["codebooks"], dv["flat_codes"],
                dv["astarts"], dv["starts"], dv["sizes"],
                k_eff, window, nwin, nprobe,
            )
            v, r = jax.device_get((v, r))
            vals[:, :k_eff] = v
            rows[:, :k_eff] = r
        else:
            # skew (or beyond the static cap): pay one (B,)-vector sync for
            # the actual probed totals, then scan right-sized pow2 slot
            # buckets so no query pays another's giant probed list
            probe_vals, probe_idx, totals = _coarse_probe(
                qr, dv["coarse"], dv["sizes"], nprobe
            )
            buckets = _budget_buckets(np.asarray(totals), 1024)
            pending = []
            for slot_budget, sel in buckets.items():
                window = min(_SCAN_WINDOW, slot_budget)
                nwin = slot_budget // window
                k_eff = min(k, slot_budget)
                # bound the per-call transient: split the bucket if the
                # slot range is huge (skew with giant probed lists)
                b_step = max(
                    1, _SLOT_BUDGET_PER_QUERY // max(slot_budget, 1)
                )
                for s in range(0, len(sel), b_step):
                    sub = sel[s : s + b_step]
                    bpad = _next_pow2(max(len(sub), 1))
                    padded = np.concatenate(
                        [sub, np.repeat(sub[:1], bpad - len(sub))]
                    )
                    v, r = _scan_device(
                        qr[padded],
                        dv["codebooks"],
                        dv["flat_codes"],
                        jnp.take(dv["astarts"], probe_idx[padded]),
                        jnp.take(dv["starts"], probe_idx[padded]),
                        jnp.take(dv["sizes"], probe_idx[padded]),
                        probe_vals[padded],
                        k_eff,
                        window,
                        nwin,
                    )
                    pending.append((sub, k_eff, v, r))
            for sub, k_eff, v, r in pending:
                v, r = jax.device_get((v, r))
                kk = min(k, k_eff)
                vals[sub, :kk] = v[: len(sub), :kk]
                rows[sub, :kk] = r[: len(sub), :kk]
        # map CSR positions → original ids on host (ids may exceed int32)
        ids_arr = np.asarray(self.list_ids)
        ids = np.where(rows >= 0, ids_arr[np.where(rows >= 0, rows, 0)], -1)
        return vals, ids

    def _search_host(self, queries: np.ndarray, k: int, nprobe: int):
        """Host scan over the CSR arrays (mmap-friendly).  One batched call
        into the native C++ OpenMP ADC scanner (native/adc_scan.cpp,
        `adc_search_batch` — per-query top-k heaps, queries in parallel)
        when a toolchain is available; numpy gather loop otherwise."""
        from ..native import get_adc_lib

        qr = self._rotate(queries)
        coarse_scores = qr @ self.coarse_centroids.T  # (B, nlist)
        probe_idx = np.argpartition(-coarse_scores, nprobe - 1, axis=1)[
            :, :nprobe
        ]
        m, ksub, dsub = self.codebooks.shape
        lut_all = np.ascontiguousarray(
            np.einsum(
                "bmd,mkd->bmk",
                qr.reshape(qr.shape[0], m, dsub),
                self.codebooks,
            ),
            np.float32,
        )  # (B, M, ksub)
        lib = get_adc_lib() if ksub == 256 else None
        codes_arr = np.asarray(self.list_codes)
        ids_arr = np.asarray(self.list_ids)
        nq = qr.shape[0]
        out_vals = np.full((nq, k), -np.inf, np.float32)
        out_ids = np.full((nq, k), -1, np.int64)
        if lib is not None:
            probes = np.ascontiguousarray(probe_idx, np.int32)
            coarse = np.ascontiguousarray(
                np.take_along_axis(coarse_scores, probe_idx, axis=1),
                np.float32,
            )
            lib.adc_search_batch(
                codes_arr, ids_arr, self.list_offsets,
                probes, nprobe, lut_all, m, coarse, nq, k,
                out_vals, out_ids,
            )
            return out_vals, out_ids
        sizes = self.list_sizes()
        for b in range(nq):
            probes = probe_idx[b]
            if int(sizes[probes].sum()) == 0:
                continue
            scores_all, ids_all = [], []
            lut = lut_all[b]
            for li in probes:
                s, e = self.list_offsets[li], self.list_offsets[li + 1]
                if e <= s:
                    continue
                codes = codes_arr[s:e]
                part = lut[
                    np.arange(m)[None, :], codes.astype(np.int64)
                ].sum(axis=1)
                scores_all.append(
                    (part + coarse_scores[b, li]).astype(np.float32)
                )
                ids_all.append(ids_arr[s:e])
            sc = np.concatenate(scores_all)
            ids = np.concatenate(ids_all)
            kk = min(k, sc.size)
            top = np.argpartition(-sc, kk - 1)[:kk]
            order = top[np.argsort(-sc[top])]
            out_vals[b, :kk] = sc[order]
            out_ids[b, :kk] = ids[order]
        return out_vals, out_ids

    # -- reconstruction ----------------------------------------------------

    def _positions(self, ids: np.ndarray) -> np.ndarray:
        if self._id_to_pos is None:
            all_ids = np.asarray(self.list_ids)
            order = np.argsort(all_ids, kind="stable")
            self._id_to_pos = (all_ids[order], order)
        sorted_ids, order = self._id_to_pos
        pos = np.clip(np.searchsorted(sorted_ids, ids), 0, len(order) - 1)
        missing = sorted_ids[pos] != ids
        if missing.any():
            # silent wrong reconstructions would poison dedup/safety
            # filtering downstream — fail loudly instead
            raise KeyError(
                f"ids not in index: {np.asarray(ids)[missing][:8].tolist()}"
            )
        return order[pos]

    def reconstruct_batch(self, ids: np.ndarray) -> np.ndarray:
        """PQ-decode stored vectors for the given original ids (needed for
        dedup/safety on results, reference `clip_back.py:362`)."""
        ids = np.asarray(ids, np.int64)
        pos = self._positions(ids)
        codes = np.asarray(self.list_codes)[pos]
        # which list each position belongs to → its centroid (residual add)
        list_of_pos = (
            np.searchsorted(self.list_offsets, pos, side="right") - 1
        )
        resid = np.asarray(pq_decode(jnp.asarray(codes), jnp.asarray(self.codebooks)))
        xr = resid + self.coarse_centroids[list_of_pos]
        if self.rotation is not None:
            xr = xr @ self.rotation.T
        return xr.astype(np.float32)

    def search_and_reconstruct(self, queries: np.ndarray, k: int):
        vals, ids = self.search(queries, k)
        flat = ids.reshape(-1)
        # fill invalid (-1) slots with a real id so _positions can't raise
        fill = int(np.asarray(self.list_ids[:1])[0]) if self.ntotal else 0
        safe = np.where(flat >= 0, flat, fill)
        recon = self.reconstruct_batch(safe).reshape(*ids.shape, self.d)
        recon[ids < 0] = 0
        return vals, ids, recon

    # -- io ----------------------------------------------------------------

    def save(self, path: str):
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "header.json"), "w") as f:
            json.dump(
                {
                    "type": "ivfpq",
                    "d": self.d,
                    "ntotal": self.ntotal,
                    "metric": "ip",
                    "nlist": self.nlist,
                    "m": self.m,
                    "ksub": int(self.codebooks.shape[1]),
                    "use_opq": self.rotation is not None,
                    "nprobe": self.nprobe,
                    "has_refine": self.refine_vectors is not None,
                    "rerank_factor": self.rerank_factor,
                },
                f,
            )
        np.save(os.path.join(path, "coarse_centroids.npy"), self.coarse_centroids)
        np.save(os.path.join(path, "codebooks.npy"), self.codebooks)
        if self.rotation is not None:
            np.save(os.path.join(path, "rotation.npy"), self.rotation)
        np.save(os.path.join(path, "list_offsets.npy"), self.list_offsets)
        np.save(os.path.join(path, "list_ids.npy"), np.asarray(self.list_ids))
        np.save(os.path.join(path, "list_codes.npy"), np.asarray(self.list_codes))
        if self.refine_vectors is not None:
            from .rerank import save_rows_fp16

            # streams: the store may be a ShardRowGather or a memmap, and
            # np.asarray on either would materialize ~2 bytes·n·d in RAM
            save_rows_fp16(
                os.path.join(path, "refine_vectors.npy"), self.refine_vectors
            )

    @classmethod
    def load(cls, path: str, mmap: bool = True) -> "IVFPQIndex":
        with open(os.path.join(path, "header.json")) as f:
            h = json.load(f)
        mm = "r" if mmap else None
        rotation = None
        if h.get("use_opq"):
            rotation = np.load(os.path.join(path, "rotation.npy"))
        refine = None
        if h.get("has_refine"):
            refine = np.load(
                os.path.join(path, "refine_vectors.npy"), mmap_mode=mm
            )
        return cls(
            d=h["d"],
            coarse_centroids=np.load(os.path.join(path, "coarse_centroids.npy")),
            codebooks=np.load(os.path.join(path, "codebooks.npy")),
            rotation=rotation,
            list_offsets=np.load(os.path.join(path, "list_offsets.npy")),
            list_ids=np.load(os.path.join(path, "list_ids.npy"), mmap_mode=mm),
            list_codes=np.load(os.path.join(path, "list_codes.npy"), mmap_mode=mm),
            nprobe=h.get("nprobe", 16),
            refine_vectors=refine,
            rerank_factor=h.get("rerank_factor", 4),
        )
