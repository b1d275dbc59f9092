"""IVF-pruned int8 index: coarse pruning + int8 MXU scan of probed lists.

The 100M-per-host serving tier.  The sharded int8 flat tier (sharded_flat.py)
is exact but scans every row: at 12.5M rows/chip that is ~2.4k QPS.  This
index stores rows **grouped by IVF list** (padded (nlist, Lmax, d) int8 on
device) and scans only probed lists:

- coarse scores: one (B, d)×(d, nlist) matmul;
- **union probing**: each query picks its own top-nprobe lists, and the
  batch scans the (statically capped at B·nprobe) union with one dense
  (B, d)×(d, U·Lmax) int8 GEMM — per-query matvecs would run at 1/128 MXU
  efficiency. Extra union lists only add candidates, so per-query recall is
  ≥ classical per-query nprobe recall; the pruning factor is
  nlist/(B·nprobe), so size nlist ≫ B·nprobe (e.g. nlist=32k for
  12M rows/chip at B≤64, nprobe 32);
- row gather is U contiguous (Lmax, d) slices — large-slice gathers are
  MXU-feed-rate on TPU, unlike the per-element LUT gathers that sink
  FAISS-style ADC here (see ops/int8mm.py);
- approx_max_k top-k over the masked (B, U·Lmax) scores.

Scan fraction min(1, B·nprobe/nlist) divides cost vs the flat tier; recall
is the IVF probe recall × int8 (≈1).  Probe recall is data-dependent as in
any IVF (on isotropic high-d synthetic noise, neighbors scatter across many
fine lists — measured 1M×512-d: recall@40 0.35 at nprobe 16 but 0.97 at
nprobe 64, with scores exactly matching the flat scan; real CLIP
embeddings have low intrinsic dimension and probe far better).  Size
nlist ≫ B·nprobe for the pruning to bite: this tier targets small serving
batches over large corpora; use the flat tier when B·nprobe ≈ nlist.
Like all list-grouped layouts, result ids are original vector ids.
"""

from __future__ import annotations

import functools
import json
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.int8mm import quantize_rows, quantize_rows_device


@functools.partial(jax.jit, static_argnames=("k", "probe_lists", "exact_topk"))
def _search_device(
    q,  # (B, d) f32
    coarse,  # (nlist, d) f32
    rows,  # (nlist, Lmax, d) int8
    scales,  # (nlist, Lmax) f32  (0 ⇒ padding row)
    ids,  # (nlist, Lmax) int32 (−1 ⇒ padding)
    k: int,
    probe_lists: int,
    exact_topk: bool,
):
    b, d = q.shape
    nlist = coarse.shape[0]
    coarse_scores = jnp.dot(q, coarse.T, preferred_element_type=jnp.float32)
    # per-query top-nprobe probes, then the batch scans their UNION: every
    # query is guaranteed its own nprobe lists, and the extra union lists
    # only add candidates (recall ≥ per-query nprobe recall, no masking)
    _, per_q = jax.lax.top_k(coarse_scores, min(probe_lists, nlist))  # (B, P)
    presence = (
        jnp.zeros((nlist,), jnp.float32).at[per_q.reshape(-1)].set(1.0)
    )
    agg = jnp.max(coarse_scores, axis=0)
    agg = (agg - jnp.min(agg)) / (
        jnp.max(agg) - jnp.min(agg) + 1e-9
    )  # (0,1) tie-break
    u_cap = min(nlist, b * min(probe_lists, nlist))
    _, top_u = jax.lax.top_k(presence * 2.0 + agg, u_cap)  # (U,)
    sub_rows = rows[top_u]  # (U, Lmax, d) int8 — U big-slice gathers
    sub_scales = scales[top_u]  # (U, Lmax)
    sub_ids = ids[top_u]  # (U, Lmax)
    u, lmax, _ = sub_rows.shape
    qq, q_scale = quantize_rows_device(q)
    acc = jax.lax.dot_general(
        qq,
        sub_rows.reshape(u * lmax, d),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (B, U*Lmax)
    scores = (
        acc.astype(jnp.float32)
        * q_scale[:, None]
        * sub_scales.reshape(1, u * lmax)
    )
    valid = sub_ids.reshape(1, u * lmax) >= 0
    scores = jnp.where(valid, scores, -jnp.inf)
    k_eff = min(k, u * lmax)
    if exact_topk or u * lmax < 4 * 1024:
        vals, pos = jax.lax.top_k(scores, k_eff)
    else:
        vals, pos = jax.lax.approx_max_k(scores, k_eff, recall_target=0.95)
    out_ids = jnp.take_along_axis(
        jnp.broadcast_to(sub_ids.reshape(1, u * lmax), scores.shape), pos,
        axis=1,
    )
    return vals, jnp.where(jnp.isfinite(vals), out_ids, -1)


class IVFInt8Index:
    index_type = "ivf_int8"

    def __init__(
        self,
        d: int,
        coarse_centroids: np.ndarray,
        list_offsets: np.ndarray,
        list_ids: np.ndarray,  # (N,) int64, grouped by list
        q_vectors: np.ndarray,  # (N, d) int8, grouped by list
        scales: np.ndarray,  # (N,) f32
        nprobe: int = 64,
        exact_topk: bool = False,
    ):
        self.d = d
        self.coarse_centroids = np.asarray(coarse_centroids, np.float32)
        self.list_offsets = np.asarray(list_offsets, np.int64)
        self.list_ids = list_ids
        self.q_vectors = q_vectors
        self.scales = scales
        self.nprobe = nprobe  # = probe_lists U (batch-shared)
        self.exact_topk = exact_topk
        self._device = None
        self._id_to_pos = None

    @property
    def nlist(self) -> int:
        return self.coarse_centroids.shape[0]

    @property
    def ntotal(self) -> int:
        return int(self.list_ids.shape[0])

    def list_sizes(self) -> np.ndarray:
        return np.diff(self.list_offsets)

    # -- build -------------------------------------------------------------

    @classmethod
    def from_vectors(
        cls,
        x: np.ndarray,
        nlist: int,
        nprobe: int = 64,
        kmeans_niter: int = 20,
        seed: int = 0,
    ) -> "IVFInt8Index":
        from ..ops import kmeans as km

        # test disk-backing BEFORE any asarray: np.asarray strips the
        # np.memmap subclass (and would copy a non-fp32 memmap fully into
        # RAM); memmap inputs stay as-is and convert per-chunk below
        is_disk = isinstance(x, np.memmap)
        if not is_disk:
            x = np.asarray(x, np.float32)
        n, d = x.shape
        coarse = km.kmeans(x, nlist, niter=kmeans_niter, seed=seed)
        assign = km.assign_chunked(x, coarse)
        order = np.argsort(assign, kind="stable")
        counts = np.bincount(assign, minlength=nlist)
        offsets = np.zeros((nlist + 1,), np.int64)
        np.cumsum(counts, out=offsets[1:])
        # group+quantize CHUNKWISE: x[order] fancy-indexing would
        # materialize the full fp32 corpus in RAM even when x is a
        # disk-backed memmap (~200 GB at the 100M×512 tier); the grouped
        # int8 codes inherit disk backing in that case
        if is_disk:
            from .build import scratch_memmap

            scratch = (
                [os.path.dirname(x.filename)] if x.filename else []
            )
            q = scratch_memmap((n, d), np.int8, scratch)
        else:
            q = np.empty((n, d), np.int8)
        s = np.empty((n,), np.float32)
        chunk = 1 << 17
        for i in range(0, n, chunk):
            sel = order[i : i + chunk]
            qb, sb = quantize_rows(np.asarray(x[sel], np.float32))
            q[i : i + len(sel)] = qb
            s[i : i + len(sel)] = sb
        return cls(
            d,
            np.asarray(coarse),
            offsets,
            order.astype(np.int64),
            q,
            s,
            nprobe=nprobe,
        )

    # -- device image -------------------------------------------------------

    def _ensure_device(self):
        if self._device is not None:
            return
        sizes = self.list_sizes()
        lmax = max(1, int(sizes.max()) if sizes.size else 1)
        nlist = self.nlist
        if self.ntotal >= np.iinfo(np.int32).max:
            raise ValueError(
                f"ivf_int8 device image supports < 2^31 rows per index "
                f"(got {self.ntotal}); shard the corpus"
            )
        rows = np.zeros((nlist, lmax, self.d), np.int8)
        scales = np.zeros((nlist, lmax), np.float32)
        # the device image carries int32 CSR POSITIONS, not vector ids —
        # ids are int64 on disk and may exceed 2^31 (e.g. after combining);
        # positions are bounded by the row count and map back through
        # list_ids on the host after readback
        pos = np.full((nlist, lmax), -1, np.int32)
        for li in range(nlist):
            s, e = self.list_offsets[li], self.list_offsets[li + 1]
            m = int(e - s)
            if m:
                rows[li, :m] = self.q_vectors[s:e]
                scales[li, :m] = self.scales[s:e]
                pos[li, :m] = np.arange(s, e, dtype=np.int32)
        self._device = {
            "coarse": jnp.asarray(self.coarse_centroids),
            "rows": jnp.asarray(rows),
            "scales": jnp.asarray(scales),
            "ids": jnp.asarray(pos),
        }

    def _positions_to_ids(self, pos: np.ndarray) -> np.ndarray:
        """int32 device CSR positions → int64 vector ids (-1 passes through)."""
        pos = np.asarray(pos, np.int64)
        ids = np.asarray(self.list_ids)[np.clip(pos, 0, None)]
        return np.where(pos >= 0, ids, -1)

    @staticmethod
    def _pad_queries_pow2(queries) -> tuple[np.ndarray, int]:
        """Pad the batch dim to a power-of-two bucket by REPEATING the
        first query: every distinct B is its own XLA program, and serving
        micro-batches arrive at arbitrary sizes 1..32 — repeats keep the
        probed-list union identical (they add no new lists).  Returns
        (padded queries, original B)."""
        q = np.asarray(queries, np.float32)
        b = q.shape[0]
        bucket = 1
        while bucket < b:
            bucket *= 2
        if bucket > b:
            q = np.concatenate([q, np.repeat(q[:1], bucket - b, axis=0)])
        return q, b

    # -- search ------------------------------------------------------------

    def search(self, queries: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
        if self.ntotal == 0:
            b = np.asarray(queries).shape[0]
            return (
                np.full((b, k), -np.inf, np.float32),
                np.full((b, k), -1, np.int64),
            )
        self._ensure_device()
        dv = self._device
        u = min(self.nprobe, self.nlist)
        q, b = self._pad_queries_pow2(queries)
        vals, ids = _search_device(
            jnp.asarray(q),
            dv["coarse"],
            dv["rows"],
            dv["scales"],
            dv["ids"],
            min(k, self.ntotal),
            u,
            self.exact_topk,
        )
        vals = np.asarray(vals)[:b]
        ids = self._positions_to_ids(np.asarray(ids)[:b])
        k_eff = vals.shape[1]
        if k_eff < k:
            vals = np.pad(
                vals, ((0, 0), (0, k - k_eff)), constant_values=-np.inf
            )
            ids = np.pad(ids, ((0, 0), (0, k - k_eff)), constant_values=-1)
        return vals, ids

    def _id_positions(self, ids: np.ndarray) -> np.ndarray:
        """id → CSR position; cached sort (the full argsort over all ids is
        seconds of host work at the 100M tier — never per query), loud
        KeyError on unknown ids (silent nearest-row vectors would poison
        dedup/safety filtering downstream)."""
        if self._id_to_pos is None:
            all_ids = np.asarray(self.list_ids)
            order = np.argsort(all_ids, kind="stable")
            self._id_to_pos = (all_ids[order], order)
        sorted_ids, order = self._id_to_pos
        if order.size == 0:
            raise KeyError("reconstruct on an empty index")
        pos = np.clip(np.searchsorted(sorted_ids, ids), 0, len(order) - 1)
        missing = sorted_ids[pos] != ids
        if missing.any():
            raise KeyError(
                f"ids not in index: {np.asarray(ids)[missing][:8].tolist()}"
            )
        return order[pos]

    def reconstruct_batch(self, ids: np.ndarray) -> np.ndarray:
        ids = np.asarray(ids, np.int64)
        pos = self._id_positions(ids)
        return (
            np.asarray(self.q_vectors[pos], np.float32)
            * np.asarray(self.scales[pos])[:, None]
        )

    def search_and_reconstruct(self, queries: np.ndarray, k: int):
        vals, ids = self.search(queries, k)
        if self.ntotal == 0:  # all-(-1) ids: zeros, like FlatIndex
            return vals, ids, np.zeros((*ids.shape, self.d), np.float32)
        flat = ids.reshape(-1)
        # fill invalid (-1) slots with a real id so _id_positions can't raise
        fill = int(np.asarray(self.list_ids[:1])[0])
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
                    "type": "ivf_int8",
                    "d": self.d,
                    "ntotal": self.ntotal,
                    "metric": "ip",
                    "nlist": self.nlist,
                    "nprobe": self.nprobe,
                },
                f,
            )
        np.save(os.path.join(path, "coarse_centroids.npy"), self.coarse_centroids)
        np.save(os.path.join(path, "list_offsets.npy"), self.list_offsets)
        np.save(os.path.join(path, "list_ids.npy"), np.asarray(self.list_ids))
        np.save(os.path.join(path, "q_vectors.npy"), np.asarray(self.q_vectors))
        np.save(os.path.join(path, "scales.npy"), np.asarray(self.scales))

    @classmethod
    def load(cls, path: str, mmap: bool = True) -> "IVFInt8Index":
        with open(os.path.join(path, "header.json")) as f:
            h = json.load(f)
        mm = "r" if mmap else None
        return cls(
            h["d"],
            np.load(os.path.join(path, "coarse_centroids.npy")),
            np.load(os.path.join(path, "list_offsets.npy")),
            np.load(os.path.join(path, "list_ids.npy"), mmap_mode=mm),
            np.load(os.path.join(path, "q_vectors.npy"), mmap_mode=mm),
            np.load(os.path.join(path, "scales.npy")),
            nprobe=h.get("nprobe", 64),
        )
