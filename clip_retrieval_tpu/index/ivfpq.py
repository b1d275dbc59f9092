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

Search (device path): coarse top-nprobe via one matmul; probed lists are
gathered from a padded (nlist, Lmax) device image of the CSR arrays; ADC
scores = LUT gather + coarse term (IP decomposition q·c + q·r̂); masked
top-k.  Indices whose padded image exceeds HBM fall back to a numpy host
scan over the mmap'd CSR arrays (same math, used for >100M-vector serving
until the Pallas streaming scan lands).
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

_DEVICE_BYTES_CAP = 6 << 30  # max padded-list bytes to keep resident on device


@functools.partial(jax.jit, static_argnames=("k", "nprobe"))
def _search_device(
    qr,  # (B, d) rotated queries f32
    coarse,  # (nlist, d) f32
    codebooks,  # (M, ksub, dsub) f32
    padded_ids,  # (nlist, Lmax) i32 (−1 padding)
    padded_codes,  # (nlist, Lmax, M) u8
    k: int,
    nprobe: int,
):
    coarse_scores = jnp.dot(qr, coarse.T, preferred_element_type=jnp.float32)
    probe_vals, probe_idx = jax.lax.top_k(coarse_scores, nprobe)  # (B, P)
    cand_ids = padded_ids[probe_idx]  # (B, P, L)
    cand_codes = padded_codes[probe_idx]  # (B, P, L, M)
    b, p, l, m = cand_codes.shape
    lut = adc_lut(qr, codebooks)  # (B, M, ksub)
    codes_flat = (
        cand_codes.reshape(b, p * l, m).transpose(0, 2, 1).astype(jnp.int32)
    )  # (B, M, P*L)
    gathered = jnp.take_along_axis(lut, codes_flat, axis=2)  # (B, M, P*L)
    scores = jnp.sum(gathered, axis=1)  # (B, P*L)
    scores = scores + jnp.repeat(probe_vals, l, axis=1)  # + q·centroid
    valid = cand_ids.reshape(b, p * l) >= 0
    scores = jnp.where(valid, scores, -jnp.inf)
    vals, pos = jax.lax.top_k(scores, k)
    ids = jnp.take_along_axis(cand_ids.reshape(b, p * l), pos, axis=1)
    ids = jnp.where(jnp.isfinite(vals), ids, -1)
    return vals, ids


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

    def _padded_bytes(self) -> int:
        lmax = int(self.list_sizes().max()) if self.ntotal else 0
        return self.nlist * lmax * (self.m + 4)

    def _build_device(self):
        sizes = self.list_sizes()
        lmax = max(1, int(sizes.max()) if sizes.size else 1)
        nlist = self.nlist
        pid = np.full((nlist, lmax), -1, np.int32)
        pcode = np.zeros((nlist, lmax, self.m), np.uint8)
        for li in range(nlist):
            s, e = self.list_offsets[li], self.list_offsets[li + 1]
            n = e - s
            if n:
                pid[li, :n] = self.list_ids[s:e]
                pcode[li, :n] = self.list_codes[s:e]
        self._device = {
            "coarse": jnp.asarray(self.coarse_centroids),
            "codebooks": jnp.asarray(self.codebooks),
            "rotation": None
            if self.rotation is None
            else jnp.asarray(self.rotation),
            "padded_ids": jnp.asarray(pid),
            "padded_codes": jnp.asarray(pcode),
        }

    # -- search ------------------------------------------------------------

    def _rotate(self, q: np.ndarray) -> np.ndarray:
        q = np.asarray(q, np.float32)
        return q if self.rotation is None else q @ self.rotation

    def _rerank(self, queries: np.ndarray, vals: np.ndarray,
                ids: np.ndarray, k: int):
        """Exact re-score of ADC candidates against the stored fp16 rows."""
        q = np.asarray(queries, np.float32)
        out_vals = np.full((q.shape[0], k), -np.inf, np.float32)
        out_ids = np.full((q.shape[0], k), -1, np.int64)
        for b in range(q.shape[0]):
            cand = ids[b][ids[b] >= 0]
            if cand.size == 0:
                continue
            vecs = np.asarray(self.refine_vectors[cand], np.float32)
            sc = vecs @ q[b]
            kk = min(k, sc.size)
            top = np.argpartition(-sc, kk - 1)[:kk]
            order = top[np.argsort(-sc[top])]
            out_vals[b, :kk] = sc[order]
            out_ids[b, :kk] = cand[order]
        return out_vals, out_ids

    def search(self, queries: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
        if self.refine_vectors is not None and self.rerank_factor > 1:
            vals, ids = self._search_adc(
                queries, k * self.rerank_factor
            )
            return self._rerank(queries, vals, ids, k)
        return self._search_adc(queries, k)

    def _search_adc(self, queries: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
        if self.ntotal == 0:
            b = np.asarray(queries).shape[0]
            return (
                np.full((b, k), -np.inf, np.float32),
                np.full((b, k), -1, np.int64),
            )
        nprobe = min(self.nprobe, self.nlist)
        if self._padded_bytes() <= _DEVICE_BYTES_CAP:
            if self._device is None:
                self._build_device()
            dv = self._device
            qr = jnp.asarray(self._rotate(queries))
            lmax = dv["padded_ids"].shape[1]
            k_eff = min(k, nprobe * lmax)
            vals, ids = _search_device(
                qr,
                dv["coarse"],
                dv["codebooks"],
                dv["padded_ids"],
                dv["padded_codes"],
                k_eff,
                nprobe,
            )
            vals, ids = np.asarray(vals), np.asarray(ids, np.int64)
            if k_eff < k:
                vals = np.pad(
                    vals, ((0, 0), (0, k - k_eff)), constant_values=-np.inf
                )
                ids = np.pad(
                    ids, ((0, 0), (0, k - k_eff)), constant_values=-1
                )
            return vals, ids
        return self._search_host(queries, k, nprobe)

    def _search_host(self, queries: np.ndarray, k: int, nprobe: int):
        """Host scan over the CSR arrays (mmap-friendly).  Uses the native
        C++ OpenMP ADC scanner (native/adc_scan.cpp) when a toolchain is
        available; numpy gather otherwise."""
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
        sizes = self.list_sizes()
        codes_arr = np.asarray(self.list_codes)
        ids_arr = np.asarray(self.list_ids)
        out_vals = np.full((qr.shape[0], k), -np.inf, np.float32)
        out_ids = np.full((qr.shape[0], k), -1, np.int64)
        for b in range(qr.shape[0]):
            probes = np.ascontiguousarray(probe_idx[b], np.int32)
            total = int(sizes[probes].sum())
            if total == 0:
                continue
            if lib is not None:
                sc = np.empty((total,), np.float32)
                ids = np.empty((total,), np.int64)
                coarse = np.ascontiguousarray(
                    coarse_scores[b, probes], np.float32
                )
                n = lib.adc_scan_lists(
                    codes_arr,
                    ids_arr,
                    self.list_offsets,
                    probes,
                    len(probes),
                    lut_all[b],
                    m,
                    coarse,
                    sc,
                    ids,
                )
                sc, ids = sc[:n], ids[:n]
            else:
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
        pos = np.searchsorted(sorted_ids, ids)
        pos = np.clip(pos, 0, len(order) - 1)
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
        safe = np.where(flat >= 0, flat, 0)
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
            np.save(
                os.path.join(path, "refine_vectors.npy"),
                np.asarray(self.refine_vectors, np.float16),
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
