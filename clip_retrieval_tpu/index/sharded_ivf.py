"""List-sharded IVF-int8: multi-chip execution over the ivf_int8 format.

The multi-chip serving tier toward the BASELINE.json north star (≥10k QPS on
a 100M-vector index).  `IVFInt8Index` (ivf_int8.py) scans probed lists with
one int8 MXU GEMM but keeps the whole (nlist, Lmax, d) image on one chip;
this tier shards **inverted lists** across a device mesh instead:

- coarse centroids and list images are row-sharded over the `dp` axis —
  shard i owns lists [i·ls, (i+1)·ls), HBM per chip = total/n_dev;
- a query batch is replicated; every shard probes its own top-nprobe local
  lists and scans their union with a local int8 GEMM (union probing exactly
  as in ivf_int8.py — the global probe set is the union of per-shard
  winners ⊇ the global top-nprobe, so recall ≥ the single-chip tier);
- each shard emits its local top-k, and one `all_gather` of (B, k) values +
  ids (B × k × 8 bytes per shard, the only cross-chip traffic) feeds the
  final replicated top-k merge — the same merge pattern the sharded flat
  tier uses (sharded_flat.py).

Disk format is unchanged ivf_int8 (same directory loads on either tier);
there is no reference counterpart — FAISS shards with IndexShards on host
threads (`/root/reference` delegates all search to faiss C++,
`clip_back.py:355-369`), while this rides ICI collectives inside one jitted
program.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.int8mm import quantize_rows_device
from ..parallel.mesh import local_mesh, pad_to_multiple
from .ivf_int8 import (
    IVFInt8Index,
    _chunk_len,
    _next_pow2,
    _quarter_pow2,
    build_chunked_image,
    chunk_budget,
)


class ShardedIVFInt8Index(IVFInt8Index):
    """IVF-int8 with inverted lists sharded across a device mesh."""

    def __init__(self, *args, mesh: Mesh | None = None, **kwargs):
        super().__init__(*args, **kwargs)
        self.mesh = mesh
        self._search_fn = None
        self._probe_fn = None

    # -- device image --------------------------------------------------------

    def _ensure_device(self):
        if self._device is not None:
            return
        mesh = self.mesh or local_mesh()
        self.mesh = mesh
        n_dev = mesh.devices.size
        nlist = self.nlist
        nlist_pad = pad_to_multiple(max(nlist, n_dev), n_dev)
        if self.ntotal >= np.iinfo(np.int32).max:
            raise ValueError(
                f"ivf_int8 device image supports < 2^31 rows per index "
                f"(got {self.ntotal}); shard the corpus"
            )
        lc = _chunk_len(self.ntotal, nlist)
        ls = nlist_pad // n_dev  # lists per shard
        sizes = np.zeros((nlist_pad,), np.int64)
        sizes[:nlist] = self.list_sizes()
        chunk_counts = -(-sizes // lc)
        # shard-equal chunk counts: every shard's image is padded to the
        # largest shard's chunk count (padding chunks carry clist = −1 and
        # are masked out of the chunk top-k)
        per_shard_nc = chunk_counts.reshape(n_dev, ls).sum(axis=1)
        # +1: every shard gets at least one guaranteed-padding chunk at
        # index nc_shard − 1 — the exact-union path pads its per-shard
        # chunk selections with it (same contract as the single-chip tier)
        nc_shard = max(1, int(per_shard_nc.max())) + 1
        self._shard_chunk_counts = chunk_counts.reshape(n_dev, ls)
        self._shard_nc = per_shard_nc  # real (unpadded) chunks per shard
        self._shard_castarts = np.zeros((n_dev, ls), np.int64)
        np.cumsum(
            self._shard_chunk_counts[:, :-1], axis=1,
            out=self._shard_castarts[:, 1:],
        )
        self._shard_pad_chunk = nc_shard - 1
        self._lc = lc
        # stream the image shard by shard: build one shard's slice, put it
        # on its device, free it — peak host RSS ≈ one shard (the slice is
        # disk-backed scratch above _SCRATCH_ROWS rows), never the full
        # (nlist_pad, Lmax, d) host image the r2 layout materialized
        devices = mesh.devices.reshape(-1)
        bufs = {"rows": [], "scales": [], "ids": [], "clist": [], "coarse": [],
                "valid": []}
        coarse_pad = np.zeros((nlist_pad, self.d), np.float32)
        coarse_pad[:nlist] = self.coarse_centroids
        # padding lists (nlist..nlist_pad) are masked out of the probe by an
        # explicit validity vector — a sentinel centroid can outrank real
        # lists for queries with a negative dot against it, silently burning
        # probe slots on empty lists
        list_valid = np.zeros((nlist_pad,), np.bool_)
        list_valid[:nlist] = True
        for s in range(n_dev):
            lo, hi = s * ls, min(nlist, (s + 1) * ls)
            if hi <= lo:  # shard owns only padding lists
                img = build_chunked_image(
                    self.q_vectors, self.scales, self.list_offsets, lc,
                    lo=0, hi=0, pad_chunks=nc_shard,
                )
            else:
                img = build_chunked_image(
                    self.q_vectors, self.scales, self.list_offsets, lc,
                    lo=lo, hi=hi, pad_chunks=nc_shard,
                )
            dev = devices[s]
            bufs["rows"].append(jax.device_put(img["rows"], dev))
            bufs["scales"].append(jax.device_put(img["scales"], dev))
            bufs["ids"].append(jax.device_put(img["pos"], dev))
            bufs["clist"].append(jax.device_put(img["clist"], dev))
            bufs["coarse"].append(
                jax.device_put(coarse_pad[s * ls : (s + 1) * ls], dev)
            )
            bufs["valid"].append(
                jax.device_put(list_valid[s * ls : (s + 1) * ls], dev)
            )
            del img  # host slice freed before the next shard is built
        row_sh = NamedSharding(mesh, P("dp"))

        def _assemble(name, per_shard_shape):
            return jax.make_array_from_single_device_arrays(
                (n_dev * per_shard_shape[0], *per_shard_shape[1:]),
                row_sh,
                bufs[name],
            )

        self._device = {
            "coarse": _assemble("coarse", (ls, self.d)),
            "rows": _assemble("rows", (nc_shard, lc, self.d)),
            "scales": _assemble("scales", (nc_shard, lc)),
            "ids": _assemble("ids", (nc_shard, lc)),
            "clist": _assemble("clist", (nc_shard,)),
            "valid": _assemble("valid", (ls,)),
        }

        def shard_search(q, coarse_l, rows_l, scales_l, ids_l, clist_l,
                         valid_l, k, probe, u_cap, exact_topk):
            # per shard: probe the top-`probe` LOCAL lists, expand list
            # scores to this shard's chunks, scan the union with one int8
            # GEMM, emit local top-k with global CSR positions
            b, d = q.shape
            cs = jnp.dot(q, coarse_l.T, preferred_element_type=jnp.float32)
            cs = jnp.where(valid_l[None, :], cs, jnp.float32(-1e30))
            p = min(probe, ls)
            _, per_q = jax.lax.top_k(cs, p)  # (B, p) local list idx
            presence = (
                jnp.zeros((ls,), jnp.float32).at[per_q.reshape(-1)].set(1.0)
            )
            presence = jnp.where(valid_l, presence, 0.0)
            agg = jnp.max(cs, axis=0)
            amin = jnp.min(jnp.where(valid_l, agg, jnp.inf))
            amax = jnp.max(jnp.where(valid_l, agg, -jnp.inf))
            agg = jnp.where(
                valid_l, (agg - amin) / (amax - amin + 1e-9), -1.0
            )  # padding lists rank below every real list in the union fill
            list_score = presence * 2.0 + agg
            chunk_score = jnp.where(
                clist_l >= 0,
                jnp.take(list_score, jnp.clip(clist_l, 0, ls - 1)),
                -jnp.inf,
            )
            # this shard's ACTUAL probed-union chunk count; the pmax over
            # shards is read back by union="device" to verify its
            # adaptive u_cap covered every shard's union
            n_union = jnp.sum(chunk_score >= 2.0).astype(jnp.int32)
            n_union = jax.lax.pmax(n_union, "dp")
            u = min(int(clist_l.shape[0]), u_cap)
            _, top_u = jax.lax.top_k(chunk_score, u)
            sub_rows = rows_l[top_u]  # (U, Lc, d) big-slice gathers
            sub_scales = scales_l[top_u]
            sub_ids = ids_l[top_u]
            qq, q_scale = quantize_rows_device(q)
            acc = jax.lax.dot_general(
                qq,
                sub_rows.reshape(u * lc, d),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            scores = (
                acc.astype(jnp.float32)
                * q_scale[:, None]
                * sub_scales.reshape(1, u * lc)
            )
            valid = sub_ids.reshape(1, u * lc) >= 0
            scores = jnp.where(valid, scores, -jnp.inf)
            k_loc = min(k, u * lc)
            if exact_topk or u * lc < 4 * 1024:
                vals, pos = jax.lax.top_k(scores, k_loc)
            else:
                vals, pos = jax.lax.approx_max_k(
                    scores, k_loc, recall_target=0.95
                )
            gids = jnp.take_along_axis(
                jnp.broadcast_to(sub_ids.reshape(1, u * lc), scores.shape),
                pos,
                axis=1,
            )
            gids = jnp.where(jnp.isfinite(vals), gids, -1)
            if k_loc < k:  # tiny shard: pad so all shards agree on k
                vals = jnp.pad(
                    vals, ((0, 0), (0, k - k_loc)), constant_values=-jnp.inf
                )
                gids = jnp.pad(
                    gids, ((0, 0), (0, k - k_loc)), constant_values=-1
                )
            # merge across shards: gather every shard's candidates, re-rank
            all_vals = jax.lax.all_gather(vals, "dp", axis=1, tiled=True)
            all_gids = jax.lax.all_gather(gids, "dp", axis=1, tiled=True)
            mvals, mpos = jax.lax.top_k(all_vals, k)
            mgids = jnp.take_along_axis(all_gids, mpos, axis=1)
            return mvals, mgids, n_union

        def search(q, coarse, rows_a, scales_a, ids_a, clist_a, valid_a,
                   k, probe, u_cap, exact_topk):
            kwargs = dict(
                mesh=mesh,
                in_specs=(
                    P(), P("dp"), P("dp"), P("dp"), P("dp"), P("dp"), P("dp"),
                ),
                out_specs=(P(), P(), P()),
            )
            body = partial(
                shard_search, k=k, probe=probe, u_cap=u_cap,
                exact_topk=exact_topk,
            )
            try:
                fn = jax.shard_map(body, check_vma=False, **kwargs)
            except TypeError:  # older jax spelling
                fn = jax.shard_map(body, check_rep=False, **kwargs)
            return fn(q, coarse, rows_a, scales_a, ids_a, clist_a, valid_a)

        self._search_fn = jax.jit(
            search, static_argnames=("k", "probe", "u_cap", "exact_topk")
        )

        # ---- exact-union two-phase programs (union="exact", default) ----

        def shard_probe(q, coarse_l, valid_l, probe):
            # per-shard top-`probe` LOCAL lists; (1, B, p) so the stacked
            # global readback is (n_dev, B, p) local indices
            cs = jnp.dot(q, coarse_l.T, preferred_element_type=jnp.float32)
            cs = jnp.where(valid_l[None, :], cs, jnp.float32(-1e30))
            _, per_q = jax.lax.top_k(cs, min(probe, ls))
            return per_q[None]

        def probe(q, coarse, valid_a, probe_lists):
            kwargs = dict(
                mesh=mesh,
                in_specs=(P(), P("dp"), P("dp")),
                out_specs=P("dp"),
            )
            body = partial(shard_probe, probe=probe_lists)
            try:
                fn = jax.shard_map(body, check_vma=False, **kwargs)
            except TypeError:  # older jax spelling
                fn = jax.shard_map(body, check_rep=False, **kwargs)
            return fn(q, coarse, valid_a)

        self._probe_fn = jax.jit(probe, static_argnames=("probe_lists",))

        def shard_scan_sel(q, rows_l, scales_l, ids_l, sel_l, k, exact_topk):
            # scan exactly the host-selected local chunks (padded with the
            # shard's all-padding chunk), then the same local-top-k →
            # all_gather → replicated merge as the static path
            b, d = q.shape
            sel = sel_l[0]  # (u,)
            u = sel.shape[0]
            sub_rows = rows_l[sel]
            sub_scales = scales_l[sel]
            sub_ids = ids_l[sel]
            qq, q_scale = quantize_rows_device(q)
            acc = jax.lax.dot_general(
                qq,
                sub_rows.reshape(u * lc, d),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            scores = (
                acc.astype(jnp.float32)
                * q_scale[:, None]
                * sub_scales.reshape(1, u * lc)
            )
            valid = sub_ids.reshape(1, u * lc) >= 0
            scores = jnp.where(valid, scores, -jnp.inf)
            k_loc = min(k, u * lc)
            if exact_topk or u * lc < 4 * 1024:
                vals, pos = jax.lax.top_k(scores, k_loc)
            else:
                vals, pos = jax.lax.approx_max_k(
                    scores, k_loc, recall_target=0.95
                )
            gids = jnp.take_along_axis(
                jnp.broadcast_to(sub_ids.reshape(1, u * lc), scores.shape),
                pos,
                axis=1,
            )
            gids = jnp.where(jnp.isfinite(vals), gids, -1)
            if k_loc < k:
                vals = jnp.pad(
                    vals, ((0, 0), (0, k - k_loc)), constant_values=-jnp.inf
                )
                gids = jnp.pad(
                    gids, ((0, 0), (0, k - k_loc)), constant_values=-1
                )
            all_vals = jax.lax.all_gather(vals, "dp", axis=1, tiled=True)
            all_gids = jax.lax.all_gather(gids, "dp", axis=1, tiled=True)
            mvals, mpos = jax.lax.top_k(all_vals, k)
            mgids = jnp.take_along_axis(all_gids, mpos, axis=1)
            return mvals, mgids

        def scan_sel(q, rows_a, scales_a, ids_a, sel_a, k, exact_topk):
            kwargs = dict(
                mesh=mesh,
                in_specs=(P(), P("dp"), P("dp"), P("dp"), P("dp")),
                out_specs=(P(), P()),
            )
            body = partial(shard_scan_sel, k=k, exact_topk=exact_topk)
            try:
                fn = jax.shard_map(body, check_vma=False, **kwargs)
            except TypeError:  # older jax spelling
                fn = jax.shard_map(body, check_rep=False, **kwargs)
            return fn(q, rows_a, scales_a, ids_a, sel_a)

        self._scan_fn = jax.jit(
            scan_sel, static_argnames=("k", "exact_topk")
        )

    # -- search --------------------------------------------------------------

    def _shard_union_chunk_sel(self, per_q: np.ndarray, u_cap: int) -> np.ndarray:
        """Per-shard exact-union chunk selections, one row per shard,
        each padded to `u_cap` with that shard's all-padding chunk.
        `per_q` is the (n_dev, B, p) LOCAL probed-list readback."""
        n_dev = per_q.shape[0]
        sel = np.full((n_dev, u_cap), self._shard_pad_chunk, np.int32)
        self.last_union_chunks = []  # per shard, pre-padding (capacity §6)
        for s in range(n_dev):
            lists = np.unique(per_q[s].reshape(-1))
            cc = self._shard_chunk_counts[s][lists]
            n = int(cc.sum())
            self.last_union_chunks.append(n)
            if u_cap >= self._shard_nc[s]:
                sel[s, : self._shard_nc[s]] = np.arange(
                    self._shard_nc[s], dtype=np.int32
                )
                continue
            ends = np.cumsum(cc)
            intra = np.arange(n, dtype=np.int64) - np.repeat(ends - cc, cc)
            sel[s, :n] = (
                np.repeat(self._shard_castarts[s][lists], cc) + intra
            ).astype(np.int32)
        return sel

    def _run_search_fn(self, q, k_dev: int, p: int, u_cap: int):
        return self._search_fn(
            jnp.asarray(q),
            self._device["coarse"],
            self._device["rows"],
            self._device["scales"],
            self._device["ids"],
            self._device["clist"],
            self._device["valid"],
            k_dev,
            p,
            u_cap,
            self.exact_topk,
        )

    def _union_expect_chunks(self, padded_b: int, p: int) -> float:
        """Per-SHARD union expectation: each shard probes its own top-p of
        ls local lists, so the birthday expectation runs over ls, and the
        mean chunks/list over that shard's counts; the cap must cover the
        worst shard, so take the max."""
        best = 0.0
        for counts in self._shard_chunk_counts:
            ls = counts.size
            if ls == 0:
                continue
            exp_lists = ls * (1.0 - (1.0 - 1.0 / ls) ** (padded_b * p))
            best = max(best, exp_lists * float(counts.mean()) * 1.25)
        return best

    def _union_worst_chunks(self, padded_b: int, p: int) -> int:
        return max(
            chunk_budget(counts, padded_b * p)
            for counts in self._shard_chunk_counts
        )

    def _search_int8(self, queries: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
        # the refine/rerank wrapper lives in the base class search(); this
        # override only swaps the scan for the mesh-sharded one
        if self.ntotal == 0:
            b = np.asarray(queries).shape[0]
            return (
                np.full((b, k), -np.inf, np.float32),
                np.full((b, k), -1, np.int64),
            )
        self._ensure_device()
        q, b = self._pad_queries_pow2(queries)
        p = min(self.nprobe, self.nlist)
        k_dev = min(k, self.ntotal)
        mode = self._resolve_union(q.shape[0])
        self._last_union_resolved = mode
        if mode == "exact":
            # phase 1: per-shard probed lists (tiny readback), host sizes
            # every shard's selection to its ACTUAL union; one shared
            # ¼-pow2 cap (shard_map needs equal shapes across shards)
            per_q = np.asarray(
                self._probe_fn(
                    jnp.asarray(q), self._device["coarse"],
                    self._device["valid"], p,
                )
            )
            n_worst = max(
                int(self._shard_chunk_counts[s][
                    np.unique(per_q[s].reshape(-1))
                ].sum())
                for s in range(per_q.shape[0])
            )
            u_cap = min(
                _quarter_pow2(max(n_worst, 16)), int(self._shard_nc.max())
            )
            sel = self._shard_union_chunk_sel(per_q, u_cap)
            vals, ids = self._scan_fn(
                jnp.asarray(q),
                self._device["rows"],
                self._device["scales"],
                self._device["ids"],
                jnp.asarray(sel),
                k_dev,
                self.exact_topk,
            )
        elif mode == "device":
            # single dispatch, adaptive per-shard cap: every shard selects
            # its own probed union on device; the pmax'd true union size
            # comes back with the results and grows the cap on overflow
            nc_max = int(self._shard_nc.max())
            u_cap = min(self._device_union_cap(q.shape[0], p), nc_max)
            vals, ids, n_union = self._run_search_fn(q, k_dev, p, u_cap)
            n_union = int(n_union)
            self.last_union_chunks = n_union  # per-shard max (scalar)
            if n_union > u_cap:
                u_cap = min(
                    self._grow_device_cap(q.shape[0], p, n_union), nc_max
                )
                vals, ids, _ = self._run_search_fn(q, k_dev, p, u_cap)
        else:
            # static: per-shard worst-case probed-union chunk budget (max
            # over shards, pow2 so compile diversity stays bounded)
            u_cap = _next_pow2(self._union_worst_chunks(q.shape[0], p))
            vals, ids, _ = self._run_search_fn(q, k_dev, p, u_cap)
        vals = np.asarray(vals)[:b]
        ids = self._positions_to_ids(np.asarray(ids)[:b])
        k_eff = vals.shape[1]
        if k_eff < k:
            vals = np.pad(
                vals, ((0, 0), (0, k - k_eff)), constant_values=-np.inf
            )
            ids = np.pad(ids, ((0, 0), (0, k - k_eff)), constant_values=-1)
        return vals, ids

    # -- io --------------------------------------------------------------

    @classmethod
    def load(
        cls, path: str, mmap: bool = True, mesh: Mesh | None = None
    ) -> "ShardedIVFInt8Index":
        # delegate to the single-chip loader so header-format evolution
        # (e.g. exact_topk) has exactly one reader
        return cls.from_index(IVFInt8Index.load(path, mmap=mmap), mesh=mesh)

    @classmethod
    def from_vectors(
        cls, x: np.ndarray, nlist: int, mesh: Mesh | None = None, **kwargs
    ) -> "ShardedIVFInt8Index":
        ix = IVFInt8Index.from_vectors(x, nlist, **kwargs)
        return cls.from_index(ix, mesh=mesh)

    @classmethod
    def from_index(
        cls, ivf: IVFInt8Index, mesh: Mesh | None = None
    ) -> "ShardedIVFInt8Index":
        return cls(
            ivf.d,
            ivf.coarse_centroids,
            ivf.list_offsets,
            ivf.list_ids,
            ivf.q_vectors,
            ivf.scales,
            nprobe=ivf.nprobe,
            exact_topk=ivf.exact_topk,
            refine_vectors=ivf.refine_vectors,
            rerank_factor=ivf.rerank_factor,
            mesh=mesh,
        )
