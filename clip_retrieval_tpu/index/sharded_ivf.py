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
from .ivf_int8 import IVFInt8Index


class ShardedIVFInt8Index(IVFInt8Index):
    """IVF-int8 with inverted lists sharded across a device mesh."""

    def __init__(self, *args, mesh: Mesh | None = None, **kwargs):
        super().__init__(*args, **kwargs)
        self.mesh = mesh
        self._search_fn = None

    # -- device image --------------------------------------------------------

    def _ensure_device(self):
        if self._device is not None:
            return
        mesh = self.mesh or local_mesh()
        self.mesh = mesh
        n_dev = mesh.devices.size
        sizes = self.list_sizes()
        lmax = max(1, int(sizes.max()) if sizes.size else 1)
        nlist = self.nlist
        nlist_pad = pad_to_multiple(max(nlist, n_dev), n_dev)
        if self.ntotal >= np.iinfo(np.int32).max:
            raise ValueError(
                f"ivf_int8 device image supports < 2^31 rows per index "
                f"(got {self.ntotal}); shard the corpus"
            )
        rows = np.zeros((nlist_pad, lmax, self.d), np.int8)
        scales = np.zeros((nlist_pad, lmax), np.float32)
        # int32 CSR positions, not raw ids (ids are int64 and may exceed
        # 2^31); mapped back through list_ids on host after the merge
        ids = np.full((nlist_pad, lmax), -1, np.int32)
        for li in range(nlist):
            s, e = self.list_offsets[li], self.list_offsets[li + 1]
            m = int(e - s)
            if m:
                rows[li, :m] = self.q_vectors[s:e]
                scales[li, :m] = self.scales[s:e]
                ids[li, :m] = np.arange(s, e, dtype=np.int32)
        coarse = np.zeros((nlist_pad, self.d), np.float32)
        coarse[:nlist] = self.coarse_centroids
        # padding lists (nlist..nlist_pad) are masked out of the probe by an
        # explicit validity vector — a sentinel centroid can outrank real
        # lists for queries with a negative dot against it, silently burning
        # probe slots on empty lists
        list_valid = np.zeros((nlist_pad,), np.bool_)
        list_valid[:nlist] = True
        row_sh = NamedSharding(mesh, P("dp"))
        self._device = {
            "coarse": jax.device_put(coarse, row_sh),
            "rows": jax.device_put(rows, row_sh),
            "scales": jax.device_put(scales, row_sh),
            "ids": jax.device_put(ids, row_sh),
            "valid": jax.device_put(list_valid, row_sh),
        }
        ls = nlist_pad // n_dev  # lists per shard

        def shard_search(q, coarse_l, rows_l, scales_l, ids_l, valid_l,
                         k, probe, exact_topk):
            # per shard: probe the top-`probe` LOCAL lists, scan their
            # union, emit local top-k with global vector ids
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
            u_cap = min(ls, b * p)
            _, top_u = jax.lax.top_k(presence * 2.0 + agg, u_cap)
            sub_rows = rows_l[top_u]  # (U, Lmax, d) big-slice gathers
            sub_scales = scales_l[top_u]
            sub_ids = ids_l[top_u]
            u, lm, _ = sub_rows.shape
            qq, q_scale = quantize_rows_device(q)
            acc = jax.lax.dot_general(
                qq,
                sub_rows.reshape(u * lm, d),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            scores = (
                acc.astype(jnp.float32)
                * q_scale[:, None]
                * sub_scales.reshape(1, u * lm)
            )
            valid = sub_ids.reshape(1, u * lm) >= 0
            scores = jnp.where(valid, scores, -jnp.inf)
            k_loc = min(k, u * lm)
            if exact_topk or u * lm < 4 * 1024:
                vals, pos = jax.lax.top_k(scores, k_loc)
            else:
                vals, pos = jax.lax.approx_max_k(
                    scores, k_loc, recall_target=0.95
                )
            gids = jnp.take_along_axis(
                jnp.broadcast_to(sub_ids.reshape(1, u * lm), scores.shape),
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
            return mvals, mgids

        def search(q, coarse, rows_a, scales_a, ids_a, valid_a, k, probe,
                   exact_topk):
            kwargs = dict(
                mesh=mesh,
                in_specs=(P(), P("dp"), P("dp"), P("dp"), P("dp"), P("dp")),
                out_specs=(P(), P()),
            )
            body = partial(
                shard_search, k=k, probe=probe, exact_topk=exact_topk
            )
            try:
                fn = jax.shard_map(body, check_vma=False, **kwargs)
            except TypeError:  # older jax spelling
                fn = jax.shard_map(body, check_rep=False, **kwargs)
            return fn(q, coarse, rows_a, scales_a, ids_a, valid_a)

        self._search_fn = jax.jit(
            search, static_argnames=("k", "probe", "exact_topk")
        )

    # -- search --------------------------------------------------------------

    def search(self, queries: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
        if self.ntotal == 0:
            b = np.asarray(queries).shape[0]
            return (
                np.full((b, k), -np.inf, np.float32),
                np.full((b, k), -1, np.int64),
            )
        self._ensure_device()
        q, b = self._pad_queries_pow2(queries)
        vals, ids = self._search_fn(
            jnp.asarray(q),
            self._device["coarse"],
            self._device["rows"],
            self._device["scales"],
            self._device["ids"],
            self._device["valid"],
            min(k, self.ntotal),
            min(self.nprobe, self.nlist),
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
            mesh=mesh,
        )
