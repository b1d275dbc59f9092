"""TPU k-means (Lloyd's) as jitted matmul programs.

Replaces FAISS's C++/BLAS clustering used by autofaiss during index training
(`/root/reference/clip_retrieval/clip_index.py:24-31` delegates to
autofaiss → faiss.Clustering).  Design:

- assignment is one MXU matmul: argmax(x·cᵀ − ½‖c‖²) (valid for both L2 on
  normalized data and IP metrics);
- the centroid update is a segment-sum expressed as a **one-hot matmul**
  (assignᵀ·x) — on TPU a dense matmul beats scatter by a wide margin for
  k ≲ 2¹⁶;
- data is processed in fixed-size chunks under `lax.scan` so the transient
  (chunk × k) one-hot never exceeds ~512 MB regardless of n or k; the whole
  training (niter outer iterations × chunk scan) is ONE compiled program;
- the chunk axis can be sharded over a device mesh ("dp"): each device
  assigns its slice and XLA inserts the cross-device psum for the segment
  sums — this is the multi-chip index-train path (ICI collectives, no NCCL);
- empty clusters are re-seeded by splitting the largest cluster
  (faiss Clustering::split_clusters analogue, deterministic).

For n beyond HBM, callers subsample for training (like faiss's
max_points_per_centroid) and stream full-set assignment via assign_chunked.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import transfer


def _scores(x: jax.Array, centroids: jax.Array) -> jax.Array:
    """(n,d),(k,d) → (n,k) L2-equivalent score: x·cᵀ − ½‖c‖²."""
    return jnp.dot(
        x.astype(jnp.float32), centroids.T,
        preferred_element_type=jnp.float32,
    ) - 0.5 * jnp.sum(jnp.square(centroids), axis=1)


def _assign(x: jax.Array, centroids: jax.Array) -> jax.Array:
    return jnp.argmax(_scores(x, centroids), axis=1)


# module-level so assign_chunked's per-shard calls share one trace cache
# instead of rebuilding (and re-tracing) a fresh wrapper per call
_assign_jit = jax.jit(_assign)


def assign_chunked(
    x, centroids: jax.Array, chunk: int | None = None
) -> np.ndarray:
    """Stream host-resident data through the device assigner → (n,) int32.

    Chunk size defaults to the bounded staging size (utils.transfer):
    fp16 inputs ship as fp16 and are widened on device — half the wire
    bytes of the old convert-on-host path."""
    fn = _assign_jit
    x = np.asarray(x)
    wire = x if x.dtype in (np.float16, np.float32) else x.astype(np.float32)
    if chunk is None:
        chunk = transfer.rows_per_chunk(
            wire.dtype.itemsize * max(1, int(np.prod(x.shape[1:])))
        )
    out = np.empty((x.shape[0],), np.int32)
    for i in range(0, x.shape[0], chunk):
        out[i : i + chunk] = np.asarray(
            fn(jnp.asarray(wire[i : i + chunk]), centroids)
        )
    return out


@functools.partial(jax.jit, static_argnames=("k",))
def _kmeanspp_init(x: jax.Array, key: jax.Array, k: int) -> jax.Array:
    """k-means++ D²-sampling init as a lax.scan — one (n,d)·(d,) distance
    update per step, all on device. Random init alone merges adjacent blobs
    into one cluster far too often (classic Lloyd's local minimum)."""
    n, d = x.shape
    x2 = jnp.sum(jnp.square(x), axis=1)  # (n,)
    key, sub = jax.random.split(key)
    first = x[jax.random.randint(sub, (), 0, n)]

    def step(carry, key_i):
        centroids, min_d2, i = carry
        c = centroids[i - 1]  # most recently added
        d2 = x2 - 2.0 * jnp.dot(x, c, preferred_element_type=jnp.float32) + jnp.sum(
            jnp.square(c)
        )
        min_d2 = jnp.minimum(min_d2, jnp.maximum(d2, 0.0))
        # sample ∝ min_d2 via Gumbel-max on log-probs
        logits = jnp.log(min_d2 + 1e-20)
        idx = jnp.argmax(
            logits + jax.random.gumbel(key_i, (n,), dtype=jnp.float32)
        )
        centroids = centroids.at[i].set(x[idx])
        return (centroids, min_d2, i + 1), None

    centroids = jnp.zeros((k, d), jnp.float32).at[0].set(first)
    keys = jax.random.split(key, k - 1) if k > 1 else jnp.zeros((0, 2), jnp.uint32)
    (centroids, _, _), _ = jax.lax.scan(
        step, (centroids, jnp.full((n,), jnp.inf, jnp.float32), 1), keys
    )
    return centroids


def _chunk_rows(n: int, k: int) -> int:
    """Chunk size keeping the (chunk, k) fp32 one-hot ≤ ~512 MB."""
    budget = (512 << 20) // max(1, 4 * k)
    c = max(256, min(n, budget))
    return c


@functools.partial(jax.jit, static_argnames=("k", "niter"))
def _kmeans_jit(xc: jax.Array, init: jax.Array, k: int, niter: int):
    """xc: (C, chunk, d) chunked data (zero rows padded), weights wc: implicit
    nonzero check via norm (padding rows are exactly zero and get weight 0 if
    any real row is zero too — acceptable for unit-norm embeddings)."""
    C, chunk, d = xc.shape
    # padding mask: all-zero rows don't vote
    valid = jnp.any(xc != 0.0, axis=-1)  # (C, chunk)

    def iteration(centroids, _):
        def chunk_step(carry, inp):
            sums, counts = carry
            x, v = inp
            a = _assign(x, centroids)
            onehot = jax.nn.one_hot(a, k, dtype=jnp.float32) * v[:, None]
            sums = sums + jnp.dot(
                onehot.T, x, preferred_element_type=jnp.float32
            )
            counts = counts + jnp.sum(onehot, axis=0)
            return (sums, counts), None

        (sums, counts), _ = jax.lax.scan(
            chunk_step,
            (jnp.zeros((k, d), jnp.float32), jnp.zeros((k,), jnp.float32)),
            (xc, valid),
        )
        new = sums / jnp.maximum(counts, 1.0)[:, None]
        largest = jnp.argmax(counts)
        eps = 1e-4 * (1.0 + jnp.arange(k, dtype=jnp.float32))[:, None]
        donor = new[largest][None, :] * (1.0 + eps) + eps
        new = jnp.where((counts == 0)[:, None], donor, new)
        return new, None

    centroids, _ = jax.lax.scan(iteration, init, None, length=niter)
    return centroids


def kmeans(
    x,
    k: int,
    niter: int = 20,
    seed: int = 0,
    max_points: int = 1 << 21,
    mesh=None,
) -> jax.Array:
    """Train k centroids on (a subsample of) x; returns (k, d) f32 on device.

    With `mesh` (a 1-D "dp" jax Mesh), each Lloyd chunk is row-sharded
    across the mesh: every device assigns its slice and XLA inserts the
    psum for the segment sums over ICI — the multi-chip index-train path
    (verified numerically identical to single-device in tests).
    """
    # subsample BEFORE the fp32 conversion: asarray on a non-fp32
    # disk-backed corpus would materialize the whole thing in RAM (the
    # fancy-index subsample already copies, so convert just the sample;
    # same-dtype fp32 inputs pass through asarray as a no-copy view)
    if not hasattr(x, "shape"):  # list-of-vectors inputs stay accepted
        x = np.asarray(x)
    n = x.shape[0]
    rng = np.random.default_rng(seed)
    if n > max_points:
        x = x[np.sort(rng.choice(n, size=max_points, replace=False))]
        n = max_points
    x = np.asarray(x, np.float32)
    if n < k:
        reps = -(-k // n)
        x = np.concatenate([x] * reps)[: max(k, n)]
        n = x.shape[0]
    # k-means++ init on a bounded subsample (device scan)
    init_rows = min(n, 1 << 18)
    init_x = x if n == init_rows else x[
        rng.choice(n, size=init_rows, replace=False)
    ]
    init = _kmeanspp_init(
        transfer.device_put_chunked(init_x), jax.random.PRNGKey(seed), k
    )
    chunk = _chunk_rows(n, k)
    if mesh is not None:  # chunk rows split evenly across devices
        n_dev = mesh.devices.size
        chunk = max(n_dev, chunk - chunk % n_dev)
    C = -(-n // chunk)
    pad = C * chunk - n
    if pad:
        x = np.concatenate([x, np.zeros((pad, x.shape[1]), np.float32)])
    if mesh is None:
        # upload flat in bounded chunks, reshape on device (free view)
        xd = transfer.device_put_chunked(x).reshape(C, chunk, -1)
        return _kmeans_jit(xd, init, k, niter)

    from jax.sharding import NamedSharding, PartitionSpec as P

    axis = mesh.axis_names[0]
    data_sh = NamedSharding(mesh, P(None, axis, None))
    rep = NamedSharding(mesh, P())
    fn = jax.jit(
        functools.partial(_kmeans_jit.__wrapped__, k=k, niter=niter),
        in_shardings=(data_sh, rep),
        out_shardings=rep,
    )
    # place each device's shard straight from host: per-shard transfers are
    # already 1/n_dev of the array (bounded), and staging through the
    # default device first would commit the WHOLE set to one chip's HBM
    # plus an extra device-to-device reshard
    xd = jax.device_put(x.reshape(C, chunk, -1), data_sh)
    return fn(xd, jax.device_put(init, rep))


def kmeans_multi(
    x, k: int, niter: int = 20, seed: int = 0, dsub_slices: int | None = None
):
    """vmapped k-means over leading 'subspace' axis: x (M, n, dsub) →
    centroids (M, k, dsub).  Used for PQ codebook training (all M
    sub-quantizers train simultaneously on device)."""
    x = np.asarray(x, np.float32)
    M, n, dsub = x.shape
    rng = np.random.default_rng(seed)
    if n < k:
        reps = -(-k // n)
        x = np.concatenate([x] * reps, axis=1)
        n = x.shape[1]
    init_rows = min(n, 1 << 17)
    init_x = x if n == init_rows else x[
        :, rng.choice(n, size=init_rows, replace=False), :
    ]
    init = jax.vmap(
        functools.partial(_kmeanspp_init, k=k), in_axes=(0, 0)
    )(
        # chunking splits along axis 0; a (M, rows, dsub) array has only M
        # huge "rows", so ship 2-D and reshape on device (free view)
        transfer.device_put_chunked(init_x.reshape(-1, dsub)).reshape(
            init_x.shape
        ),
        jax.random.split(jax.random.PRNGKey(seed), M),
    )
    chunk = _chunk_rows(n, k)
    C = -(-n // chunk)
    pad = C * chunk - n
    if pad:
        x = np.concatenate(
            [x, np.zeros((M, pad, dsub), np.float32)], axis=1
        )
    xc = transfer.device_put_chunked(x.reshape(-1, dsub)).reshape(
        M, C, chunk, dsub
    )
    fn = jax.vmap(
        functools.partial(_kmeans_jit, k=k, niter=niter), in_axes=(0, 0)
    )
    return fn(xc, jnp.asarray(init))
