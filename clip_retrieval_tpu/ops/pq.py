"""Product quantization (+ OPQ rotation) on TPU.

Replaces FAISS's PQ/OPQ training+encoding used via autofaiss
(`/root/reference/clip_retrieval/clip_index.py:24-31`; index keys like
"OPQ256_768,IVF131072_HNSW32,PQ256x8" per the reference's laion5B docs).

- codebook training: all M sub-quantizers train simultaneously on device
  (`kmeans_multi` — a vmapped chunked-Lloyd's program);
- encode: per-subspace argmax over one MXU matmul per subspace → uint8;
- ADC: query → (M, 256) look-up table via one batched matmul; candidate
  scoring gathers LUT entries (the hot serving path is the streaming CSR
  scan in index/ivfpq.py `_scan_device`);
- OPQ: alternating minimization — fix rotation, train PQ; fix PQ, solve the
  orthogonal Procrustes problem via SVD on device.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from .kmeans import kmeans_multi


@dataclasses.dataclass
class PQCodebooks:
    codebooks: jax.Array  # (M, ksub, dsub) f32
    rotation: jax.Array | None = None  # (d, d) f32, x @ rotation = rotated

    @property
    def m(self) -> int:
        return self.codebooks.shape[0]

    @property
    def ksub(self) -> int:
        return self.codebooks.shape[1]

    @property
    def dsub(self) -> int:
        return self.codebooks.shape[2]

    @property
    def d(self) -> int:
        return self.m * self.dsub


def _split(x: jax.Array, m: int) -> jax.Array:
    """(n, d) → (m, n, dsub)."""
    n, d = x.shape
    return x.reshape(n, m, d // m).transpose(1, 0, 2)


@functools.partial(jax.jit, static_argnames=())
def _encode_jit(xs: jax.Array, codebooks: jax.Array) -> jax.Array:
    """xs: (M, n, dsub), codebooks (M, ksub, dsub) → (n, M) uint8 codes."""
    scores = jnp.einsum(
        "mnd,mkd->mnk", xs, codebooks, preferred_element_type=jnp.float32
    ) - 0.5 * jnp.sum(jnp.square(codebooks), axis=-1)[:, None, :]
    return jnp.argmax(scores, axis=-1).T.astype(jnp.uint8)


def pq_encode(
    x, pq: PQCodebooks, chunk: int = 1 << 17
) -> np.ndarray:
    """Encode host-resident vectors in streaming chunks → (n, M) uint8."""
    x = np.asarray(x, np.float32)
    out = np.empty((x.shape[0], pq.m), np.uint8)
    rot = pq.rotation
    for i in range(0, x.shape[0], chunk):
        xc = jnp.asarray(x[i : i + chunk])
        if rot is not None:
            xc = jnp.dot(xc, rot, preferred_element_type=jnp.float32)
        out[i : i + chunk] = np.asarray(_encode_jit(_split(xc, pq.m), pq.codebooks))
    return out


@jax.jit
def pq_decode(codes: jax.Array, codebooks: jax.Array) -> jax.Array:
    """(n, M) uint8 + (M, ksub, dsub) → (n, M*dsub) f32 (rotated space)."""
    n, m = codes.shape
    # gather per subspace: (M, n, dsub)
    gathered = jnp.take_along_axis(
        codebooks, codes.T[:, :, None].astype(jnp.int32), axis=1
    )
    return gathered.transpose(1, 0, 2).reshape(n, -1)


def pq_reconstruct(codes, pq: PQCodebooks) -> jax.Array:
    """Decode and un-rotate back to the original space."""
    x = pq_decode(jnp.asarray(codes), pq.codebooks)
    if pq.rotation is not None:
        x = jnp.dot(x, pq.rotation.T, preferred_element_type=jnp.float32)
    return x


@jax.jit
def adc_lut(queries: jax.Array, codebooks: jax.Array) -> jax.Array:
    """Inner-product ADC tables: (B, d) × (M, ksub, dsub) → (B, M, ksub)."""
    b = queries.shape[0]
    m, ksub, dsub = codebooks.shape
    qs = queries.reshape(b, m, dsub)
    return jnp.einsum(
        "bmd,mkd->bmk", qs, codebooks, preferred_element_type=jnp.float32
    )


@jax.jit
def adc_score(lut: jax.Array, codes: jax.Array) -> jax.Array:
    """(B, M, ksub) LUT × (n, M) codes → (B, n) approximate inner products.

    XLA path: per-subspace take_along_axis gather, summed. The serving path
    uses the windowed streaming variant in index/ivfpq.py `_scan_device`.
    """
    codes_t = codes.T.astype(jnp.int32)  # (M, n)
    lut_t = lut.transpose(1, 0, 2)  # (M, B, ksub)
    # (M, B, n) gather then sum over M
    gathered = jnp.take_along_axis(
        lut_t, codes_t[:, None, :], axis=2
    )
    return jnp.sum(gathered, axis=0)


def train_pq(
    x,
    m: int,
    ksub: int = 256,
    niter: int = 20,
    seed: int = 0,
    max_points: int = 1 << 19,
) -> PQCodebooks:
    """Train plain PQ codebooks on (a subsample of) x (n, d)."""
    x = np.asarray(x, np.float32)
    n, d = x.shape
    if d % m:
        raise ValueError(f"d={d} not divisible by m={m}")
    rng = np.random.default_rng(seed)
    if n > max_points:
        x = x[rng.choice(n, size=max_points, replace=False)]
    xs = np.ascontiguousarray(
        x.reshape(x.shape[0], m, d // m).transpose(1, 0, 2)
    )
    codebooks = kmeans_multi(xs, ksub, niter=niter, seed=seed)
    return PQCodebooks(codebooks=codebooks, rotation=None)


def train_opq(
    x,
    m: int,
    ksub: int = 256,
    opq_iters: int = 8,
    pq_niter: int = 8,
    seed: int = 0,
    max_points: int = 1 << 18,
) -> PQCodebooks:
    """OPQ: learn an orthogonal rotation R minimizing ‖xR − decode(encode(xR))‖.

    Alternating: (1) train/refine PQ on rotated data, (2) solve Procrustes
    R = UVᵀ from SVD(xᵀ·x̂) on device. Returns codebooks + rotation.
    """
    x = np.asarray(x, np.float32)
    n, d = x.shape
    rng = np.random.default_rng(seed)
    if n > max_points:
        x = x[rng.choice(n, size=max_points, replace=False)]
        n = x.shape[0]
    xd = jnp.asarray(x)
    rotation = jnp.eye(d, dtype=jnp.float32)
    for it in range(max(opq_iters, 0)):
        xr = jnp.dot(xd, rotation, preferred_element_type=jnp.float32)
        pq_it = train_pq(
            np.asarray(xr), m, ksub, niter=pq_niter, seed=seed + it
        )
        codes = _encode_jit(_split(xr, m), pq_it.codebooks)
        xhat = pq_decode(codes, pq_it.codebooks)  # (n, d) in rotated space
        # Procrustes: min_R ‖xR − x̂‖_F with RᵀR=I → R = U Vᵀ, USV = svd(xᵀx̂)
        cov = jnp.dot(xd.T, xhat, preferred_element_type=jnp.float32)
        u, _, vt = jnp.linalg.svd(cov, full_matrices=False)
        rotation = jnp.dot(u, vt, preferred_element_type=jnp.float32)
    # final codebooks must be fitted under the FINAL rotation — the loop's
    # last pq was trained under the previous one (a half-iteration mismatch
    # that silently degrades quantization error); also covers opq_iters=0
    # (identity rotation, plain PQ)
    xr = jnp.dot(xd, rotation, preferred_element_type=jnp.float32)
    pq = train_pq(
        np.asarray(xr), m, ksub, niter=pq_niter, seed=seed + opq_iters
    )
    return PQCodebooks(codebooks=pq.codebooks, rotation=rotation)
