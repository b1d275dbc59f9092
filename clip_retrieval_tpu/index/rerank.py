"""Exact re-ranking over stored fp16 rows (faiss IndexRefineFlat analogue).

Shared by the IVF-PQ and IVF-int8 tiers: the approximate scan selects
rerank_factor·k candidates, the true vectors re-score them — lifting recall
to near-exact while reading only rerank_factor·k (mmap'd) rows per query.
Reference counterpart: autofaiss refine option over the indices built in
`/root/reference/clip_retrieval/clip_index.py:24-31`.
"""

from __future__ import annotations

import numpy as np


def exact_rerank(
    refine_vectors,  # (ntotal, d) fp16, indexed by original id (may be mmap)
    queries: np.ndarray,
    ids: np.ndarray,  # (B, k') candidate ids, −1 = empty slot
    k: int,
):
    """Re-score candidate ids against the exact stored rows; returns the
    top-k (vals, ids) per query in exact-score order."""
    q = np.asarray(queries, np.float32)
    out_vals = np.full((q.shape[0], k), -np.inf, np.float32)
    out_ids = np.full((q.shape[0], k), -1, np.int64)
    for b in range(q.shape[0]):
        cand = ids[b][ids[b] >= 0]
        if cand.size == 0:
            continue
        vecs = np.asarray(refine_vectors[cand], np.float32)
        sc = vecs @ q[b]
        kk = min(k, sc.size)
        top = np.argpartition(-sc, kk - 1)[:kk]
        order = top[np.argsort(-sc[top])]
        out_vals[b, :kk] = sc[order]
        out_ids[b, :kk] = cand[order]
    return out_vals, out_ids
