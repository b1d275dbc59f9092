"""Index loading/dispatch (reference `clip_back.py:589-596` load_index)."""

from __future__ import annotations

import json
import logging
import os

from .flat import FlatIndex
from .ivfpq import IVFPQIndex

LOGGER = logging.getLogger("clip_back")


def load_index(
    path: str, enable_mmap: bool = True, sharded: bool | None = None
):
    """Load an index directory; dispatches on header type.

    `sharded=True` (or CRT_SHARDED_IVF=1) executes an ivf_int8 index on the
    list-sharded multi-chip tier (`sharded_ivf.py`) instead of single-chip;
    the on-disk format is identical.  flat_int8 is always mesh-sharded.
    """
    header_path = os.path.join(path, "header.json")
    if not os.path.exists(header_path):
        raise FileNotFoundError(f"no index header at {header_path}")
    with open(header_path) as f:
        header = json.load(f)
    kind = header["type"]
    cal = header.get("calibration")
    if cal and cal.get("target_missed"):
        # the build's nprobe calibration shipped below its recall contract
        # (build.py stamps the outcome into the header) — surface it where
        # the operator will see it: at serving/CLI load time
        LOGGER.warning(
            "index %s MISSED its recall target at build time: recall@%s = "
            "%.3f < %.2f at nprobe=%s (calibration capped at max_nprobe) — "
            "rebuild with more nlist, a higher max_nprobe, or the refine "
            "tier, or serve with an explicit larger nprobe",
            path,
            cal.get("recall_k"),
            cal.get("recall_achieved", float("nan")),
            cal.get("target_recall", float("nan")),
            cal.get("nprobe"),
        )
    if sharded is None:
        sharded = os.environ.get("CRT_SHARDED_IVF") == "1"
    if kind == "flat":
        return FlatIndex.load(path, mmap=enable_mmap)
    if kind == "flat_int8":
        from .sharded_flat import ShardedFlatIndex

        return ShardedFlatIndex.load(path, mmap=enable_mmap)
    if kind == "ivf_int8":
        if sharded:
            from .sharded_ivf import ShardedIVFInt8Index

            return ShardedIVFInt8Index.load(path, mmap=enable_mmap)
        from .ivf_int8 import IVFInt8Index

        return IVFInt8Index.load(path, mmap=enable_mmap)
    if kind == "ivfpq":
        return IVFPQIndex.load(path, mmap=enable_mmap)
    raise ValueError(f"unknown index type {kind!r}")
