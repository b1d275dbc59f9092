"""Index loading/dispatch (reference `clip_back.py:589-596` load_index)."""

from __future__ import annotations

import json
import os

from .flat import FlatIndex
from .ivfpq import IVFPQIndex


def load_index(path: str, enable_mmap: bool = True):
    """Load an index directory; dispatches on header type."""
    header_path = os.path.join(path, "header.json")
    if not os.path.exists(header_path):
        raise FileNotFoundError(f"no index header at {header_path}")
    with open(header_path) as f:
        kind = json.load(f)["type"]
    if kind == "flat":
        return FlatIndex.load(path, mmap=enable_mmap)
    if kind == "flat_int8":
        from .sharded_flat import ShardedFlatIndex

        return ShardedFlatIndex.load(path, mmap=enable_mmap)
    if kind == "ivf_int8":
        from .ivf_int8 import IVFInt8Index

        return IVFInt8Index.load(path, mmap=enable_mmap)
    if kind == "ivfpq":
        return IVFPQIndex.load(path, mmap=enable_mmap)
    raise ValueError(f"unknown index type {kind!r}")
