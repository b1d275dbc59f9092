"""Native (C++) runtime pieces, compiled on demand and cached.

The reference's FLOP-heavy host code all lives in imported C++ (FAISS,
Arrow, libjpeg).  Here the TPU owns the compute path; the host-side pieces
that still need native speed (the mmap'd IVF-PQ ADC scan) are first-party
C++ compiled once per machine with the system toolchain into
`~/.cache/clip_retrieval_tpu/native/` and loaded via ctypes.  Everything
degrades to numpy when no compiler is available.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Optional

_LOCK = threading.Lock()
_LIB: dict[str, Optional[ctypes.CDLL]] = {}


def _cache_dir() -> str:
    d = os.path.expanduser("~/.cache/clip_retrieval_tpu/native")
    os.makedirs(d, exist_ok=True)
    return d


def _cpu_tag() -> bytes:
    """Host ISA discriminator: -march=native output is CPU-specific, and
    the cache dir may live on an NFS-shared home across heterogeneous
    cluster nodes (an AVX-512 build SIGILLs on an AVX2 node)."""
    try:
        with open("/proc/cpuinfo", "rb") as f:
            for line in f:
                if line.startswith(b"flags"):
                    return hashlib.sha256(line).digest()[:8]
    except OSError:
        pass
    import platform

    return platform.machine().encode()


def _build(src_path: str, extra_flags: list[str]) -> Optional[ctypes.CDLL]:
    with open(src_path, "rb") as f:
        src = f.read()
    cmd_head = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
        "-march=native", "-fopenmp", src_path, *extra_flags,
    ]
    tag = hashlib.sha256(
        src + b"\0".join(f.encode() for f in cmd_head) + _cpu_tag()
    ).hexdigest()[:16]
    so_path = os.path.join(
        _cache_dir(), f"{os.path.basename(src_path)}.{tag}.so"
    )
    if not os.path.exists(so_path):
        # per-process tmp name: concurrent ranks on a fresh node must not
        # write the same file while another's os.replace publishes it
        tmp = f"{so_path}.{os.getpid()}.tmp"
        cmd = [*cmd_head, "-o", tmp]
        try:
            subprocess.run(
                cmd, check=True, capture_output=True, timeout=120
            )
            os.replace(tmp, so_path)
        except (subprocess.SubprocessError, FileNotFoundError, OSError) as e:
            print(f"native build failed ({e}); using numpy fallback")
            return None
        finally:
            if os.path.exists(tmp):
                os.remove(tmp)
    try:
        return ctypes.CDLL(so_path)
    except OSError as e:
        print(f"native load failed ({e}); using numpy fallback")
        return None


def get_decode_lib() -> Optional[ctypes.CDLL]:
    """Compiled image decode/resize library, or None (PIL fallback).

    Replaces the reference's PIL/torchvision per-item preprocessing
    (`/root/reference/clip_retrieval/clip_inference/reader.py:101,163`) —
    the documented pipeline bottleneck
    (`/root/reference/docs/distributed_clip_inference.md:203`)."""
    with _LOCK:
        if "decode" not in _LIB:
            if os.environ.get("CRT_DISABLE_NATIVE_DECODE") == "1":
                _LIB["decode"] = None
                return None
            src = os.path.join(os.path.dirname(__file__), "image_decode.cpp")
            lib = _build(src, ["-ljpeg", "-lpng", "-lwebp"])
            if lib is not None:
                import numpy as np
                from numpy.ctypeslib import ndpointer

                lib.crt_decode_resize_crop.restype = ctypes.c_int32
                lib.crt_decode_resize_crop.argtypes = [
                    ctypes.c_char_p,
                    ctypes.c_int64,
                    ctypes.c_int32,
                    ctypes.c_int32,
                    ndpointer(np.uint8, flags="C"),
                ]
                lib.crt_decode_batch.restype = None
                lib.crt_decode_batch.argtypes = [
                    ndpointer(np.uint8, flags="C"),
                    ndpointer(np.int64, flags="C"),
                    ctypes.c_int32,
                    ctypes.c_int32,
                    ctypes.c_int32,
                    ndpointer(np.uint8, flags="C"),
                    ndpointer(np.int32, flags="C"),
                ]
            _LIB["decode"] = lib
        return _LIB["decode"]


def get_adc_lib() -> Optional[ctypes.CDLL]:
    """Compiled ADC scan library, or None (numpy fallback)."""
    with _LOCK:
        if "adc" not in _LIB:
            src = os.path.join(os.path.dirname(__file__), "adc_scan.cpp")
            lib = _build(src, [])
            if lib is not None:
                import numpy as np
                from numpy.ctypeslib import ndpointer

                lib.adc_scan_block.restype = None
                lib.adc_scan_block.argtypes = [
                    ndpointer(np.uint8, flags="C"),
                    ctypes.c_int64,
                    ctypes.c_int32,
                    ndpointer(np.float32, flags="C"),
                    ctypes.c_float,
                    ndpointer(np.float32, flags="C"),
                ]
                lib.adc_scan_lists.restype = ctypes.c_int64
                lib.adc_scan_lists.argtypes = [
                    ndpointer(np.uint8, flags="C"),
                    ndpointer(np.int64, flags="C"),
                    ndpointer(np.int64, flags="C"),
                    ndpointer(np.int32, flags="C"),
                    ctypes.c_int32,
                    ndpointer(np.float32, flags="C"),
                    ctypes.c_int32,
                    ndpointer(np.float32, flags="C"),
                    ndpointer(np.float32, flags="C"),
                    ndpointer(np.int64, flags="C"),
                ]
                lib.adc_search_batch.restype = None
                lib.adc_search_batch.argtypes = [
                    ndpointer(np.uint8, flags="C"),
                    ndpointer(np.int64, flags="C"),
                    ndpointer(np.int64, flags="C"),
                    ndpointer(np.int32, flags="C"),
                    ctypes.c_int32,
                    ndpointer(np.float32, flags="C"),
                    ctypes.c_int32,
                    ndpointer(np.float32, flags="C"),
                    ctypes.c_int32,
                    ctypes.c_int32,
                    ndpointer(np.float32, flags="C"),
                    ndpointer(np.int64, flags="C"),
                ]
            _LIB["adc"] = lib
        return _LIB["adc"]
