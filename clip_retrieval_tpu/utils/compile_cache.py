"""Persistent XLA compilation cache setup.

The JAX version in this environment ignores the ``JAX_COMPILATION_CACHE_DIR``
environment variable (``jax.config.jax_compilation_cache_dir`` stays None
even when it is exported before import), so entry points that relied on the
env var paid a cold compile on every process start — minutes per program on
TPU.  The only reliable mechanism is ``jax.config.update``; call
:func:`enable_persistent_cache` once, before the first jit, from every entry
point (cli, bench, serving boot, driver hooks).
"""

from __future__ import annotations

import os

DEFAULT_CACHE_DIR = os.path.expanduser("~/.cache/clip_retrieval_tpu/xla_cache")
_DEFAULT = DEFAULT_CACHE_DIR


def enable_persistent_cache(path: str | None = None) -> str:
    """Point jax at an on-disk compile cache (idempotent, import-safe).

    Honors ``JAX_COMPILATION_CACHE_DIR`` if set (keeping the documented
    contract of the env var even though jax itself ignores it), else uses
    ``~/.cache/clip_retrieval_tpu/xla_cache``.  Caches every program (no
    min-compile-time / min-size gate): process restarts are the dominant
    cost model here, not cache size.
    """
    import jax

    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR") or _DEFAULT
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
