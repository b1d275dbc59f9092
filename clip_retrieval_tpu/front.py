"""clip-front: static web UI server + /config.json.

Reference counterpart: `/root/reference/clip_retrieval/clip_front.py` (Flask
static file server on port 1235).  The SPA itself lives in `front/` at the
repo root (a dependency-free lit-style page talking to the same REST API).
"""

from __future__ import annotations

import json
import mimetypes
import os
from pathlib import Path

_FRONT_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "front")


def _front_dir() -> str:
    env = os.environ.get("CRT_FRONT_DIR")
    if env and os.path.isdir(env):
        return env
    return _FRONT_DIR


def add_static_routes(router, default_backend, default_index, url_column):
    """Register /, /index.html, asset files and /config.json on a WsgiRouter."""

    config = {
        "defaultBackend": default_backend,
        "defaultIndex": default_index,
        "urlColumn": url_column or "url",
    }
    router.route("GET", "/config.json", lambda: config)

    front = Path(_front_dir())
    if not front.is_dir():
        return

    def file_handler(path: Path):
        ctype = mimetypes.guess_type(str(path))[0] or "application/octet-stream"

        def handler():
            return path.read_bytes(), ctype

        return handler

    for p in front.rglob("*"):
        if p.is_file():
            rel = "/" + p.relative_to(front).as_posix()
            if rel == "/config.json":
                # the dynamic /config.json carries the configured backend /
                # index; a stale file shipped in the front build must not
                # shadow it
                continue
            router.route("GET", rel, file_handler(p))
            if rel == "/index.html":
                router.route("GET", "/", file_handler(p))


def clip_front(
    default_backend: str | None = None,
    default_index: str | None = None,
    url_column: str = "url",
    port: int = 1235,
):
    """Serve the static front end standalone."""
    from .back.app import WsgiRouter, serve

    router = WsgiRouter()
    add_static_routes(router, default_backend, default_index, url_column)
    serve(router, port)
