"""Shared utilities: brace expansion, fsspec helpers."""

from .braces import braceexpand  # noqa: F401
