"""Meshes, shardings, and multi-host task distribution math."""

from .mesh import local_mesh, shard_leading, replicate  # noqa: F401
from .dist import get_task_list  # noqa: F401
