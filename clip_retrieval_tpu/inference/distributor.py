"""Distributors: schedule partition tasks over workers.

Reference counterparts: `/root/reference/clip_retrieval/clip_inference/
distributor.py` (sequential + pyspark) and `slurm_distributor.py`.  Strategies:

- SequentialDistributor — all tasks in-process (this host's TPU cores).
- PodDistributor — multi-host TPU pod: every host runs the same program,
  `jax.process_index()` picks this host's contiguous task block (same rank
  math as the reference's SLURM worker, `slurm_worker.py:16-37`);
  coordination is jax.distributed over DCN at init only — at runtime workers
  coordinate purely through the filesystem, like the reference.
- PysparkDistributor — parity shim when pyspark is installed: one Spark task
  per partition (useful for CPU fleets / non-TPU smoke runs).
- SlurmDistributor — in slurm.py: sbatch generation + squeue polling.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

from ..parallel.dist import get_task_list, init_pod
from .worker import worker


class SequentialDistributor:
    def __init__(self, tasks: Sequence[int], worker_args: dict[str, Any]):
        self.tasks = list(tasks)
        self.worker_args = worker_args

    def __call__(self):
        worker(tasks=self.tasks, **self.worker_args)


class PodDistributor:
    """Each TPU host takes a contiguous block of partitions."""

    def __init__(self, tasks: Sequence[int], worker_args: dict[str, Any]):
        self.tasks = list(tasks)
        self.worker_args = worker_args

    def __call__(self):
        rank, world = init_pod()
        mine = get_task_list(len(self.tasks), world, rank)
        worker(tasks=[self.tasks[i] for i in mine], **self.worker_args)


class PysparkDistributor:
    """One Spark task per output partition (reference `distributor.py:23-59`)."""

    def __init__(self, tasks: Sequence[int], worker_args: dict[str, Any]):
        self.tasks = list(tasks)
        self.worker_args = worker_args

    def __call__(self):
        from pyspark.sql import SparkSession  # pylint: disable=import-error

        spark = SparkSession.getActiveSession()
        if spark is None:
            print("No spark session found; creating a local one")
            spark = (
                SparkSession.builder.config("spark.driver.memory", "16G")
                .master("local[1]")
                .appName("clip-retrieval-tpu")
                .getOrCreate()
            )
        worker_args = self.worker_args
        rdd = spark.sparkContext.parallelize(
            self.tasks, numSlices=len(self.tasks)
        )

        def run(partition_id: int):
            worker(tasks=[partition_id], **worker_args)

        rdd.foreach(run)


def make_distributor(
    strategy: str, tasks: Sequence[int], worker_args: dict[str, Any]
) -> Callable[[], None]:
    if strategy == "sequential":
        return SequentialDistributor(tasks, worker_args)
    if strategy == "pod":
        return PodDistributor(tasks, worker_args)
    if strategy == "pyspark":
        return PysparkDistributor(tasks, worker_args)
    if strategy == "slurm":
        from .slurm import SlurmDistributor

        return SlurmDistributor(tasks, worker_args)
    raise ValueError(f"unknown distribution strategy {strategy!r}")
