"""Runner: the per-partition read → embed → write hot loop.

Same decomposition and stats contract as the reference
(`/root/reference/clip_retrieval/clip_inference/runner.py:6-64`): a modulo
Sampler fixes which input items belong to a partition (bit-exact partition
contents vs the reference), and the loop reports per-batch
read/inference/write/total durations + sample_count to the logger.

Because the mapper's device dispatch is asynchronous, `inference_duration`
here measures dispatch+host-sync like the reference's CUDA-synchronous
timing; the pipeline still overlaps host decode with device compute through
the reader's prefetch pool.
"""

from __future__ import annotations

import time
from typing import Callable


class Sampler:
    """Partition i owns every item with index ≡ i (mod partition count)."""

    def __init__(self, output_partition_id: int, output_partition_count: int):
        self.output_partition_id = output_partition_id
        self.output_partition_count = output_partition_count

    def __call__(self, items):
        return [
            e
            for i, e in enumerate(items)
            if i % self.output_partition_count == self.output_partition_id
        ]


class Runner:
    """Wires reader/mapper/writer/logger builders and runs one partition."""

    def __init__(
        self,
        reader_builder: Callable,
        mapper_builder: Callable,
        writer_builder: Callable,
        logger_builder: Callable,
        output_partition_count: int,
    ):
        self.reader_builder = reader_builder
        self.mapper_builder = mapper_builder
        self.writer_builder = writer_builder
        self.logger_builder = logger_builder
        self.output_partition_count = output_partition_count

    def __call__(self, partition_id: int):
        import os

        sampler = Sampler(partition_id, self.output_partition_count)
        reader = self.reader_builder(sampler)
        writer = self.writer_builder(partition_id)
        mapper = self.mapper_builder()
        logger = self.logger_builder(partition_id)
        logger.start()
        # optional device trace capture (SURVEY §5: the reference has no
        # flamegraph profiler; we add jax.profiler behind an env flag)
        profile_dir = os.environ.get("CRT_PROFILE_DIR")
        profiling = False
        if profile_dir and partition_id == 0:
            try:
                import jax.profiler

                jax.profiler.start_trace(profile_dir)
                profiling = True
            except Exception as e:
                print(f"profiler unavailable: {e}")
        try:
            iterator = iter(reader)
            while True:
                begin = time.time()
                t0 = time.perf_counter()
                try:
                    batch = next(iterator)
                except StopIteration:
                    break
                read_s = time.perf_counter() - t0
                t0 = time.perf_counter()
                embeddings = mapper(batch)
                infer_s = time.perf_counter() - t0
                t0 = time.perf_counter()
                writer(embeddings)
                write_s = time.perf_counter() - t0
                end = time.time()
                logger(
                    {
                        "start_time": begin,
                        "end_time": end,
                        "read_duration": read_s,
                        "inference_duration": infer_s,
                        "write_duration": write_s,
                        "total_duration": end - begin,
                        "sample_count": batch.get(
                            "_staged_n",  # device-staged batches are padded
                            batch["image_tensor"].shape[0]
                            if "image_tensor" in batch
                            else batch["text_tokens"].shape[0],
                        ),
                    }
                )
        finally:
            if profiling:
                try:
                    import jax.profiler

                    jax.profiler.stop_trace()
                except Exception:
                    pass
            logger.end()
        writer.flush()
