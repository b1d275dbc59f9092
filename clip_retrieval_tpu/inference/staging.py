"""Device staging: overlap host→HBM transfers with device compute.

The naive loop serializes [decode] → [transfer] → [compute] → [readback];
through a PCIe (or tunneled) link the transfer of a 256×224² uint8 batch
costs tens of ms that the TPU spends idle.  DeviceStagingReader wraps any
reader: a background thread pads each batch to the mapper's fixed shape and
`jax.device_put`s it one batch ahead, so batch N+1 is in flight to HBM while
batch N computes.  The mapper then dispatches compute on already-resident
arrays.

(The reference gets an analogous overlap from torch DataLoader's
pin_memory + CUDA async copies, `reader.py:200-203`.)
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Iterator

import numpy as np

STAGED_KEY = "_staged_n"


class DeviceStagingReader:
    """Iterates reader batches with image/text tensors staged on device."""

    def __init__(self, reader, mapper, depth: int = 2):
        self.reader = reader
        self.mapper = mapper
        self.depth = depth

    def _stage(self, batch: dict[str, Any]) -> dict[str, Any]:
        import jax

        sharding = getattr(self.mapper, "dp_sharding", None)
        out = dict(batch)
        n = None
        if "image_tensor" in batch:
            arr, n = self.mapper.pad_batch(batch["image_tensor"])
            out["image_tensor"] = jax.device_put(arr, sharding)
        if "text_tokens" in batch:
            arr, n = self.mapper.pad_batch(
                batch["text_tokens"].astype(np.int32)
            )
            out["text_tokens"] = jax.device_put(arr, sharding)
        out[STAGED_KEY] = n
        return out

    def __iter__(self) -> Iterator[dict[str, Any]]:
        q: queue.Queue = queue.Queue(maxsize=self.depth)
        sentinel = object()
        error: list[BaseException] = []
        stop = threading.Event()

        def producer():
            try:
                for batch in self.reader:
                    if stop.is_set():
                        # consumer aborted: stop decoding/staging the rest
                        # of the dataset — teardown must be O(depth), not
                        # O(remaining corpus)
                        return
                    q.put(self._stage(batch))
            except BaseException as e:  # propagate to consumer
                error.append(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    if error:
                        raise error[0]
                    return
                yield item
        finally:
            # never leave a stray device_put running past the iteration —
            # concurrent transfers from dead readers can race later programs
            stop.set()
            while t.is_alive():
                try:
                    q.get_nowait()
                except queue.Empty:
                    pass
                t.join(timeout=0.1)
