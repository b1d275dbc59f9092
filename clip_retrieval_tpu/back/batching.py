"""Server-side micro-batching: aggregate concurrent requests into one
device batch.

The device encodes a 64-query batch in roughly the time of a 1-query batch
(MXU utilization), so under concurrent load the encode step should batch.
Request threads submit payloads; a collector thread drains the queue for up
to `max_wait_ms` (or `max_batch` items) and runs them as one call.  With a
single in-flight request the added latency is bounded by max_wait_ms.

(The reference serves with Flask threads and encodes per request,
`clip_back.py:207-255`; ~20 QPS on CPU.  Micro-batching is what converts
the TPU's batched-encode rate into HTTP QPS.)
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, List, Sequence


class _Item:
    __slots__ = ("payload", "event", "result", "error")

    def __init__(self, payload):
        self.payload = payload
        self.event = threading.Event()
        self.result = None
        self.error: BaseException | None = None


class MicroBatcher:
    """Blocking submit() → batched fn([payloads]) → per-item results."""

    def __init__(
        self,
        fn_batch: Callable[[Sequence[Any]], List[Any]],
        max_batch: int = 64,
        max_wait_ms: float = 3.0,
        name: str = "microbatch",
    ):
        self.fn_batch = fn_batch
        self.max_batch = max_batch
        self.name = name
        self.max_wait = max_wait_ms / 1000.0
        self.queue: queue.Queue[_Item] = queue.Queue()
        self._thread = threading.Thread(
            target=self._loop, daemon=True, name=name
        )
        self._thread.start()

    def submit(self, payload) -> Any:
        item = _Item(payload)
        self.queue.put(item)
        item.event.wait()
        if item.error is not None:
            raise item.error
        return item.result

    def _loop(self):
        import time

        while True:
            items = [self.queue.get()]
            deadline = time.monotonic() + self.max_wait
            while len(items) < self.max_batch:
                timeout = deadline - time.monotonic()
                if timeout <= 0:
                    break
                try:
                    items.append(self.queue.get(timeout=timeout))
                except queue.Empty:
                    break
            try:
                results = self.fn_batch([it.payload for it in items])
                if len(results) != len(items):
                    # a short/long result list would otherwise leave the
                    # surplus waiters resolving to a silent None
                    raise RuntimeError(
                        f"{self.name}: batch fn returned {len(results)} "
                        f"results for {len(items)} payloads"
                    )
                for it, res in zip(items, results):
                    it.result = res
            except BaseException as e:  # propagate per item
                for it in items:
                    it.error = e
            for it in items:
                it.event.set()
