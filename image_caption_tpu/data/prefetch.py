"""Host input prefetching: overlap batch assembly/device transfer with
the running step.

The reference's only host parallelism is torch DataLoader workers
(``/root/reference/features.py:94-97``).  Here a single background thread
keeps a small queue of ready (already ``device_put``) batches ahead of the
training loop — enough for this workload, whose batches are cheap numpy
gathers from an in-memory array.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Optional

_END = object()


class Prefetcher:
    """Wrap a batch iterable; optionally map each batch (e.g. device_put)
    on the producer thread."""

    def __init__(self, iterable: Iterable, *, depth: int = 2,
                 transform: Optional[Callable] = None):
        self._iterable = iterable
        self._depth = depth
        self._transform = transform

    def __iter__(self) -> Iterator:
        q: queue.Queue = queue.Queue(maxsize=self._depth)
        err = []

        def produce():
            try:
                for item in self._iterable:
                    if self._transform is not None:
                        item = self._transform(item)
                    q.put(item)
            except BaseException as e:     # surface on the consumer side
                err.append(e)
            finally:
                q.put(_END)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is _END:
                if err:
                    raise err[0]
                return
            yield item
