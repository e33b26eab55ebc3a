"""Asynchronous export pipeline.

The reference writes each VTK snapshot synchronously inside the time loop
(cavity-01.cpp:397-400) — at benchmark grid sizes a snapshot is tens of MB
of ASCII and would stall the device between steps. This wrapper runs any
exporter on a worker thread behind a bounded queue: the time loop only pays
for the device->host copy of the needed fields (done at enqueue time so the
state can keep advancing), while formatting (native C++ snprintf path
releases the GIL) and disk writes overlap subsequent compute.
"""

from __future__ import annotations

import queue
import threading

import numpy as np


class AsyncExporter:
    """Wraps an exporter callable (state, step, time) -> None.

    ``depth`` bounds the queue: if the writer falls more than ``depth``
    snapshots behind, the enqueue blocks (backpressure) rather than letting
    host memory grow without bound.
    """

    def __init__(self, inner, depth: int = 2):
        self.inner = inner
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._err = None
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def _run(self):
        while True:
            item = self._q.get()
            if item is None:
                return
            state, step, t = item
            try:
                self.inner(state, step, t)
            except Exception as e:  # surfaced on the next enqueue/close
                self._err = e

    def __call__(self, state, step: int, time_value: float):
        if self._err is not None:
            raise self._err
        # Materialize device arrays to host now (np.asarray forces the
        # device->host copy, not just completion): the snapshot is frozen
        # regardless of how far the loop advances, and the transfer stays off
        # the worker thread (which may be busy formatting the previous frame).
        host = state._replace(
            **{f: None if leaf is None else np.asarray(leaf)
               for f, leaf in state._asdict().items()})
        self._q.put((host, step, time_value))

    def write_collection(self):
        self.close()
        if hasattr(self.inner, "write_collection"):
            self.inner.write_collection()

    def close(self):
        if self._worker.is_alive():
            self._q.put(None)
            self._worker.join()
        if self._err is not None:
            raise self._err
