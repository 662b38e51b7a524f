"""Asynchronous host I/O: background forcing prefetch + non-blocking
output writers (SURVEY §7(f): the forcing machinery must run on the host
without stalling the device loop).

The reference overlaps nothing — every rank blocks on NetCDF reads in
set_forces and on writes in wrt_his (reference: roms_read_write.F:303-652,
basic_output.F) — but its per-rank files are small.  Here a single host
feeds one fast chip, so host I/O must hide behind device compute:

  * `Series` (roms_tpu.forcing) schedules the NEXT forcing record onto
    the shared reader thread as soon as the current bracket is known, so
    crossing a record boundary finds the data already resident;
  * `make_async_hook` runs output hooks (device→host pulls + NetCDF
    writes) on a single ordered worker with bounded in-flight jobs, so
    the step loop only enqueues.

All background NetCDF reads serialize on `IO_LOCK` (the classic/HDF5
readers share seekable file objects); writers get their ordering from the
single-worker sink.
"""

from __future__ import annotations

import threading
from concurrent.futures import Future, ThreadPoolExecutor
from typing import Callable, List

# one lock for every background *read* — the netcdf readers hand out lazy
# variables over shared seekable file objects, so concurrent reads of two
# variables of one dataset would race on the file position
IO_LOCK = threading.Lock()

_READ_POOL: ThreadPoolExecutor | None = None


def read_pool() -> ThreadPoolExecutor:
    global _READ_POOL
    if _READ_POOL is None:
        _READ_POOL = ThreadPoolExecutor(max_workers=2,
                                        thread_name_prefix="roms-io-read")
    return _READ_POOL


class AsyncSink:
    """Ordered background executor with bounded in-flight jobs.

    Jobs run on ONE worker thread in submission order (NetCDF record
    writes must land in order); `submit` blocks only when `max_pending`
    jobs are already queued (each pending output job pins a state pytree
    — the bound caps device/host memory growth).  Exceptions re-raise on
    the next submit/drain, never silently."""

    def __init__(self, max_pending: int = 2):
        self.max_pending = max_pending
        self._pool = ThreadPoolExecutor(max_workers=1,
                                        thread_name_prefix="roms-io-write")
        self._futs: List[Future] = []

    def submit(self, fn: Callable, *args, **kwargs):
        while len(self._futs) >= self.max_pending:
            self._futs.pop(0).result()
        self._futs.append(self._pool.submit(fn, *args, **kwargs))

    def drain(self):
        """Wait for every queued job; re-raise the first failure."""
        while self._futs:
            self._futs.pop(0).result()


def make_async_hook(hook: Callable, max_pending: int = 2) -> Callable:
    """Wrap a step hook `f(state, i)` so it runs on a background worker.

    The returned hook enqueues and returns immediately (the device→host
    transfer happens on the worker — JAX device buffers are immutable, so
    reading them from another thread is safe).  The driver calls
    `.drain()` after the loop so every record is on disk before `run`
    returns."""
    sink = AsyncSink(max_pending)

    def wrapped(state, i):
        sink.submit(hook, state, i)

    wrapped.drain = sink.drain
    wrapped.sink = sink
    return wrapped
