"""Cyclic-GC control for Arrow/pandas batch kernels (guide §4.2/§4.5:
make the per-task Python work fast — here by removing interpreter
overhead that scales with allocation count).

The decode/generation kernels allocate millions of short-lived CPython
containers per task (token tuples, per-doc lists, Arrow builders).
Every container allocation ticks the cyclic-GC heuristic, so a gen-0
collection fires every ~700 net allocations, and each collection walks
the worker's tracked heap.  With 32 concurrent workers the collections
thrash shared caches exactly when the kernel is hottest.  None of these
kernels can create reference cycles — they build trees of fresh
tuples/lists/strings that die by refcount — so the cyclic collector is
pure overhead on this path.

Measured on this VM (multiprocessing control over the 40k-doc extraction
kernel, identical code ± gc.disable):

    8 procs:  11.5k → 49.5k docs/s
    32 procs: 35.4k → 99.9k docs/s

``nogc_batches`` wraps a batch-iterator kernel (``mapInArrow`` /
``mapInPandas`` shape): cyclic GC is disabled for the duration of the
task and restored in ``finally`` — Python workers are reused across
tasks (``spark.python.worker.reuse`` default), so the flag must never
leak into other UDFs' tasks.  Reference-counted reclamation is
unaffected; any cycles created by library code during the task are
collected at the next threshold crossing after re-enable.
"""

from __future__ import annotations

import functools
import gc


def nogc_batches(gen_fn):
    """Decorator for iterator-of-batches kernels: run with cyclic GC off."""

    @functools.wraps(gen_fn)
    def wrapped(*args, **kwargs):
        was_enabled = gc.isenabled()
        gc.disable()
        try:
            yield from gen_fn(*args, **kwargs)
        finally:
            if was_enabled:
                gc.enable()

    return wrapped
