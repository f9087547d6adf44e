"""Host-side map parallelism: threads or processes.

The reference parallelizes per-sequence evaluation and per-frame
visualization rendering with ``multiprocessing.Pool``
(ref plugins/eval/PoseTrack21/.../eval.py:3,21,
visualization_engine.py:121-129). Threads were this repo's default —
fine for cv2/IO which release the GIL, but per-sequence HOTA is
numpy/LSA Python-loop heavy, so many-core hosts need real processes.
This helper gives both behind one call; ``backend`` is config-selected
(thread default, matching r3 behavior).

Process workers must be module-level callables with picklable args.
The pool uses the ``fork`` start method: workers inherit the parent's
loaded state and MUST NOT touch jax/device handles (all call sites here
are pure numpy/cv2 host work). ``spawn`` would re-run the axon
sitecustomize per worker and contend for the TPU tunnel.
"""
from __future__ import annotations

import logging
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor

log = logging.getLogger(__name__)

__all__ = ["parallel_map"]


def parallel_map(fn, items, num_workers: int, backend: str = "thread"):
    """``list(map(fn, items))``, order-preserving, parallelized.

    backend: "thread" (default), "process" (fork; ``fn`` must be
    module-level picklable), or "serial".
    """
    items = list(items)
    if backend not in ("thread", "process", "serial"):
        raise ValueError(f"unknown parallel backend {backend!r}")
    if backend == "serial" or num_workers <= 1 or len(items) <= 1:
        return [fn(it) for it in items]
    if backend == "process":
        import multiprocessing as mp
        try:
            ctx = mp.get_context("fork")
        except ValueError:  # non-POSIX: fall back to threads
            log.warning("fork unavailable; using threads")
            ctx = None
        if ctx is not None:
            with ProcessPoolExecutor(min(num_workers, len(items)),
                                     mp_context=ctx) as pool:
                return list(pool.map(fn, items))
    with ThreadPoolExecutor(min(num_workers, len(items))) as pool:
        return list(pool.map(fn, items))
