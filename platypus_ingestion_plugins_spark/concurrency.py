"""Overlap independent Spark jobs from driver threads.

Spark's scheduler happily runs several jobs at once inside one
application; actions are only sequential because driver code calls
them sequentially. A ``foreachBatch`` body that performs two or more
*independent* maintenance actions per micro-batch — e.g. writing the
batch's output parquet and appending the batch's keys to a side index
— therefore serializes cluster work for no reason: while the output
write's last tasks drain, the executors that could already be running
the index append sit idle, and every fixed per-job latency (planning,
scheduling, commit) is paid end-to-end instead of overlapped.

``overlap_jobs`` runs such action thunks concurrently from a small
driver-side thread pool and waits for all of them. Concurrency is
bounded by the number of thunks (callers pass 2-3 — enough to fill
the tail, not enough to fight for executors). FIFO scheduling (the
default) gives exactly the back-fill behavior wanted: the first job
gets resources first and later jobs use what is left.

Caller contract — the thunks must be INDEPENDENT:
- no thunk reads state another thunk writes (note that a DataFrame
  over a parquet path pins its file listing at creation, so a reader
  created *before* the pool starts never sees a concurrent append);
- no thunk renames/deletes directories another thunk's plan reads
  (run compaction/swap maintenance *before* overlapping, in its own
  serial step);
- shared upstream frames should be ``persist()``-ed by the caller:
  the first job to touch a partition computes and caches it, the
  block-level get-or-compute lock makes the others wait and reuse.

Failure semantics: every thunk runs to completion (success or
failure); the first exception in submission order is re-raised after
all thunks have finished, so a failing write never leaves a sibling
append racing against the caller's cleanup/unpersist.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Callable


def overlap_jobs(*thunks: Callable[[], object]) -> list[object]:
    """Run independent action thunks concurrently; return their
    results in submission order. With zero or one thunk this degrades
    to plain sequential calling (no pool)."""
    if len(thunks) <= 1:
        return [t() for t in thunks]
    with ThreadPoolExecutor(max_workers=len(thunks)) as pool:
        futures = [pool.submit(t) for t in thunks]
        results: list[object] = []
        first_err: BaseException | None = None
        for f in futures:
            try:
                results.append(f.result())
            except BaseException as e:  # noqa: BLE001 - re-raised below
                if first_err is None:
                    first_err = e
                results.append(None)
        if first_err is not None:
            raise first_err
    return results
