"""overlap_jobs: the driver-thread job-overlap helper (r16, guide
§2.6). No Spark needed — the contract under test is pure scheduling:
results in submission order, genuine concurrency, and
every-thunk-finishes-before-the-first-error-reraises (the property
the foreachBatch callers rely on so a failing output write never
leaves a sibling index append racing the caller's unpersist/cleanup)."""

import threading
import time

import pytest

from platypus_ingestion_plugins_spark.concurrency import overlap_jobs


def test_results_in_submission_order():
    assert overlap_jobs(lambda: 1, lambda: 2, lambda: 3) == [1, 2, 3]


def test_zero_and_one_thunk_degrade_to_sequential():
    assert overlap_jobs() == []
    assert overlap_jobs(lambda: "only") == ["only"]


def test_thunks_actually_overlap():
    """Both thunks must be in flight at once: each waits on a barrier
    only the other can release — serial execution would deadlock (the
    barrier timeout turns that into a loud BrokenBarrierError)."""
    barrier = threading.Barrier(2, timeout=10)
    assert overlap_jobs(lambda: barrier.wait() >= 0,
                        lambda: barrier.wait() >= 0) == [True, True]


def test_first_error_reraised_after_all_finish():
    done = []

    def fail_fast():
        raise ValueError("first")

    def slow_ok():
        time.sleep(0.2)
        done.append("slow")
        return "ok"

    with pytest.raises(ValueError, match="first"):
        overlap_jobs(fail_fast, slow_ok)
    # the sibling ran to completion before the error propagated
    assert done == ["slow"]
