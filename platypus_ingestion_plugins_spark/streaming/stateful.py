"""Custom stateful streaming operator: cross-batch sessionization.

The reference's only cross-batch state is the consumed-snapshot
checkpoint (PaimonIngestor.java:269-276); its row processing is
stateless per record. A training-data pipeline needs genuinely
stateful stream operators (sessionization, dedup-within-horizon,
running profiles). The Spark-first construct is
``applyInPandasWithState``: state lives in the streaming state store
(checkpointed, partitioned by key, Arrow-batched into Python), so the
operator survives restarts and scales horizontally with the key space.

This module implements gap-based sessionization: events for a key
belong to one session while consecutive gaps stay within ``gap_s``;
a larger gap closes the session. Closed sessions are emitted
(append-mode); the open session per key is carried in the state store
across micro-batches.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("session_start", T.LongType()),
        T.StructField("session_end", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("session_start", T.LongType()),
        T.StructField("last_ts", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def _session_fn(gap_s: int):
    def fn(key: Any, pdfs: Iterator, state: GroupState) -> Iterator:
        import pandas as pd

        ts = sorted(
            int(t) for pdf in pdfs for t in pdf["ts"] if t is not None
        )
        if state.exists:
            start, last, n = state.get
        else:
            start = last = n = None
        closed: list[tuple[int, int, int]] = []
        for t in ts:
            if start is None:
                start, last, n = t, t, 1
            elif t - last > gap_s:
                closed.append((start, last, n))
                start, last, n = t, t, 1
            else:
                # max() guards against a same-session event arriving in a
                # later batch with a slightly older timestamp
                last, n = max(last, t), n + 1
        if start is not None:
            state.update((start, last, n))
        if closed:
            yield pd.DataFrame(
                {
                    "key": [key[0]] * len(closed),
                    "session_start": [c[0] for c in closed],
                    "session_end": [c[1] for c in closed],
                    "n_events": [c[2] for c in closed],
                }
            )

    return fn


def sessionize_stream(
    stream_df: DataFrame, key_col: str, ts_col: str, gap_s: int = 30
) -> DataFrame:
    """Append-mode stream of CLOSED sessions (key, start, end, n_events).

    The open session per key persists in the checkpointed state store,
    so a session spanning micro-batches (or a restart) is assembled
    correctly — the cross-batch guarantee the batch ``sessionize``
    operator cannot give on an unbounded stream.
    """
    prepared = stream_df.selectExpr(
        f"CAST({key_col} AS STRING) AS key", f"CAST({ts_col} AS LONG) AS ts"
    )
    return prepared.groupBy("key").applyInPandasWithState(
        _session_fn(gap_s),
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
