"""Model-inference hosting: run a batched scorer over the corpus with
per-task model initialization — the plumbing a quality classifier,
reward model, or embedding model needs to score 100 TB without
reloading weights per row or per Arrow batch.

Contract: ``init() -> model`` runs ONCE per task (the expensive
weight load); ``scorer(model, pdf) -> pandas.DataFrame`` receives each
Arrow batch of the requested input columns and returns the new output
columns, row-aligned. Everything else — batching (sized by
``spark.sql.execution.arrow.maxRecordsPerBatch``), Arrow transfer,
passthrough of the untouched columns, schema wiring — is handled
here. The scan parallelism is the inference parallelism: one model
instance per task slot, the standard CPU/GPU-pool shape (pin
executor-cores to what one model instance saturates).

The actual model is the caller's (no ML runtime ships in this
engine); ``hash_scorer`` below is the deterministic stand-in that
makes the PLUMBING oracle-checkable end to end — scores are md5-unit
hashes of an input column, bit-reproducible in any engine, so the
driver's DuckDB oracle verifies batching, alignment, and passthrough
rather than trusting them.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def score_with(
    df: DataFrame,
    input_cols: list[str],
    output_fields: list[tuple[str, str]],
    scorer: Callable,
    init: Callable | None = None,
) -> DataFrame:
    """All of ``df``'s columns plus ``output_fields`` ([(name, spark
    type ddl), ...]) computed by ``scorer(model, pdf)`` over Arrow
    batches of ``input_cols``; ``init()`` builds the model once per
    task. The scorer sees ONLY the input columns (keep the Arrow
    transfer narrow); outputs re-attach beside the full row."""
    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField(n, T._parse_datatype_string(t))
            for n, t in output_fields
        ]
    )
    names = [f.name for f in df.schema.fields]
    out_names = [n for n, _ in output_fields]

    def run(batches: Iterator):
        model = init() if init is not None else None
        for pdf in batches:
            scored = scorer(model, pdf[input_cols])
            res = pdf[names].copy()
            for n in out_names:
                res[n] = scored[n].values
            yield res

    return df.mapInPandas(run, out_schema)


def hash_scorer(text_col: str, out_col: str = "score", salt: str = "model"):
    """The deterministic stand-in model: score = md5-unit-hash of the
    text — same [0,1) construction as functions/sampling.unit_hash, so
    an external SQL engine reproduces every score bit-for-bit and the
    inference PLUMBING (batching, row alignment, passthrough) gets a
    real oracle. Swap for a real ``(init, scorer)`` pair in
    production."""
    import hashlib

    def scorer(model, pdf):
        import pandas as pd

        def h(t):
            hx = hashlib.md5(f"{salt}|{t or ''}".encode("utf-8")).hexdigest()
            return int(hx[:15], 16) / float(16**15)

        return pd.DataFrame({out_col: pdf[text_col].map(h)})

    return scorer
