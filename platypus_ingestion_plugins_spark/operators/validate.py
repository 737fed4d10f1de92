"""Declarative data-quality constraints — the pipeline guardrail pass.

An ingestion engine feeding a 100 TB training pipeline needs cheap,
continuous answers to "is this batch sane": null rates, domains,
ranges, key uniqueness, referential integrity. This module runs a
check SET in the minimum number of jobs:

- every row-local predicate check and every uniqueness check folds
  into ONE aggregate over ONE corpus scan (violations are
  ``sum(cast(violation AS long))`` / ``count - count_distinct`` terms
  of the same partial-aggregatable agg — map-side combine, one
  single-row result);
- each referential check is one broadcast anti-join count against its
  (dimension-sized, broadcast) reference key set.

Output: one row per check — (check, violations, n_rows, passed) —
the shape a scheduler gates a batch promotion on. All counting is
exact integer arithmetic, so the report is oracle-checkable.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """One named constraint. Exactly one of the fields is set:

    - ``violation``: boolean Column, true on a VIOLATING row (NULL
      counts as non-violating — predicates must decide their own NULL
      policy explicitly, e.g. via ``not_null`` or coalesce);
    - ``unique_col``: column name whose values must be unique
      (violations = n_rows_with_value - n_distinct_values; NULLs are
      exempt — uniqueness is about key collisions, nullability is
      ``not_null``'s job);
    - ``fk``: (column, reference DataFrame, reference column) —
      non-null values must exist in the reference key set.
    """

    name: str
    violation: Column | None = None
    unique_col: str | None = None
    fk: tuple[str, DataFrame, str] | None = None

    def __post_init__(self):
        set_kinds = sum(
            x is not None for x in (self.violation, self.unique_col, self.fk)
        )
        if set_kinds != 1:
            raise ValueError(
                f"check {self.name!r}: exactly one of violation/unique_col/fk"
            )


def not_null(name: str, col: str) -> Check:
    return Check(name, violation=F.col(col).isNull())


def in_range(name: str, col: str, lo=None, hi=None) -> Check:
    """Violation when the value falls outside [lo, hi] (either bound
    optional, at least one required). NULLs don't violate a range."""
    if lo is None and hi is None:
        raise ValueError(f"check {name!r}: need at least one bound")
    c = F.col(col)
    bad = F.lit(False)
    if lo is not None:
        bad = bad | (c < F.lit(lo))
    if hi is not None:
        bad = bad | (c > F.lit(hi))
    return Check(name, violation=bad)


def accepted_values(name: str, col: str, values) -> Check:
    """Violation when a NON-NULL value is outside the accepted set."""
    c = F.col(col)
    return Check(name, violation=c.isNotNull() & ~c.isin(list(values)))


def unique(name: str, col: str) -> Check:
    return Check(name, unique_col=col)


def references(name: str, col: str, ref: DataFrame, ref_col: str) -> Check:
    return Check(name, fk=(col, ref, ref_col))


def constraint_monitor(checks: list[Check], report_path: str):
    """Streaming guardrail: a ``foreachBatch`` hook that runs the
    check set on every micro-batch and lands the report in a
    per-epoch directory with overwrite — the DLQ replay discipline,
    so an at-least-once redelivered batch overwrites ITS OWN report
    instead of double-counting. Read the accumulated history with
    ``read_reports``; ROW-LOCAL checks (null/range/domain/fk) sum
    across batches to exactly the whole-corpus counts (each row's
    verdict is batch-independent), while ``unique`` checks mean
    WITHIN-BATCH uniqueness here — global uniqueness across a stream
    is the serving table's key semantics, not a per-batch scan's."""

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        rep = check_constraints(batch_df, checks)
        rep.write.mode("overwrite").parquet(f"{report_path}/epoch={epoch_id}")

    return handle


def read_reports(spark, report_path: str) -> DataFrame:
    """The accumulated per-epoch constraint reports (epoch as a
    column via partition discovery)."""
    return (
        spark.read.option("basePath", report_path).parquet(report_path)
    )


def check_constraints(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Run the check set; see the module docstring for the job plan.
    Output: (check, violations, n_rows, passed), one row per check in
    a deterministic order (sorted by check name)."""
    if not checks:
        raise ValueError("no checks given")
    names = [c.name for c in checks]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate check names: {sorted(names)}")
    spark = df.sparkSession

    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in checks:
        if c.violation is not None:
            aggs.append(
                F.sum(F.coalesce(c.violation.cast("long"), F.lit(0))).alias(
                    f"__v_{c.name}"
                )
            )
        elif c.unique_col is not None:
            col = F.col(c.unique_col)
            aggs.append(
                (
                    F.count(col) - F.count_distinct(col)
                ).alias(f"__v_{c.name}")
            )
    row = df.agg(*aggs).collect()[0]
    n_rows = int(row["__n"])

    results: dict[str, int] = {}
    for c in checks:
        if c.fk is None:
            results[c.name] = int(row[f"__v_{c.name}"] or 0)
    for c in checks:
        if c.fk is not None:
            col, ref, ref_col = c.fk
            keys = F.broadcast(
                ref.select(F.col(ref_col).alias(col)).distinct()
            )
            results[c.name] = (
                df.select(col)
                .filter(F.col(col).isNotNull())
                .join(keys, col, "left_anti")
                .count()
            )

    rows = [
        (name, results[name], n_rows, results[name] == 0)
        for name in sorted(results)
    ]
    return spark.createDataFrame(
        rows, "check string, violations long, n_rows long, passed boolean"
    )


def fd_violations(
    df: DataFrame,
    lhs: list[str] | tuple[str, ...] | str,
    rhs: str,
) -> DataFrame:
    """Functional-dependency DISCOVERY report — the profiling
    complement to the declared `Check` constraints: for the candidate
    dependency lhs -> rhs, every lhs group carrying MORE than one
    distinct rhs value, with its violation surface. Empty output =
    the FD holds (promote it to a declared constraint); populated
    output = the denormalization/drift the pipeline should look at.

    Output (lhs..., n_rhs_values, n_rows) for violating groups only
    — n_rhs_values counts distinct NON-NULL rhs values (a NULL rhs
    never contradicts a dependency, the SQL-semantics reading), and
    rows whose lhs contains a NULL group together like any other
    value (profiling wants to see them).

    One partial-aggregatable groupBy(lhs) — group-count-sized output,
    one shuffle."""
    cols = [lhs] if isinstance(lhs, str) else list(lhs)
    if not cols:
        raise ValueError("lhs must name at least one column")
    if rhs in cols:
        raise ValueError(f"rhs {rhs!r} cannot be part of lhs")
    return (
        df.groupBy(*[F.col(c) for c in cols])
        .agg(
            F.count_distinct(F.col(rhs)).cast("long").alias("n_rhs_values"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
        .where(F.col("n_rhs_values") > 1)
    )
