"""Projection (P1/P2) and modulo sharding (D1-D4) semantics, incl. the
reference's {2,7,12}-of-15 shard E2E (PaimonModuloShardingE2ETest)."""

import os
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from platypus_ingestion_plugins_spark.operators.projection import drop_by_prefix, rename_fields
from platypus_ingestion_plugins_spark.operators.sharding import (
    ModuloShardingStrategy,
    shard_id_from_service_name,
    sharding_strategy,
    write_modulo_partitioned,
)


def test_rename(spark):
    df = spark.createDataFrame([Row(old_field_name="v", other="w")])
    out = rename_fields(df, {"old_field_name": "new_field_name"})
    assert set(out.columns) == {"new_field_name", "other"}
    with pytest.raises(ValueError):
        rename_fields(df, {"nope": "x"})


def test_drop_by_prefix_boundaries(spark):
    """Prefix-boundary cases from PaimonToAddDocumentConverterTest.java:447-688:
    temp_file kept for tmp_ but system dropped for sys."""
    cols = ["__internal_id", "__debug_x", "_hidden", "sys_meta", "tmpfile",
            "temp_file", "system", "normal"]
    df = spark.createDataFrame([Row(**{c: "v" for c in cols})])
    out = drop_by_prefix(df, ["__internal_", "__debug_", "_", "sys_", "tmp"])
    assert set(out.columns) == {"temp_file", "system", "normal"}


def test_shard_id_parse():
    assert shard_id_from_service_name("test-service-2", 5) == 2
    assert shard_id_from_service_name("name-23", 30) == 23
    with pytest.raises(ValueError):
        shard_id_from_service_name("no-trailing-int-x", 5)
    with pytest.raises(ValueError):
        shard_id_from_service_name("svc-7", 5)  # out of range


def test_modulo_shard_e2e(spark, tmp_path):
    """15 rows ids 0-14, 5 shards, shard 2 reads exactly {2,7,12} and the
    scan prunes to 1 of 5 partition directories."""
    df = spark.createDataFrame([Row(id=i, title=f"Title {i}") for i in range(15)])
    path = str(tmp_path / "sharded")
    write_modulo_partitioned(df, path, pk="id", partition_field="__internal_partition_id", max_shards=5)

    table = spark.read.parquet(path)
    strat = sharding_strategy(
        "modulo", partition_field="__internal_partition_id",
        service_name="test-service-2", max_shards=5,
    )
    assert isinstance(strat, ModuloShardingStrategy)
    shard = strat.apply(table)
    assert sorted(r.id for r in shard.collect()) == [2, 7, 12]

    # partition pruning visible in the physical plan
    plan = shard._jdf.queryExecution().executedPlan().toString()
    assert "__internal_partition_id" in plan

    # drop internal prefix for the output document (E2E :121, 247-286)
    out = drop_by_prefix(shard, ["__internal_"])
    assert set(out.columns) == {"id", "title"}


def test_modulo_shard_prunes_files_read(spark, tmp_path):
    """Input-metrics check of the ~N-fold I/O reduction claim
    (ModuloShardingStrategy.java:142-143): the sharded scan touches
    only its own partition directory's files — at most 1/N of the
    table's data files."""
    df = spark.createDataFrame([Row(id=i, title=f"Title {i}") for i in range(100)])
    path = str(tmp_path / "sharded")
    write_modulo_partitioned(df, path, pk="id", partition_field="shard", max_shards=5)

    import glob

    total_files = len(glob.glob(f"{path}/shard=*/*.parquet"))
    assert total_files >= 5  # one or more data files per partition dir

    shard = sharding_strategy(
        "modulo", partition_field="shard", shard_id=2, max_shards=5
    ).apply(spark.read.parquet(path))
    touched = [
        r.f for r in shard.select(F.input_file_name().alias("f")).distinct().collect()
    ]
    assert touched, "sharded read scanned no files"
    assert all("/shard=2/" in f for f in touched), touched
    # exactly the shard's own partition directory, nothing else
    own_files = {os.path.basename(f) for f in glob.glob(f"{path}/shard=2/*.parquet")}
    assert {os.path.basename(f) for f in touched} == own_files
    # ~N-fold reduction (file counts per dir vary slightly with hashing)
    assert len(touched) / total_files <= 1 / 5 + 0.05


def test_no_sharding_passthrough(spark):
    df = spark.createDataFrame([Row(id=1)])
    assert sharding_strategy("none").apply(df) is df


def test_geo_requires_config():
    # reference declares-and-throws (GeoShardingStrategy.java:26-44);
    # here misconfiguration throws, a configured strategy works
    with pytest.raises(ValueError):
        sharding_strategy("geo")


def test_geo_sharding_prunes_regions(spark, tmp_path):
    df = spark.createDataFrame(
        [Row(id=i, region=r) for i, r in enumerate(["us", "eu", "ap", "us", "eu"])]
    )
    path = str(tmp_path / "geo")
    df.write.partitionBy("region").parquet(path)
    strat = sharding_strategy("geo", partition_field="region", regions=["us", "ap"])
    out = strat.apply(spark.read.parquet(path))
    assert {r.id for r in out.collect()} == {0, 2, 3}
    touched = {
        r.f for r in out.select(F.input_file_name().alias("f")).distinct().collect()
    }
    assert touched and all("/region=us/" in f or "/region=ap/" in f for f in touched)


def test_time_partitioned_write_prunes(spark, tmp_path):
    from platypus_ingestion_plugins_spark.operators.sharding import (
        DATE_COL,
        time_range,
        write_time_partitioned,
    )

    df = spark.createDataFrame(
        [Row(id=i, ts=f"2024-01-{(i % 5) + 1:02d} 10:00:00") for i in range(50)]
    ).select("id", F.col("ts").cast("timestamp").alias("ts"))
    path = str(tmp_path / "ts")
    write_time_partitioned(df, path, "ts")
    out = time_range(spark.read.parquet(path), "2024-01-02", "2024-01-04")
    assert out.count() == 20  # days 2 and 3
    touched = {
        r.f for r in out.select(F.input_file_name().alias("f")).distinct().collect()
    }
    assert touched and all(
        f"/{DATE_COL}=2024-01-02/" in f or f"/{DATE_COL}=2024-01-03/" in f
        for f in touched
    )


def test_csv_source_quarantines_poison_lines(spark, tmp_path):
    from pyspark.sql import types as T

    from platypus_ingestion_plugins_spark.sources.jsonl import read_csv

    p = tmp_path / "drop.csv"
    p.write_text("id,text\n1,ok one\n2,ok two\nnot-a-number,3\n3,ok three\n")
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("text", T.StringType())]
    )
    good, dlq = read_csv(spark, str(p), schema)
    assert {r.id for r in good.collect()} == {1, 2, 3}
    bad = [r.raw_line for r in dlq.collect()]
    assert bad == ["not-a-number,3"]


def test_expire_partitions_before(spark, tmp_path):
    from platypus_ingestion_plugins_spark.operators.sharding import (
        expire_partitions_before,
        time_range,
        write_time_partitioned,
    )

    df = spark.createDataFrame(
        [Row(id=i, ts=f"2024-01-{(i % 5) + 1:02d} 10:00:00") for i in range(50)]
    ).select("id", F.col("ts").cast("timestamp").alias("ts"))
    path = str(tmp_path / "ret")
    write_time_partitioned(df, path, "ts")
    dropped = expire_partitions_before(spark, path, "2024-01-03")
    assert dropped == ["2024-01-01", "2024-01-02"]
    remaining = spark.read.parquet(path)
    assert remaining.count() == 30
    assert time_range(remaining, "2024-01-01", "2024-01-03").count() == 0
    # idempotent
    assert expire_partitions_before(spark, path, "2024-01-03") == []


def test_zorder_layout_prunes_both_dimensions(spark, tmp_path):
    """Z-ordered layout: a rectangle query over TWO dimensions reads
    only its covering-prefix directories (single-column partitioning
    can only ever prune one of them), and the pruned scan's result is
    identical to the full-scan filter."""
    import glob
    import random

    from platypus_ingestion_plugins_spark.operators.zorder import (
        write_zordered,
        zorder_range_scan,
    )

    rnd = random.Random(7)
    rows = [
        Row(rid=i, x=rnd.uniform(0, 100), y=rnd.uniform(0, 100))
        for i in range(4000)
    ]
    df = spark.createDataFrame(rows)
    path = str(tmp_path / "zordered")
    specs = [("x", 0.0, 100.0), ("y", 0.0, 100.0)]
    write_zordered(df, path, specs, bits=5, prefix_bits=4)
    dirs = glob.glob(f"{path}/zp=*")
    assert len(dirs) == 16  # full prefix space populated at this n

    rect = [(10.0, 30.0), (60.0, 80.0)]  # selective in BOTH dims
    got = zorder_range_scan(spark, path, specs, rect, bits=5, prefix_bits=4)
    expect = {
        r.rid
        for r in df.filter(
            "x >= 10 and x <= 30 and y >= 60 and y <= 80"
        ).collect()
    }
    assert {r.rid for r in got.collect()} == expect and expect

    touched = {
        r.f.split("/zp=")[1].split("/")[0]
        for r in got.select(F.input_file_name().alias("f")).distinct().collect()
    }
    # the rectangle covers ~4% of the plane; its prefix cover must be
    # a strict minority of directories (both dimensions pruned)
    assert len(touched) < len(dirs) / 2, (len(touched), len(dirs))

    # degenerate rectangle outside the data range still behaves
    empty = zorder_range_scan(
        spark, path, specs, [(200.0, 300.0), (200.0, 300.0)],
        bits=5, prefix_bits=4,
    )
    assert empty.count() == 0
