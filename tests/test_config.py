"""Config-driven assembly (config.py): reference key/default/validation
parity (IngestionConfigTest / PaimonConfigTest shapes) and a config
map driven END TO END — dict in, queryable serving table out."""

import pytest
from pyspark.sql import Row
from pyspark.sql import types as T

from platypus_ingestion_plugins_spark.config import (
    KafkaIngestionConfig,
    PaimonIngestionConfig,
    config_get,
)

CDC_SCHEMA = T.StructType(
    [
        T.StructField("_seq", T.LongType()),
        T.StructField("_row_kind", T.StringType()),
        T.StructField("doc_key", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("tmp_internal", T.StringType()),
    ]
)


def test_config_get_flat_and_nested():
    cfg = {"database.name": "flatdb", "a": {"b": {"c": 7}}}
    assert config_get(cfg, "database.name") == "flatdb"  # flat key with dots
    assert config_get(cfg, "a.b.c") == 7  # ConfigHelper dot descent
    assert config_get(cfg, "a.b.missing", "dflt") == "dflt"
    with pytest.raises(ValueError, match="Required configuration 'x.y'"):
        config_get(cfg, "x.y")


def test_kafka_config_defaults_and_validation():
    """IngestionConfig.java parity: defaults for every optional key,
    required topic/indexName/bootstrapServers."""
    c = KafkaIngestionConfig({"topic": "t", "indexName": "idx"})
    assert c.bootstrap_servers == "localhost:9092"
    assert c.consumer_group_id == "nrtsearch-kafka-consumer"
    assert c.auto_offset_reset == "earliest"
    assert c.auto_commit_enabled is False
    assert c.batch_size == 1000
    assert c.schema_registry_url is None

    with pytest.raises(ValueError, match="topic is required"):
        KafkaIngestionConfig({"indexName": "idx"})
    with pytest.raises(ValueError, match="Index name is required"):
        KafkaIngestionConfig({"topic": "t"})
    with pytest.raises(ValueError, match="Bootstrap servers"):
        KafkaIngestionConfig(
            {"topic": "t", "indexName": "idx", "bootstrapServers": ""}
        )
    # string-typed overrides parse like the reference's Map<String,Object>
    c2 = KafkaIngestionConfig(
        {"topic": "t", "indexName": "idx", "batchSize": "250",
         "autoCommitEnabled": "true"}
    )
    assert c2.batch_size == 250 and c2.auto_commit_enabled is True


def test_paimon_config_defaults_and_validation():
    """PaimonConfig.java parity: required db/table/index/warehouse,
    defaults 4/1000/1000/30000/10000/10."""
    base = {
        "database.name": "db",
        "table.name": "docs",
        "target.index.name": "idx",
        "warehouse.path": "/tmp/wh",
    }
    c = PaimonIngestionConfig(base)
    assert c.table_path == "db.docs"
    assert c.worker_threads == 4 and c.batch_size == 1000
    assert c.poll_timeout_ms == 1000 and c.scan_interval_ms == 30000
    assert c.queue_capacity == 10000 and c.checkpoint_timeout_minutes == 10
    assert c.source_path() == "/tmp/wh/db.db/docs"
    assert c.index_path() == "/tmp/wh/_indexes/idx"

    for missing in base:
        broken = {k: v for k, v in base.items() if k != missing}
        with pytest.raises(ValueError, match=missing):
            PaimonIngestionConfig(broken)
    with pytest.raises(ValueError, match="Invalid integer"):
        PaimonIngestionConfig({**base, "batch.size": "lots"})


def test_paimon_config_drives_pipeline_end_to_end(spark, tmp_path):
    """The reference's deployment unit on Spark rails: ONE config map
    (field mapping, prefix drops, index key) assembles the whole
    CDC-to-serving pipeline; two drops + a drain each produce the
    merged, renamed, pruned table."""
    wh = str(tmp_path / "wh")
    cfg = PaimonIngestionConfig(
        {
            "database.name": "db",
            "table.name": "docs",
            "target.index.name": "idx",
            "warehouse.path": wh,
            "field.mapping": {"doc_key": "id"},
            "field.drop.prefixes": ["tmp_"],
            "index.key": "id",
        }
    )
    src = cfg.source_path()

    def drop(*ops):
        spark.createDataFrame(
            [Row(_seq=s, _row_kind=k, doc_key=i, title=t, tmp_internal="x")
             for s, k, i, t in ops],
            CDC_SCHEMA,
        ).write.mode("append").parquet(src)

    drop((1, "+I", "a", "v1"), (2, "+I", "b", "v1"))
    pipe = cfg.build_pipeline(spark, CDC_SCHEMA)
    pipe.run_available()
    table = spark.read.parquet(cfg.index_path())
    assert "tmp_internal" not in table.columns  # prefix drop applied
    assert "id" in table.columns  # rename applied
    got = {r.id: r.title for r in table.collect()}
    assert got == {"a": "v1", "b": "v1"}

    drop((3, "+U", "a", "v2"), (4, "-D", "b", "v1"))
    pipe.run_available()
    got = {r.id: r.title for r in spark.read.parquet(cfg.index_path()).collect()}
    assert got == {"a": "v2"}
