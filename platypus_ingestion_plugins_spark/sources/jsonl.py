"""JSONL / CSV file sources with poison-line quarantine.

Training-data drops commonly arrive as JSON-lines; the failure mode is
a handful of malformed lines poisoning a multi-TB load. Same semantics
as the Kafka path's record-type filter + poison-pill skip (reference
P5 `KafkaIngestor.java:192-195`, C14 `PaimonRowProcessor.java:143-150`)
applied to files: PERMISSIVE parse, malformed lines routed to a
dead-letter frame instead of failing the job or silently vanishing.

Scale notes: the schema is DECLARED, not inferred — schema inference
is a second full scan of the input at 100 TB. One parse pass feeds
both outputs (the parsed frame is cached: Spark disallows filtering on
the corrupt-record column straight off a raw scan, and the cache also
keeps good/DLQ consistent if the files change mid-job).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType
) -> tuple[DataFrame, DataFrame]:
    """Parse JSONL at ``path`` against a declared schema.

    Returns ``(good, dlq)``: ``good`` has exactly the schema's columns,
    ``dlq`` one ``raw_line`` string column holding each malformed line
    verbatim (re-parseable after a fix — nothing is lost).
    """
    full = T.StructType(list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())])
    parsed = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
        .cache()
    )
    good = parsed.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    dlq = parsed.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return good, dlq


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    sep: str = ",",
) -> tuple[DataFrame, DataFrame]:
    """CSV twin of read_jsonl: declared schema, PERMISSIVE parse,
    malformed lines (wrong arity, uncastable values) quarantined
    verbatim. Same ``(good, dlq)`` contract."""
    full = T.StructType(list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())])
    parsed = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", str(header).lower())
        .option("sep", sep)
        .csv(path)
        .cache()
    )
    good = parsed.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    dlq = parsed.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return good, dlq
