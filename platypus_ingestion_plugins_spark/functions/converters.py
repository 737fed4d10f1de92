"""Sink-boundary type conversion (string-typed document model).

The reference's output document is a flat bag of string-typed,
multi-valued fields; every input type has a defined stringification
(reference: paimon-plugin PaimonToAddDocumentConverter.java:119-220 and
kafka-plugin AvroToAddDocumentConverter.java:94-107). We keep native
Spark types through the whole plan (columnar, codegen-friendly) and
stringify only at the sink boundary, with golden-string parity:

- BOOLEAN/ints/FLOAT/DOUBLE/DECIMAL/CHAR/VARCHAR -> decimal/identity string
  (PaimonToAddDocumentConverter.java:120-163)
- DATE -> days-since-epoch int string, NOT ISO
  (PaimonToAddDocumentConverter.java:165-169)
- TIMESTAMP -> epoch-millis long string (:177-186)
- BINARY -> Base64 (:188-194)
- ARRAY -> JSON: numerics unquoted, strings quoted+escaped, nulls literal
  (:196-200, 226-285)
- MAP -> JSON object (:202-206, 288-302)
- ROW/STRUCT -> real JSON via to_json — intentional improvement over the
  reference's placeholder (:208-212; paimon-plugin/TODO.md:11)
- null values omitted (-> SQL NULL here; dropped by the sink writer)
  (:112-114)

All expressions are built-in Catalyst functions: no UDFs, whole-stage
codegen applies, safe at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_PASSTHROUGH_CAST = (
    T.BooleanType,
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
    T.StringType,
)


def sink_column(col: Column, dtype: T.DataType, mode: str = "paimon") -> Column:
    """Stringification expression for one column of type ``dtype``.

    ``mode='paimon'`` emits arrays/maps/structs as JSON strings (one
    value); ``mode='kafka'`` keeps arrays as multi-valued string arrays
    (the Avro path's MultiValuedField with one value per element,
    AvroToAddDocumentConverter.java:49-69).
    """
    if isinstance(dtype, _PASSTHROUGH_CAST):
        return col.cast("string")
    if isinstance(dtype, T.DateType):
        # days since epoch, matching Paimon's internal DATE representation
        return F.datediff(col, F.lit("1970-01-01").cast("date")).cast("string")
    if isinstance(dtype, T.TimestampNTZType):
        # parquet NTZ timestamps: interpret as UTC wall-clock (session tz
        # is pinned to UTC in session.py); unix_millis only takes TIMESTAMP
        return F.unix_millis(col.cast("timestamp")).cast("string")
    if isinstance(dtype, T.TimestampType):
        return F.unix_millis(col).cast("string")
    if isinstance(dtype, T.BinaryType):
        # Spark's base64 emits MIME-chunked output (\r\n every 76 chars)
        # in this version; the reference emits unchunked Base64
        return F.replace(F.base64(col), F.lit("\r\n"), F.lit(""))
    if isinstance(dtype, T.ArrayType):
        if mode == "kafka":
            return F.transform(col, lambda x: sink_column(x, dtype.elementType, mode))
        return F.to_json(col)
    if isinstance(dtype, (T.MapType, T.StructType)):
        return F.to_json(col)
    raise ValueError(f"unsupported sink type: {dtype.simpleString()}")


def sink_stringify(df: DataFrame, mode: str = "paimon", exclude: tuple[str, ...] = ()) -> DataFrame:
    """Stringify every column of ``df`` per the sink type table.

    Unsupported types raise at plan time (the reference logs-and-drops
    at runtime, PaimonToAddDocumentConverter.java:214-219; failing the
    plan is strictly safer and costs nothing at scale).
    """
    cols = []
    for field in df.schema.fields:
        if field.name in exclude:
            cols.append(F.col(field.name))
        else:
            cols.append(sink_column(F.col(field.name), field.dataType, mode).alias(field.name))
    return df.select(*cols)


def _flatten_fields(schema: T.StructType, prefix: str, sep: str) -> list[tuple[str, str]]:
    out: list[tuple[str, str]] = []
    for field in schema.fields:
        path = f"{prefix}.{field.name}" if prefix else field.name
        name = path.replace(".", sep)
        if isinstance(field.dataType, T.StructType):
            out.extend(_flatten_fields(field.dataType, path, sep))
        else:
            out.append((path, name))
    return out


def flatten_structs(df: DataFrame, sep: str = "_") -> DataFrame:
    """Recursively flatten nested structs to ``parent_child`` columns.

    Mirrors the Avro converter's nested-record flattening
    (AvroToAddDocumentConverter.java:36-69; e.g. metadata.author ->
    metadata_author, kafka-plugin/README.md:48-49). Pure projection:
    Catalyst prunes unread leaf columns all the way to the parquet scan.
    """
    pairs = _flatten_fields(df.schema, "", sep)
    return df.select(*[F.col(path).alias(name) for path, name in pairs])
