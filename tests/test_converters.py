"""Golden-string parity for sink stringification (FIXTURES.md F5;
reference goldens from PaimonToAddDocumentConverterTest.java:77-353)."""

import datetime
from decimal import Decimal

import pytest
from pyspark.sql import Row
from pyspark.sql import types as T

from platypus_ingestion_plugins_spark.functions.converters import (
    flatten_structs,
    sink_stringify,
)

SCHEMA = T.StructType(
    [
        T.StructField("booleanField", T.BooleanType()),
        T.StructField("tinyintField", T.ByteType()),
        T.StructField("smallintField", T.ShortType()),
        T.StructField("intField", T.IntegerType()),
        T.StructField("bigintField", T.LongType()),
        T.StructField("floatField", T.FloatType()),
        T.StructField("doubleField", T.DoubleType()),
        T.StructField("varcharField", T.StringType()),
        T.StructField("decimalField", T.DecimalType(10, 2)),
        T.StructField("dateField", T.DateType()),
        T.StructField("timeField", T.IntegerType()),
        T.StructField("timestampField", T.TimestampType()),
        T.StructField("binaryField", T.BinaryType()),
        T.StructField("embedding_vector", T.ArrayType(T.DoubleType())),
        T.StructField("tag_list", T.ArrayType(T.StringType())),
        T.StructField("arr_nulls_d", T.ArrayType(T.DoubleType())),
        T.StructField("arr_nulls_s", T.ArrayType(T.StringType())),
        T.StructField("arr_escape", T.ArrayType(T.StringType())),
        T.StructField("mapField", T.MapType(T.StringType(), T.StringType())),
        T.StructField(
            "nested",
            T.StructType(
                [
                    T.StructField("innerField", T.StringType()),
                    T.StructField("innerNumber", T.IntegerType()),
                ]
            ),
        ),
        T.StructField("nullField", T.StringType()),
    ]
)

ROW = Row(
    booleanField=True,
    tinyintField=127,
    smallintField=32767,
    intField=2147483647,
    bigintField=9223372036854775807,
    floatField=3.14,
    doubleField=2.718281828,
    varcharField="varchar_test",
    decimalField=Decimal("123.45"),
    dateField=datetime.date(2024, 1, 1),
    timeField=43200000,
    timestampField=datetime.datetime(2024, 1, 1, 12, 0, 0, tzinfo=datetime.timezone.utc),
    binaryField=b"test_data",
    embedding_vector=[-0.12345, 0.67890, 1.23456, -2.34567, 0.0, 3.14159],
    tag_list=["machine_learning", "データ", "测试"],
    arr_nulls_d=[1.5, None, 2.5],
    arr_nulls_s=["first", None, "third"],
    arr_escape=['quote"test', "newline\ntest", "backslash\\test", "tab\ttest"],
    mapField={"key1": "value1"},
    nested=Row(innerField="nested_value", innerNumber=42),
    nullField=None,
)


@pytest.fixture(scope="module")
def converted(spark):
    df = spark.createDataFrame([ROW], SCHEMA)
    out = sink_stringify(df)
    # every column must be a plain string after conversion
    assert all(isinstance(f.dataType, T.StringType) for f in out.schema.fields)
    return out.collect()[0].asDict()


GOLDENS = {
    "booleanField": "true",
    "tinyintField": "127",
    "smallintField": "32767",
    "intField": "2147483647",
    "bigintField": "9223372036854775807",
    "floatField": "3.14",
    "doubleField": "2.718281828",
    "varcharField": "varchar_test",
    "decimalField": "123.45",
    "dateField": "19723",  # days since epoch, not ISO
    "timeField": "43200000",  # ms since midnight
    "timestampField": "1704110400000",  # epoch millis
    "binaryField": "dGVzdF9kYXRh",  # base64
    "embedding_vector": "[-0.12345,0.6789,1.23456,-2.34567,0.0,3.14159]",
    "tag_list": '["machine_learning","データ","测试"]',
    "arr_nulls_d": "[1.5,null,2.5]",
    "arr_nulls_s": '["first",null,"third"]',
    "arr_escape": '["quote\\"test","newline\\ntest","backslash\\\\test","tab\\ttest"]',
    "mapField": '{"key1":"value1"}',
    "nullField": None,
}


@pytest.mark.parametrize("field,expected", sorted(GOLDENS.items()))
def test_golden(converted, field, expected):
    assert converted[field] == expected


def test_nested_struct_real_json(converted):
    # intentional improvement over the reference's {"nested":"row"} placeholder
    assert converted["nested"] == '{"innerField":"nested_value","innerNumber":42}'


def test_kafka_mode_multivalued(spark):
    df = spark.createDataFrame(
        [Row(tags=["a", "b"], nums=[1, 2])],
        T.StructType(
            [
                T.StructField("tags", T.ArrayType(T.StringType())),
                T.StructField("nums", T.ArrayType(T.IntegerType())),
            ]
        ),
    )
    row = sink_stringify(df, mode="kafka").collect()[0]
    assert row.tags == ["a", "b"]
    assert row.nums == ["1", "2"]


def test_flatten_structs(spark):
    df = spark.createDataFrame(
        [Row(id="doc1", metadata=Row(author="Alice Smith", publishDate="2024-01-15"))]
    )
    flat = flatten_structs(df)
    assert set(flat.columns) == {"id", "metadata_author", "metadata_publishDate"}
    row = flat.collect()[0]
    assert row.metadata_author == "Alice Smith"


def test_ntz_timestamp_from_parquet(spark, sf_dir):
    """Driver parquet timestamps load as TIMESTAMP_NTZ; epoch-ms rule applies."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select("l_shipdate").limit(1)
    out = sink_stringify(li).collect()[0]
    assert out.l_shipdate.isdigit() and len(out.l_shipdate) == 12  # 1990s epoch ms
