"""Multi-format IO round trips + honest stubs for jar-backed formats."""

from __future__ import annotations

import tempfile

import pytest

from pyspark.sql import types as T

from build_datawarehouse_demo_spark.sources.formats import read_table, write_table

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("score", T.DoubleType()),
    ]
)
ROWS = [(1, "a", 1.5), (2, "b", -0.25), (3, None, None)]


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_native_format_roundtrip(spark, fmt):
    df = spark.createDataFrame(ROWS, SCHEMA)
    with tempfile.TemporaryDirectory() as d:
        opts = {"header": "true"} if fmt == "csv" else {}
        write_table(df, f"{d}/t", fmt=fmt, **opts)
        back = read_table(spark, f"{d}/t", fmt=fmt, schema=SCHEMA, **opts)
        assert {tuple(r) for r in back.collect()} == set(ROWS)


@pytest.mark.parametrize("fmt", ["delta", "iceberg", "hudi"])
def test_lakehouse_formats_stub_without_jars(spark, fmt):
    df = spark.createDataFrame(ROWS, SCHEMA)
    with pytest.raises(NotImplementedError, match="jar"):
        write_table(df, "/tmp/never-written", fmt=fmt)
    with pytest.raises(NotImplementedError, match="jar"):
        read_table(spark, "/tmp/never-read", fmt=fmt)


def test_unknown_format_rejected(spark):
    with pytest.raises(ValueError, match="unknown format"):
        read_table(spark, "/tmp/x", fmt="avro-ish")
