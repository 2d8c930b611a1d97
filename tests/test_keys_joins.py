"""Surrogate keys (SURVEY.md §1.4) and join modes (§2.3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from build_datawarehouse_demo_spark.operators.joins import broadcast_dim_join, resolve_datetime_id
from build_datawarehouse_demo_spark.operators.keys import (
    surrogate_key_rownum,
    surrogate_key_scalable,
)
from build_datawarehouse_demo_spark.sources.generators import gen_date_range


def test_surrogate_rownum_dense_and_deterministic(spark):
    df = spark.createDataFrame([("c",), ("a",), ("b",)], "name string")
    out = {(r.name, r.id) for r in surrogate_key_rownum(df, ("name",)).collect()}
    assert out == {("a", 1), ("b", 2), ("c", 3)}


def test_surrogate_scalable_contiguous_unique(spark):
    df = spark.range(1000).repartition(7)
    keyed = surrogate_key_scalable(df.selectExpr("id AS x"), key_col="sk")
    agg = keyed.agg(
        F.min("sk").alias("lo"), F.max("sk").alias("hi"), F.countDistinct("sk").alias("n")
    ).collect()[0]
    assert (agg.lo, agg.hi, agg.n) == (1, 1000, 1000)


def test_broadcast_dim_join_modes(spark):
    fact = spark.createDataFrame([(1, "x"), (2, "y"), (3, "zz")], "fid int, k string")
    dim = spark.createDataFrame([("x", 10), ("y", 20)], "k string, did int")
    inner = broadcast_dim_join(fact, dim, "k", "inner")
    left = broadcast_dim_join(fact, dim, "k", "left")
    assert inner.count() == 2
    got = {(r.fid, r.did) for r in left.collect()}
    assert got == {(1, 10), (2, 20), (3, None)}


def test_resolve_datetime_id_drop_vs_keep(spark):
    spine = gen_date_range(spark, "2020-01-01", "2020-01-10")
    fact = spark.createDataFrame(
        [("a", "2020-01-03"), ("b", "2021-06-06")], "id string, d string"
    )
    dropped = resolve_datetime_id(fact, spine, F.col("d"), drop_miss=True)
    kept = resolve_datetime_id(fact, spine, F.col("d"), drop_miss=False)
    assert [r.id for r in dropped.collect()] == ["a"]
    got = {(r.id, r.datetime_id) for r in kept.collect()}
    assert got == {("a", 2), ("b", None)}  # 0-based spine ids


def test_broadcast_join_is_broadcast_in_plan(spark):
    fact = spark.range(10000).selectExpr("id", "id % 5 AS k")
    dim = spark.createDataFrame([(i, f"v{i}") for i in range(5)], "k long, v string")
    plan = broadcast_dim_join(fact, dim, "k")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
