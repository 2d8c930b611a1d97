"""Salted-join equivalence and scalable surrogate keys."""

from __future__ import annotations

from pyspark.sql import functions as F

from build_datawarehouse_demo_spark.operators.keys import surrogate_key_scalable
from build_datawarehouse_demo_spark.operators.skew import salted_count_per_key, salted_join


def test_salted_join_equals_plain_join(spark):
    # 90% of rows share one hot key
    big = spark.range(20000).selectExpr(
        "id", "CASE WHEN id % 10 < 9 THEN 'hot' ELSE concat('k', id % 50) END AS k"
    )
    small = spark.createDataFrame(
        [("hot", 1)] + [(f"k{i}", i) for i in range(50)], "k string, v int"
    )
    plain = big.join(small, "k").groupBy("k").agg(F.count("*").alias("n"), F.sum("v").alias("s"))
    salted = salted_join(big, small, "k").groupBy("k").agg(
        F.count("*").alias("n"), F.sum("v").alias("s")
    )
    assert {tuple(r) for r in plain.collect()} == {tuple(r) for r in salted.collect()}


def test_salted_join_left_keeps_misses(spark):
    big = spark.createDataFrame([("a",), ("zz",)], "k string")
    small = spark.createDataFrame([("a", 1)], "k string, v int")
    got = {(r.k, r.v) for r in salted_join(big, small, "k", how="left").collect()}
    assert got == {("a", 1), ("zz", None)}


def test_salted_count_matches_plain_count(spark):
    df = spark.range(10000).selectExpr("CASE WHEN id % 4 = 0 THEN 'hot' ELSE concat('c', id % 7) END AS k")
    plain = {(r.k, r["count"]) for r in df.groupBy("k").count().collect()}
    salted = {(r.k, r.n) for r in salted_count_per_key(df, "k").collect()}
    assert plain == salted


def test_scalable_key_no_python_rdd_and_contiguous(spark):
    df = spark.range(5000).repartition(13).selectExpr("id AS x")
    keyed = surrogate_key_scalable(df, key_col="sk")
    agg = keyed.agg(
        F.min("sk").alias("lo"), F.max("sk").alias("hi"), F.countDistinct("sk").alias("n")
    ).collect()[0]
    assert (agg.lo, agg.hi, agg.n) == (1, 5000, 5000)
    # the id must pair 1:1 with rows (no drops/dups through the join)
    assert keyed.select("x").distinct().count() == 5000

def test_aqe_skew_join_splits_hot_partition(spark):
    """join_skew_aqe must end up with SortMergeJoin(skew=true) in the
    FINAL adaptive plan — i.e. Spark really split the hot partition at
    runtime — and its thresholds must not leak into the caller."""
    from build_datawarehouse_demo_spark import registry

    before = spark.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
    df = registry.queries()["join_skew_aqe"](spark, "/root/testdata/sf0.001")
    rows = {r["hot"]: r["n_items"] for r in df.collect()}
    assert rows[True] > rows[False] > 0
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in plan, plan[:2000]
    assert (
        spark.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
        == before
    )
