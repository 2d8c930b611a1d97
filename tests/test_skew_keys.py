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


def test_fuzzy_join_prefix_filter_defends_against_hot_token(spark):
    """Prefix-filter worst case: one token in 90% of rows. A naive
    token-bucket join would generate ~(0.9n)^2 candidate pairs from the
    hot bucket alone; rarest-first prefix ordering must keep the hot
    token OUT of prefixes (it is never among a row's rarest tokens), so
    candidates stay ~O(n): self pairs + the true near-dup pairs.
    Counts are recorded in ROUND_NOTES (round 6)."""
    from build_datawarehouse_demo_spark.operators.fuzzy_join import (
        fuzzy_jaccard_candidates,
        fuzzy_jaccard_join,
    )

    n = 400  # 200 near-dup pairs
    rows = []
    for i in range(n // 2):
        shared = " ".join(f"s{i}_{j}" for j in range(9))
        hot_a = "hot " if (2 * i) % 10 else ""  # 90% of rows carry it
        hot_b = "hot " if (2 * i + 1) % 10 else ""
        rows.append((2 * i, f"{hot_a}{shared} a{i}"))
        rows.append((2 * i + 1, f"{hot_b}{shared} b{i}"))
    df = spark.createDataFrame(rows, "l_id long, text string")
    right = df.withColumnRenamed("l_id", "r_id")

    cand, _, _ = fuzzy_jaccard_candidates(df, right, 0.8)
    n_cand = cand.count()
    # naive hot-bucket candidates would be (0.9n)^2 = 129_600 ordered
    # pairs; the defended plan stays within a small multiple of n
    assert n_cand <= 4 * n, f"candidate blowup: {n_cand} pairs for n={n}"

    # and the join is still exact: compare the near-dup pairs against
    # the python truth (hot-token membership shifts J: both-hot pairs
    # score 10/12, neither-hot 9/11, mixed 9/12 < 0.8 and drop)
    out = fuzzy_jaccard_join(df, right, 0.8)
    matched = {(r.l_id, r.r_id) for r in out.collect() if r.l_id != r.r_id}
    toks = {i: set(t.split()) for i, t in rows}
    expect = set()
    for i in range(n // 2):
        a, b = toks[2 * i], toks[2 * i + 1]
        if len(a & b) / len(a | b) >= 0.8:
            expect.add((2 * i, 2 * i + 1))
            expect.add((2 * i + 1, 2 * i))
    assert matched == expect and len(expect) > 0
