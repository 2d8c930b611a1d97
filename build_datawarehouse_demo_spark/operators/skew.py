"""Skew-aware joins: explicit key salting for the cases AQE's runtime
skew-join splitting can't reach (e.g. a single hot key that dominates
an aggregation, or a non-AQE environment).

The pattern: replicate the small side R times with a salt column
0..R-1, scatter the big side's hot keys across the same salt range,
join on (key, salt). The hot key's rows spread over R tasks instead of
one straggler.

First preference remains AQE (`spark.sql.adaptive.skewJoin.enabled`,
on by default in session.get_spark) — use this module when profiling
shows a straggler task that AQE didn't split (aggregations, or joins
below its size thresholds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where `big[on]` is skewed: salt the big side randomly,
    replicate the small side across all salt values.

    Output equals ``big.join(small, on, how)`` row-for-row; only the
    physical distribution changes (hot keys fan out over salt_buckets
    tasks). Supports inner/left joins (the replicated side must be the
    lookup side).
    """
    salted_big = big.withColumn("__salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    exploded_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return salted_big.join(exploded_small, [on, "__salt"], how).drop("__salt")


def salted_count_per_key(df: DataFrame, key: str, salt_buckets: int = 32) -> DataFrame:
    """Two-phase aggregation for a skewed groupBy key: partial
    aggregate on (key, salt), then final aggregate on key. The hot
    key's partial states spread across salt_buckets tasks; the final
    pass combines salt_buckets rows per key, not N.

    (For plain count/sum Spark's hash-aggregate partials already do
    this; the pattern matters for high-cardinality state per group —
    collect_set, exact distinct — where map-side partials blow memory
    on one task.)
    """
    # salt must vary PER ROW — hash(key) % N is constant for every row
    # of a given key, which would leave the hot key's rows in a single
    # group and mitigate nothing.
    return (
        df.withColumn("__salt", (F.rand(seed=42) * salt_buckets).cast("int"))
        .groupBy(key, "__salt")
        .agg(F.count(F.lit(1)).alias("__partial"))
        .groupBy(key)
        .agg(F.sum("__partial").cast("long").alias("n"))
    )
