"""Generated dimensions (SURVEY.md §2.1, ops `gen_date_range`,
`gen_range_small`).

The reference builds a calendar spine 1948-09-06 → 2025-12-31 with
pandas `date_range` + positional ids + strftime parts
(/root/reference/transformation.py:89-137) and a 24-row hour dim
(/root/reference/transformation.py:118-125). Spark-first: a single
`sequence()` expression — generated on executors, no driver-side
materialization, so a million-day spine costs the same as a thousand.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from build_datawarehouse_demo_spark.functions.datetime_kit import date_id, date_parts


def gen_date_range(
    spark: SparkSession,
    start_date: str = "1948-09-06",
    end_date: str = "2025-12-31",
) -> DataFrame:
    """Calendar spine: one row per day, with the reference's full
    column set (/root/reference/transformation.py:89-116): datetime_id
    (0-based position, matching the reference's `range(len(df))` at
    transformation.py:100), date_id (yyyymmdd int), day_of_week name,
    day_of_month/month/year/quarter, and the reference's degenerate
    always-0 `hour_id` (transformation.py:109-114 — hour granularity
    lives in dim_hour). `full_date` is an extra convenience column the
    reference derives later in create_dim_date.

    The positional id is derived arithmetically (datediff from start),
    NOT via a global row_number() window — same values, no
    single-partition shuffle, holds at any spine length.
    """
    start, end = F.lit(start_date).cast("date"), F.lit(end_date).cast("date")
    spine = spark.range(1).select(
        F.explode(F.sequence(start, end, F.expr("interval 1 day"))).alias("full_date")
    )
    parts = date_parts("full_date")
    return spine.select(
        F.datediff(F.col("full_date"), start).cast("int").alias("datetime_id"),
        F.col("full_date").cast("timestamp").alias("full_timestamp"),
        date_id("full_date").alias("date_id"),
        *[expr.alias(name) for name, expr in parts.items()],
        F.lit(0).cast("int").alias("hour_id"),
        F.col("full_date"),
    )


def gen_hour_dim(spark: SparkSession) -> DataFrame:
    """24-row hour dimension: hour_id + the reference's zero-padded
    `hour_of_day` label ('00'..'23', f'{h:02d}' at
    /root/reference/transformation.py:118-125)."""
    return spark.range(24).select(
        F.col("id").cast("int").alias("hour_id"),
        F.format_string("%02d", F.col("id").cast("int")).alias("hour_of_day"),
    )
