"""Incremental time-bucketed rollup maintenance (the hypertable /
continuous-aggregate pattern).

A full `events -> hourly rollup` rebuild reprocesses everything; at
100 TB/day that's the whole cluster. The incremental form reprocesses
only buckets that received new data:

1. find the high-water mark of the existing rollup;
2. scan only events past (watermark - one bucket) — the single
   possibly-incomplete tail bucket plus genuinely new data; the scan
   prunes on the partition column when events are date-partitioned;
3. recompute exactly those buckets and upsert them over the rollup
   (operators/scd.py:upsert on the bucket key).

The same aggregation definition backs the Structured Streaming path
(streaming/windows.py:tumbling_event_counts) — this module is its
batch catch-up / backfill twin.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from build_datawarehouse_demo_spark.operators.scd import upsert
from build_datawarehouse_demo_spark.streaming.windows import tumbling_event_counts


def _parse_bucket_len(bucket_len: str) -> "dt.timedelta":
    """'N {day|hour|minute|second}[s]' -> timedelta (the subset of
    Spark's interval syntax a bucket length needs; months/years are
    not fixed-width and can't back an aligned arithmetic cutoff)."""
    n_str, unit = bucket_len.strip().split()
    unit_td = {
        "day": dt.timedelta(days=1),
        "hour": dt.timedelta(hours=1),
        "minute": dt.timedelta(minutes=1),
        "second": dt.timedelta(seconds=1),
    }.get(unit.rstrip("s").lower())
    if unit_td is None:
        raise ValueError(f"unsupported bucket_len unit: {bucket_len!r}")
    return int(n_str) * unit_td


def rollup_events_hourly(events: DataFrame, bucket_len: str = "1 hour") -> DataFrame:
    """The full-rebuild rollup (baseline, and the backfill path)."""
    return tumbling_event_counts(events, window_len=bucket_len)


def incremental_rollup_update(
    rollup: DataFrame | None,
    events: DataFrame,
    bucket_len: str = "1 hour",
    late_tolerance: "dt.timedelta | None" = None,
) -> DataFrame:
    """Merge new events into an existing rollup of `bucket_len`
    buckets, recomputing only affected buckets.

    rollup: previous output of rollup_events_hourly at the SAME
    bucket_len (or None for the first run). The result equals a full
    rebuild over all events PROVIDED no event arrives with ts older
    than (high-water bucket - late_tolerance) — the same bounded-
    lateness contract the streaming twin's watermark enforces. Pass
    late_tolerance matching your ingestion disorder; events later than
    that need a backfill over their buckets (tested for equivalence in
    tests/test_rollup_scd.py, including the late-arrival case).
    """
    if rollup is None:
        return rollup_events_hourly(events, bucket_len)

    hwm_row = rollup.agg(F.max("window_start").alias("hwm")).collect()[0]
    hwm = hwm_row.hwm
    if hwm is None:
        return rollup_events_hourly(events, bucket_len)

    # reprocess from the high-water bucket (it may be incomplete) minus
    # the lateness allowance; this predicate prunes the events scan.
    # The cutoff MUST sit on a bucket boundary: hwm is bucket-aligned,
    # but hwm - late_tolerance is not when the tolerance isn't a bucket
    # multiple, and an unaligned cutoff would recompute the boundary
    # bucket from only its post-cutoff events — upserting a partial
    # count over a complete row. Widen to whole buckets (ceil).
    if late_tolerance is not None:
        if late_tolerance < dt.timedelta(0):
            # a negative tolerance would push the cutoff PAST hwm,
            # silently dropping new events in the high-water bucket
            raise ValueError(f"late_tolerance must be >= 0, got {late_tolerance!r}")
        bucket = _parse_bucket_len(bucket_len)
        n_buckets = -(-late_tolerance // bucket)  # ceil division
        cutoff = hwm - n_buckets * bucket
    else:
        cutoff = hwm
    fresh_events = events.filter(F.col("ts") >= F.lit(cutoff))
    fresh_buckets = rollup_events_hourly(fresh_events, bucket_len)
    return upsert(rollup, fresh_buckets, key=["window_start", "event_type"])
