"""Stream-stream interval join (SURVEY.md §2.9 extension).

The attribution-join shape: each event joins the SAME user's earlier
events inside a bounded lookback. One mode-agnostic definition:

- batch input: equi-join on the key with a residual time-range
  predicate — shuffles on the key, the range stays a cheap filter;
- streaming inputs: the identical condition becomes a Structured
  Streaming stream-stream inner join; the watermarks plus the bounded
  time-interval condition are what let Spark EXPIRE join state — the
  per-key buffer holds only `lookback + watermark` of history instead
  of growing forever, which is the difference between a join that
  survives 100 TB/day and one that OOMs by lunch.

Batch ≡ streaming asserted in tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def prior_events_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    id_col: str = "event_id",
    time_col: str = "ts",
    lookback: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """(event_id, prior_event_id) pairs: for every left event, the
    right events of the same key strictly earlier but within
    `lookback`. Pass the same frame twice for the self-join form.

    ``how="left_outer"`` keeps match-less left events with a NULL
    prior_event_id — under streaming, Spark holds the left row in
    state until the watermark proves no matching right row can still
    arrive, THEN emits the null row; the outer result is therefore
    only complete once the watermark has passed `ts + lookback` for
    every left event (tests push it past the end with flush events).
    """
    l_side = left.select(F.col(key), F.col(id_col), F.col(time_col))
    r_side = right.select(
        F.col(key).alias("__rkey"),
        F.col(id_col).alias("prior_event_id"),
        F.col(time_col).alias("__rts"),
    )
    if l_side.isStreaming:
        l_side = l_side.withWatermark(time_col, watermark)
    if r_side.isStreaming:
        r_side = r_side.withWatermark("__rts", watermark)
    cond = (
        (F.col(key) == F.col("__rkey"))
        & (F.col("__rts") < F.col(time_col))
        & (F.col("__rts") >= F.col(time_col) - F.expr(f"INTERVAL {lookback}"))
    )
    return l_side.join(r_side, cond, how).select(id_col, "prior_event_id")
