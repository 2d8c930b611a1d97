"""Join operators (SURVEY.md §2.3).

All reference joins are small-dimension broadcast-shaped: either
`pd.merge` against a just-deduplicated dim
(/root/reference/transformation.py:163-168,191-196,396,406) or a
hand-rolled dict lookup against dim_datetime
(/root/reference/transformation.py:334-338,423-427,454-458). The dict
lookup IS a broadcast hash join — here it is declared as one and the
planner (or the explicit hint) does the rest. At scale, AQE converts
eligible joins at runtime; the explicit `broadcast()` below is for the
dims we generate ourselves and therefore know are small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def broadcast_dim_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Equi-join a fact to a small dimension, dimension broadcast.

    `how='inner'` drops misses (the checkin pattern,
    /root/reference/transformation.py:269); `how='left'` keeps them as
    nulls (the review/tip/weather pattern,
    /root/reference/transformation.py:351,436,470,503).
    """
    return fact.join(F.broadcast(dim), on, how)


def resolve_datetime_id(
    fact: DataFrame,
    dim_datetime: DataFrame,
    fact_date_expr,
    *,
    fmt: str = "yyyy-MM-dd",
    drop_miss: bool = False,
    id_col: str = "datetime_id",
) -> DataFrame:
    """The reference's date-resolution pattern: map a date-ish fact
    column to `datetime_id` through the calendar spine
    (/root/reference/transformation.py:249-269,334-351,423-436).

    `fact_date_expr` is any Column yielding a 'yyyy-MM-dd'-style string
    (pass `F.date_format(col, ...)` / `F.trim(...)` as needed). The
    spine side is keyed on `date_format(full_timestamp, fmt)`.

    Note: the reference's review transform builds its lookup keyed
    '%Y%m%d' but probes with '%Y-%m-%d'
    (/root/reference/transformation.py:336 vs :348) so every review got
    a null id — a latent bug. This helper implements the evident
    intent (consistent format on both sides, as the tip transform does
    at /root/reference/transformation.py:425,433).
    """
    dim_keyed = dim_datetime.select(
        F.date_format("full_timestamp", fmt).alias("__date_key"),
        F.col(id_col),
    )
    out = (
        fact.withColumn("__date_key", fact_date_expr)
        .join(F.broadcast(dim_keyed), "__date_key", "inner" if drop_miss else "left")
        .drop("__date_key")
    )
    return out
