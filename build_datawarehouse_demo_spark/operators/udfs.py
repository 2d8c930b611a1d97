"""Vectorized Python UDF surface (SURVEY.md §2.10).

The reference's 'UDFs' are ad-hoc pandas row loops, all replaced by
built-in expressions (§2.7) — zero Python needed for parity. This
module is the engine's sanctioned escape hatch for logic that truly
needs Python: Arrow-batched pandas UDFs (scalar / grouped-agg) and
grouped-map applyInPandas. Row-at-a-time `F.udf` is deliberately NOT
exported: at 100 TB the serde tax per row is the difference between
hours and days.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


@F.pandas_udf(T.DoubleType())
def net_price(extended: pd.Series, discount: pd.Series) -> pd.Series:
    """Scalar pandas UDF: vectorized net price. Same IEEE ops per row
    as the SQL expression — bit-identical results, Arrow transfer."""
    return extended * (1.0 - discount)


def grouped_zscore(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Grouped-map applyInPandas: z-score within each group.

    The group's rows arrive as one pandas DataFrame (Arrow batch); the
    output schema is declared up front. At scale each group must fit in
    executor memory — use Window mean/stddev instead when groups are
    huge; this is the per-group-model-fit shape (the thing windows
    can't express), demonstrated on a computable statistic.

    Zero-variance convention: singleton and constant groups emit
    zscore 0.0 (deviation from the mean IS zero), where plain SQL
    ``(x-avg)/stddev_samp`` would yield NULL. The registered oracle
    mirrors this with COALESCE(.../nullif(std,0), 0.0) — the
    convention is deliberate, not drift.
    """
    out_schema = f"{group_col} string, id bigint, {value_col} double, zscore double"

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        mean = pdf[value_col].mean()
        std = pdf[value_col].std(ddof=1)
        z = (pdf[value_col] - mean) / std if std and std > 0 else pdf[value_col] * 0.0
        return pd.DataFrame(
            {
                group_col: pdf[group_col],
                "id": pdf["id"],
                value_col: pdf[value_col],
                "zscore": z,
            }
        )

    return df.groupBy(group_col).applyInPandas(per_group, schema=out_schema)


@F.pandas_udf(T.DoubleType())
def weighted_mean(value: pd.Series, weight: pd.Series) -> float:
    """Grouped-aggregate pandas UDF: Σwx / Σw per group."""
    return float((value * weight).sum() / weight.sum())
