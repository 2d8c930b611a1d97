"""Unnesting / flattening — the reference's signature operator family
(SURVEY.md §2.7).

Every one of the reference's row-at-a-time `iterrows()` loops
(/root/reference/transformation.py:149-155,174-182,201-225,304-322)
becomes a single vectorized Catalyst expression here: `explode(split)`,
`explode(map)`, `from_json` + `explode_outer`. Zero Python UDFs — the
whole family stays inside whole-stage codegen, which is what makes it
survive a 100 TB scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def explode_delimited(
    df: DataFrame,
    col: str,
    out_col: str,
    *,
    keep_cols: tuple[str, ...] = (),
    sep: str = r",\s*",
    drop_empty: bool = True,
) -> DataFrame:
    """Comma-delimited string list -> one row per element.

    Covers the reference's categories / elite / friends / checkin-date
    loops (/root/reference/transformation.py:149-155,252-260,389-393,
    399-403). `drop_empty` mirrors its non-null & != '' guards
    (/root/reference/transformation.py:151,393,403).
    """
    # drop_empty=False promises ALL input rows survive — that needs
    # explode_outer, since plain explode silently discards rows whose
    # source column is null (split(null) -> null array -> no rows).
    ex = F.explode(F.split(F.col(col), sep)) if drop_empty else F.explode_outer(
        F.split(F.col(col), sep)
    )
    out = df.select(*keep_cols, ex.alias(out_col))
    out = out.withColumn(out_col, F.trim(F.col(out_col)))
    if drop_empty:
        out = out.filter(F.col(out_col).isNotNull() & (F.col(out_col) != ""))
    return out


def explode_map(
    df: DataFrame,
    map_col: str,
    *,
    keep_cols: tuple[str, ...] = (),
    key_alias: str = "key",
    value_alias: str = "value",
) -> DataFrame:
    """Map column -> (key, value) rows — the attributes/hours unnest
    (/root/reference/transformation.py:174-182,201-225). The per-row
    `isinstance(x, dict)` guard (/root/reference/transformation.py:176)
    is unnecessary under a typed MapType schema; explode skips nulls.
    """
    kv = F.explode(F.col(map_col))
    return df.select(*keep_cols, kv).withColumnsRenamed({"key": key_alias, "value": value_alias})


def explode_json_array(
    df: DataFrame,
    json_col: str,
    element_schema: T.StructType,
    *,
    keep_cols: tuple[str, ...] = (),
    element_alias: str = "element",
    outer: bool = True,
) -> DataFrame:
    """JSON-string-encoded array of objects -> one row per element with
    struct fields (the covid `highlights` unnest,
    /root/reference/transformation.py:304-322). `from_json` yields null
    on malformed input, matching the reference's try/except -> empty
    list (/root/reference/transformation.py:311-312); `outer` keeps the
    row with a null element in that case.
    """
    parsed = F.from_json(F.col(json_col), T.ArrayType(element_schema))
    ex = F.explode_outer(parsed) if outer else F.explode(parsed)
    return df.select(*keep_cols, ex.alias(element_alias))


def parse_hour_ranges(
    df: DataFrame,
    map_col: str = "hours",
    *,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """`{day: "H:M-H:M"}` map -> per-day rows under the reference's
    exact column set: day_of_week, open_time / close_time (the raw
    range halves) and int open_hour_id / close_hour_id % 24
    (/root/reference/transformation.py:201-229).

    Unparseable entries become nulls and are filtered — the Spark
    equivalent of the reference's warn-and-skip
    (/root/reference/transformation.py:224-225). `pmod` (not `%`)
    matches Python's non-negative modulo on the 24h wrap
    (/root/reference/transformation.py:210).
    """
    kv = explode_map(df, map_col, keep_cols=keep_cols, key_alias="day_of_week", value_alias="time_range")
    parts = F.split(F.col("time_range"), "-")
    # try_cast, not cast: under ANSI mode (Spark 4 default) a malformed
    # hour would abort the job; the reference warns-and-skips instead
    # (/root/reference/transformation.py:224-225).
    open_h = F.split(parts.getItem(0), ":").getItem(0).try_cast("int")
    close_h = F.pmod(F.split(parts.getItem(1), ":").getItem(0).try_cast("int"), F.lit(24))
    return (
        kv.withColumn("open_time", parts.getItem(0))
        .withColumn("close_time", parts.getItem(1))
        .withColumn("open_hour_id", open_h)
        .withColumn("close_hour_id", close_h)
        .filter(F.col("open_hour_id").isNotNull() & F.col("close_hour_id").isNotNull())
        .drop("time_range")
    )


def filter_not_null_not_empty(df: DataFrame, col: str) -> DataFrame:
    """Reference guard `notnull() & != ''`
    (/root/reference/transformation.py:151,393,403)."""
    return df.filter(F.col(col).isNotNull() & (F.col(col) != ""))
