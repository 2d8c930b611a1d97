"""Date/time expression kit (SURVEY.md §2.8: `fn_date_format`,
`fn_date_parts`, `fn_to_timestamp`).

The reference reaches for strftime/dt-accessor per column
(/root/reference/transformation.py:100-135); here each shape is one
reusable Column builder, JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def date_id(col: str | Column) -> Column:
    """Smart key yyyymmdd as int (/root/reference/transformation.py:100)."""
    return F.date_format(_c(col), "yyyyMMdd").cast("int")


def iso_date(col: str | Column) -> Column:
    """'yyyy-MM-dd' string key (/root/reference/transformation.py:249)."""
    return F.date_format(_c(col), "yyyy-MM-dd")


def weekday_name(col: str | Column) -> Column:
    """Full weekday name (`dt.day_name()`,
    /root/reference/transformation.py:103)."""
    return F.date_format(_c(col), "EEEE")


def date_parts(col: str | Column) -> dict[str, Column]:
    """The reference's full part set, under the reference's own column
    names (/root/reference/transformation.py:103-107: `day_of_week`,
    `day_of_month`, `month`, `year`, `quarter`)."""
    c = _c(col)
    return {
        "day_of_week": weekday_name(c),
        "day_of_month": F.dayofmonth(c).cast("int"),
        "month": F.month(c).cast("int"),
        "year": F.year(c).cast("int"),
        "quarter": F.quarter(c).cast("int"),
    }
