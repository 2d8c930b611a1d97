"""String expression kit (SURVEY.md §2.8: `fn_string_split`,
`fn_trim`, `fn_format_pad`, `fn_cast`)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def zero_pad(col: str | Column, width: int = 2) -> Column:
    """f'{x:02d}'-style label (/root/reference/transformation.py:123)."""
    return F.lpad(_c(col).cast("string"), width, "0")


def trimmed(col: str | Column) -> Column:
    """str.strip() (/root/reference/transformation.py:260)."""
    return F.trim(_c(col))


def split_get_int(col: str | Column, sep: str, index: int) -> Column:
    """split + positional get + int cast, null on malformed input
    (the hour-parse shape, /root/reference/transformation.py:207-210).
    try_cast: ANSI mode would otherwise abort on garbage."""
    return F.split(_c(col), sep).getItem(index).try_cast("int")
