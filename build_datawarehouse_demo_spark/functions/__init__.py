"""Scalar expression kits (SURVEY.md §2.8) — reusable Column builders
shared by generators, the star-schema plan, and the registry."""

from build_datawarehouse_demo_spark.functions.datetime_kit import (
    date_id,
    date_parts,
    iso_date,
    weekday_name,
)
from build_datawarehouse_demo_spark.functions.strings import (
    split_get_int,
    trimmed,
    zero_pad,
)

__all__ = [
    "date_id",
    "date_parts",
    "iso_date",
    "weekday_name",
    "split_get_int",
    "trimmed",
    "zero_pad",
]
