"""Sources & sinks: typed readers, warehouse table sink, catalog helpers,
and generated dimensions (SURVEY.md §2.1)."""

from build_datawarehouse_demo_spark.sources.readers import (
    read_csv,
    read_json_lines,
    read_parquet,
    load_star_tables,
    register_star_views,
)
from build_datawarehouse_demo_spark.sources.writers import save_tables, save_table
from build_datawarehouse_demo_spark.sources.catalog import show_tables, fetch_df
from build_datawarehouse_demo_spark.sources.generators import (
    gen_date_range,
    gen_hour_dim,
)

__all__ = [
    "read_csv",
    "read_json_lines",
    "read_parquet",
    "load_star_tables",
    "register_star_views",
    "save_tables",
    "save_table",
    "show_tables",
    "fetch_df",
    "gen_date_range",
    "gen_hour_dim",
]
