"""Catalog / interactive-query helpers (SURVEY.md §2.1, EP3).

The reference's interactive surface is a DuckDB connection:
`SHOW TABLES` + `SELECT ... LIMIT` fetched to pandas
(/root/reference/test_sql.py:5-14). Ours is `spark.sql` over the
session catalog with Arrow-accelerated `toPandas`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def show_tables(spark: SparkSession) -> DataFrame:
    """Enumerate warehouse tables (reference /root/reference/test_sql.py:8)."""
    return spark.sql("SHOW TABLES")


def fetch_df(spark: SparkSession, sql: str):
    """Run SQL, fetch the result as a pandas DataFrame
    (reference `fetchdf()`, /root/reference/test_sql.py:8,14).
    Arrow handles the driver transfer; never use this inside a
    transform — it is the client boundary, not an operator."""
    return spark.sql(sql).toPandas()
