"""Catalog fetch surface + concurrent table materialization
(SURVEY.md §2.1 sink_fetch_df, §2.11 thread-pool parallelism)."""

from __future__ import annotations

import tempfile

from build_datawarehouse_demo_spark.sources.catalog import fetch_df, show_tables
from build_datawarehouse_demo_spark.sources.writers import save_tables_concurrent


def test_fetch_df_returns_pandas(spark):
    pdf = fetch_df(spark, "SELECT 1 AS a, 'x' AS b")
    assert list(pdf.columns) == ["a", "b"]
    assert pdf.iloc[0].tolist() == [1, "x"]


def test_save_tables_concurrent(spark):
    dfs = {
        f"conc_t{i}": spark.range(100 * (i + 1)).selectExpr("id", f"id * {i} AS v")
        for i in range(4)
    }
    dfs["conc_empty"] = spark.createDataFrame([], "id long, v long")
    with tempfile.TemporaryDirectory() as d:
        written = save_tables_concurrent(dfs, base_path=d, max_workers=4)
        assert written["conc_empty"] is False
        assert all(written[f"conc_t{i}"] for i in range(4))
        assert spark.table("conc_t2").count() == 300
        names = {r.tableName for r in show_tables(spark).collect()}
        assert {"conc_t0", "conc_t1", "conc_t2", "conc_t3"} <= names
        for n in dfs:
            spark.sql(f"DROP TABLE IF EXISTS {n}")
