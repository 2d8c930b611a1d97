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


def _release_surrogate_pins(df: DataFrame, name: str) -> None:
    """Cache hygiene: surrogate_key_scalable pins its tagged frame for
    id stability; once THIS frame is materialized its pin has done its
    job — release it so repeated builds in one session don't
    accumulate cached blocks (VERDICT round 1, item 6). Scoped to the
    written frame: pins backing other, unwritten surrogate-keyed
    frames stay live (a blanket release would silently destabilize
    their ids on re-materialization)."""
    from build_datawarehouse_demo_spark.operators.keys import (
        outstanding_pins,
        release_pins_for,
    )

    if release_pins_for(df) == 0:
        # leak observability (ADVICE round 2): pins are keyed on the
        # EXACT frame surrogate_key_scalable returned, so writing a
        # derived frame (select/withColumn before save) releases
        # nothing. Surface it instead of leaking silently — callers
        # either save the returned frame or drain via
        # release_pinned_caches() when the batch is done.
        n = outstanding_pins()
        if n:
            log.debug(
                "save_table(%s): no pin association on written frame; "
                "%d surrogate pin(s) still cached — if this frame "
                "derives from surrogate_key_scalable, save its exact "
                "output or call release_pinned_caches() after the batch",
                name,
                n,
            )


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
    _release_surrogate_pins(df, name)
    return True


def save_tables(
    dataframes: dict[str, DataFrame], base_path: str | None = None, **kwargs
) -> dict[str, bool]:
    """Materialize a whole warehouse (the reference's `load_to_duckdb`,
    /root/reference/transformation.py:517-547). `base_path` makes each
    table external at `{base_path}/{name}`."""
    return {
        name: save_table(
            df, name, path=f"{base_path}/{name}" if base_path else None, **kwargs
        )
        for name, df in dataframes.items()
    }


def save_tables_concurrent(
    dataframes: dict[str, DataFrame],
    base_path: str | None = None,
    max_workers: int = 4,
    **kwargs,
) -> dict[str, bool]:
    """Materialize independent tables as concurrent Spark jobs — the
    engine-level analogue of the reference's ThreadPoolExecutor fan-out
    (/root/reference/transformation.py:40,619-637). Each save is an
    independent job; with `spark.scheduler.mode=FAIR` they share the
    cluster instead of queueing FIFO. Threads only submit jobs — all
    real work happens on executors."""
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        futures = {
            name: pool.submit(
                save_table,
                df,
                name,
                path=f"{base_path}/{name}" if base_path else None,
                **kwargs,
            )
            for name, df in dataframes.items()
        }
        return {name: fut.result() for name, fut in futures.items()}


def register_views(dataframes: dict[str, DataFrame]) -> None:
    """Zero-copy alternative to materialization: expose the lazy plans
    as temp views (the reference's `con.register`,
    /root/reference/transformation.py:531)."""
    for name, df in dataframes.items():
        df.createOrReplaceTempView(name)


def compact_parquet_dir(
    spark: SparkSession,
    src_path: str,
    dest_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Compact a fragmented parquet directory into ~target-sized files.

    The small-files problem is THE operational failure mode of
    long-running ingest at scale: thousands of tiny files per partition
    turn every downstream scan into a listing + open storm. Compaction
    rewrites the directory with file count = ceil(input_bytes /
    target_file_bytes), using `coalesce` (narrow — no shuffle: at 100 TB
    the rewrite streams through, it never re-shuffles the data).

    Sizes come from a filesystem listing (Hadoop FileSystem API, so the
    same code paths work for s3a/hdfs), not from row counts — row width
    varies; bytes are what the scan cost depends on. Returns the number
    of output files written.
    """
    import math

    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(src_path)
    fs = jpath.getFileSystem(hconf)
    if not fs.exists(jpath):
        raise ValueError(f"no parquet data under {src_path}")
    it = fs.listFiles(jpath, True)
    total_bytes = 0
    while it.hasNext():
        f = it.next()
        if f.getPath().getName().endswith(".parquet"):
            total_bytes += f.getLen()
    if total_bytes == 0:
        raise ValueError(f"no parquet data under {src_path}")
    n_files = max(1, math.ceil(total_bytes / target_file_bytes))
    df = spark.read.parquet(src_path)
    df.coalesce(n_files).write.mode("overwrite").parquet(dest_path)
    return n_files


def write_clustered(
    df: DataFrame, path: str, cluster_cols: tuple[str, ...], n_files: int = 8
) -> None:
    """Range-partitioned, sorted ("clustered") write: rows are range-
    partitioned on the cluster key, sorted within each partition, and
    written one file per partition — so every file covers a narrow,
    near-disjoint key range and its parquet min/max row-group stats
    let filtered scans SKIP whole files (the poor-man's Z-order for a
    single key; at 100 TB this is how a time-range query avoids
    touching years of data that partition pruning alone can't skip).
    One range shuffle (sampled boundaries) + a local sort — no global
    sort. tests/test_scale_layout.py asserts the written files' stat
    ranges are pairwise disjoint.
    """
    from pyspark.sql import functions as F

    (
        df.repartitionByRange(n_files, *[F.col(c) for c in cluster_cols])
        .sortWithinPartitions(*cluster_cols)
        .write.mode("overwrite")
        .parquet(path)
    )


def _morton_code(xcol, ycol, bits: int):
    """Interleave the low `bits` of two non-negative long columns into
    one Z-value (x in even positions, y in odd). Pure bitwise
    expression tree — constant-folded, JVM-side, no UDF."""
    from pyspark.sql import functions as F

    z = F.lit(0).cast("long")
    for b in range(bits):
        z = z.bitwiseOR(F.shiftleft(F.shiftright(xcol, b).bitwiseAND(F.lit(1)), 2 * b))
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(ycol, b).bitwiseAND(F.lit(1)), 2 * b + 1)
        )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    col_x: str,
    col_y: str,
    n_files: int = 16,
    bits: int = 16,
) -> None:
    """Z-order (Morton-curve) clustered write over TWO numeric columns.

    write_clustered gives file skipping on one key; interleaving the
    bits of two min-max-normalized keys gives a single sort order
    whose ranges are compact in BOTH dimensions — a 2-D box predicate
    skips most files via parquet min/max stats, which no single-column
    sort can do for both dims at once (the Delta/Iceberg OPTIMIZE
    ZORDER idea, as a plain parquet layout).

    One stats pass (two scalar min/max pairs to the driver —
    bounded), one range shuffle on the z-value, local sorts, one file
    per range. Min-max normalization is skew-sensitive: for heavily
    skewed keys, rank-normalize upstream first. Numeric/timestamp-free
    demo scope: both columns are cast to double for scaling.

    tests/test_scale_layout.py asserts the written files stay compact
    in both dimensions.
    """
    from pyspark.sql import functions as F

    stats = df.agg(
        F.min(F.col(col_x).cast("double")).alias("xmin"),
        F.max(F.col(col_x).cast("double")).alias("xmax"),
        F.min(F.col(col_y).cast("double")).alias("ymin"),
        F.max(F.col(col_y).cast("double")).alias("ymax"),
    ).first()
    top = float(2**bits - 1)

    def scaled(c: str, mn, mx):
        if mn is None or mx is None or mx == mn:
            return F.lit(0).cast("long")
        return (
            ((F.col(c).cast("double") - F.lit(float(mn)))
             / F.lit(float(mx) - float(mn)) * F.lit(top))
            .cast("long")
        )

    z = _morton_code(
        scaled(col_x, stats["xmin"], stats["xmax"]),
        scaled(col_y, stats["ymin"], stats["ymax"]),
        bits,
    )
    (
        df.withColumn("__zval", z)
        .repartitionByRange(n_files, F.col("__zval"))
        .sortWithinPartitions("__zval")
        .drop("__zval")
        .write.mode("overwrite")
        .parquet(path)
    )
