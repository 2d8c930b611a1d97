"""SparkSession construction.

The reference has no session concept — it opens ad-hoc MinIO clients per
thread (/root/reference/transformation.py:56) and an embedded DuckDB
connection (/root/reference/transformation.py:521). Here a single
SparkSession is the engine: Catalyst supplies the logical-plan /
optimizer stage the reference lacks (SURVEY.md §4).

Scale notes (100 TB design):
- AQE on: runtime coalescing, skew-join splitting, and
  broadcast-join conversion replace the reference's hand-rolled
  dict-lookup joins (/root/reference/transformation.py:334-338).
- shuffle partitions default to cores locally; on a real cluster AQE's
  coalescing makes the static number mostly a ceiling.
- Arrow on for every pandas boundary (toPandas / pandas UDFs).
- UTC session timezone so timestamp semantics match UTC-naive engines
  (DuckDB oracle, parquet at rest).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(
    app_name: str = "build_datawarehouse_demo_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine session.

    Local mode is a single JVM; on a cluster the same configs hold —
    nothing here assumes local execution.
    """
    cpus = int(DEFAULT_CPUS)
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # 16kb floor instead of the 1MB default (r14, measured):
        # with parallelismFirst, sub-1MB shuffle stages coalesce to
        # ONE partition, serializing every small stage — on the
        # checkpoint-anchored dedup/pipeline plans that tax was ~2x
        # wall time at sf0.1 (3.1s -> 1.55s on the collapsed minhash
        # lane with the floor lowered; the whole residual "AQE tax"
        # in the r14 profiling). Scale-neutral by construction: any
        # stage whose partitions exceed 16kb coalesces exactly as
        # before, so sf1+ plans are untouched — only metadata-sized
        # stages keep their parallelism.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "16kb")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # read TIMESTAMP(NANOS) parquet columns as long instead of
        # erroring; readers.read_parquet converts them back to
        # timestamps with integer µs division (no double round-trip).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    if master or not _in_active_session():
        builder = builder.master(master or f"local[{cpus}]")
    # deployment-tuning surface (r19): semicolon-separated k=v pairs,
    # e.g. SPARK_GRAFT_EXTRA_CONF="spark.io.compression.codec=zstd;
    # spark.sql.files.maxPartitionBytes=512m". Lets a cluster deploy
    # (or an A/B measurement) set scale-dependent knobs without code
    # edits; defaults stay exactly as above so the driver's bench is
    # unaffected unless the env asks.
    for pair in filter(None, os.environ.get("SPARK_GRAFT_EXTRA_CONF", "").split(";")):
        k, _, v = pair.partition("=")
        if k.strip() and v:
            builder = builder.config(k.strip(), v.strip())
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def _in_active_session() -> bool:
    return SparkSession.getActiveSession() is not None
