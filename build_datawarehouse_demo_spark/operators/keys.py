"""Surrogate-key generation (SURVEY.md §1.4, op `key_surrogate_rownum`).

The reference assigns 1-based positional ids with `np.arange`/`index+1`
(/root/reference/transformation.py:160,188,277,395,405,442) — an
artifact of single-process pandas where "position" is well-defined.
Distributed, position must be made explicit:

- `surrogate_key_rownum`: `row_number()` over an explicit natural-key
  ordering. Deterministic and contiguous (oracle-parity mode), but the
  unpartitioned window funnels through one task — fine for dimension
  tables (they are small by definition), wrong for facts.
- `surrogate_key_scalable`: zipWithIndex-style two-phase id — compute
  per-partition counts, then offset within partitions. Contiguous,
  parallel, for fact-scale key assignment at 100 TB. Deterministic only
  up to the input partitioning, so keys are stable given a sorted
  source but not across arbitrary re-reads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# frames pinned by surrogate_key_scalable, released by
# release_pinned_caches() once the enclosing build is materialized —
# the cache-hygiene contract VERDICT round 1 item 6 asked for (without
# it, long-lived sessions building many warehouses leak cached blocks).
_PINNED: list[DataFrame] = []


def release_pinned_caches() -> int:
    """Unpersist every frame pinned by surrogate_key_scalable.

    Call AFTER the derived outputs are materialized (written/collected)
    — writers.save_tables/save_tables_concurrent do it automatically.
    Re-materializing a surrogate-keyed plan after release recomputes
    the ids; that is only guaranteed stable for deterministic sources
    (see surrogate_key_scalable's determinism note).

    Returns the number of frames released.
    """
    n = 0
    while _PINNED:
        _PINNED.pop().unpersist()
        n += 1
    return n


def surrogate_key_rownum(df: DataFrame, order_by: tuple[str, ...], key_col: str = "id") -> DataFrame:
    """Dense 1-based contiguous ids via a global row_number() window.

    Use for small deduplicated dimensions only — the empty
    partitionBy funnels all rows through a single task by design
    (that is what "global contiguous" costs).
    """
    w = Window.orderBy(*[F.col(c) for c in order_by])
    return df.withColumn(key_col, F.row_number().over(w))


def surrogate_key_scalable(df: DataFrame, key_col: str = "id", start: int = 1) -> DataFrame:
    """Contiguous ids without a single-partition window.

    zipWithIndex semantics in pure DataFrame ops (no Python RDD
    round-trip — rows never leave the JVM):

    1. `monotonically_increasing_id()` encodes (partition << 33 | seq),
       so `mono - (pid << 33)` is the row's position in its partition;
    2. per-partition counts (a tiny aggregate — one row per partition)
       become cumulative offsets on the driver;
    3. id = offset[pid] + position + start, applied via a broadcast
       join on pid.

    This is the distributed replacement for `np.arange(1, len+1)`
    (/root/reference/transformation.py:160) at fact scale: two narrow
    passes + one broadcast, no global sort, no single-task window.
    """
    tagged = df.withColumn("__pid", F.spark_partition_id()).withColumn(
        "__pos", F.monotonically_increasing_id() - F.shiftleft(F.spark_partition_id().cast("long"), 33)
    )
    # persist: the tagged frame is evaluated twice (counts collect +
    # final output). Without pinning it, a non-deterministic upstream
    # (sample, round-robin repartition, AQE re-coalesce) could lay out
    # partitions differently between the two jobs — mismatched counts
    # would assign overlapping ids or silently drop rows in the pid
    # join. The pin is registered module-wide; release_pinned_caches()
    # (called by writers.save_tables* after materialization) returns
    # the blocks — no leak across repeated warehouse builds.
    tagged = tagged.persist()
    _PINNED.append(tagged)
    counts = sorted(
        (r["__pid"], r["cnt"])
        for r in tagged.groupBy("__pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    )
    offsets, acc = {}, 0
    for pid, cnt in counts:
        offsets[pid] = acc
        acc += cnt
    spark = df.sparkSession
    offset_df = spark.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], "__pid int, __offset long"
    )
    return (
        tagged.join(F.broadcast(offset_df), "__pid")
        .withColumn(key_col, (F.col("__offset") + F.col("__pos") + F.lit(start)).cast("long"))
        .drop("__pid", "__pos", "__offset")
    )
