"""File-level MERGE INTO over partitioned parquet.

The reference sinks whole tables (load.py:35-54 overwrite semantics);
lakehouse formats with a transactional MERGE are capability-gated in
this container (sources/formats.py). This module supplies the missing
upsert-at-the-storage-layer: merge-as-rewrite over a parquet directory
partitioned by one column —

1. the change feed names the partitions it touches (it must carry the
   partition column; a key's partition is IMMUTABLE under this
   contract, the standard assumption for partitioned upserts — moving
   a key is a delete in one partition plus an insert in another).
   Use int or plain-string partition values: Spark's partition-column
   type inference on readback must yield the same type the feed
   carries, or the union fails loudly (date-LOOKING strings infer as
   DATE — prefer an int day key, as the registered entry does);
2. only target partitions intersecting the feed's partition values are
   READ (partition pruning does the file skipping);
3. the feed collapses last-change-wins per key
   (operators/scd.py:apply_cdc_changes — same op_col/tombstone
   semantics), surviving upserts replace matched target rows, deletes
   drop them, unmatched keys insert;
4. only touched partitions are REWRITTEN
   (`spark.sql.sources.partitionOverwriteMode=dynamic` scoped to the
   one write); untouched partitions' files are never opened or
   replaced (file-listing-asserted in tests/test_merge.py).

Idempotent by construction: re-applying the same feed converges to the
same state (pytest replay test, the same contract as the foreachBatch
idempotent sink).

Scale note: the new state of touched partitions is localCheckpoint'ed
before the write because Spark cannot overwrite a path it is currently
reading. That materialization is bounded by the touched-partition
volume — the working set a MERGE rewrites anyway. A table format with
a transaction log (Delta/Iceberg) replaces this with an atomic commit;
this operator is the format-free equivalent, and deliberately keeps
the same call shape so swapping the sink is a one-line change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from build_datawarehouse_demo_spark.operators.scd import apply_cdc_changes


def merge_into_partitioned_parquet(
    spark: SparkSession,
    target_path: str,
    changes: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    partition_col: str,
    op_col: str | None = "op",
    delete_op: str = "D",
    version_aware: bool = False,
) -> list:
    """Apply a CDC change feed to a partitioned parquet table in
    place, rewriting only touched partitions. Returns the touched
    partition values (sorted) so callers/tests can audit the blast
    radius.

    ``version_aware=False`` (default): the feed unconditionally
    replaces matched keys — correct when batches arrive log-ordered
    per key (the standard CDC topic contract).
    ``version_aware=True``: the target rows compete with the feed
    under the same ``order_cols`` ordering — an OLD change arriving
    after a newer one is a no-op, the MERGE condition
    ``source.order > target.order`` of a lakehouse sink. Requires the
    target to CARRY the order columns (the bootstrap write keeps
    them).
    """
    part_vals = [
        r[0] for r in changes.select(partition_col).distinct().collect()
    ]
    if not part_vals:
        return []

    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    tpath = jvm.org.apache.hadoop.fs.Path(target_path)
    if not tpath.getFileSystem(hconf).exists(tpath):
        # bootstrap: no target yet (first micro-batch of a streaming
        # merge sink) — the collapsed feed IS the initial state
        bootstrap = apply_cdc_changes(
            changes, key_cols, order_cols, op_col=op_col, delete_op=delete_op
        ).drop(*([op_col] if op_col else []))
        bootstrap.write.mode("overwrite").partitionBy(partition_col).parquet(
            target_path
        )
        return sorted(part_vals)

    target = spark.read.parquet(target_path)
    data_cols = [c for c in target.columns]
    touched = target.where(F.col(partition_col).isin(part_vals))

    if version_aware:
        # target rows enter the same last-change-wins contest as the
        # feed: tag them as plain upserts at their STORED order values,
        # so a stale feed change loses to the row already in the table
        tag = [op_col] if op_col else []
        combined = (
            touched.withColumns({c: F.lit("U") for c in tag})
            .select(*data_cols, *tag)
            .unionByName(changes.select(*data_cols, *tag))
        )
        # one last-change-wins pass over everything: contested keys
        # resolve by order, keys absent from the feed win trivially as
        # their own only row — no separate anti-join needed
        new_state = apply_cdc_changes(
            combined, key_cols, order_cols, op_col=op_col, delete_op=delete_op
        ).select(*data_cols)
    else:
        # collapse the feed: last change per key wins, tombstones drop
        collapsed = apply_cdc_changes(
            changes, key_cols, order_cols, op_col=op_col, delete_op=delete_op
        ).select(*data_cols)
        # delete keys = keys whose LAST change is a tombstone: they must
        # leave the target, and they are exactly the feed keys absent
        # from `collapsed`
        feed_keys = changes.select(*key_cols).distinct()

        kept = touched.join(feed_keys, on=key_cols, how="left_anti")
        new_state = kept.unionByName(collapsed)

    # materialize before overwriting the path being read; scope the
    # dynamic-overwrite conf to this one write
    new_state = new_state.localCheckpoint(eager=True)
    conf_key = "spark.sql.sources.partitionOverwriteMode"
    prior = spark.conf.get(conf_key, None)
    try:
        spark.conf.set(conf_key, "dynamic")
        (
            new_state.write.mode("overwrite")
            .partitionBy(partition_col)
            .parquet(target_path)
        )
    finally:
        if prior is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prior)

    # dynamic overwrite only replaces partitions PRESENT in the output:
    # a partition whose rows were all deleted emits nothing and would
    # keep its stale files — drop those directories explicitly
    present = {r[0] for r in new_state.select(partition_col).distinct().collect()}
    vanished = [v for v in part_vals if v not in present]
    if vanished:
        jvm = spark._jvm
        hconf = spark._jsc.hadoopConfiguration()
        for v in vanished:
            p = jvm.org.apache.hadoop.fs.Path(f"{target_path}/{partition_col}={v}")
            fs = p.getFileSystem(hconf)
            fs.delete(p, True)
    return sorted(part_vals)
