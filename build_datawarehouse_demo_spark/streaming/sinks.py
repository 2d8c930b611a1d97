"""Streaming sinks: foreachBatch upsert — the effectively-exactly-once
ingest pattern.

Structured Streaming's file/kafka sources give at-least-once delivery
into foreachBatch; making the BATCH APPLY idempotent (replaying the
same micro-batch converges to the same table state) upgrades the
pipeline to effectively exactly-once without any sink-side
transaction support. The apply here is: collapse the batch to
last-change-wins per key, then key-upsert into the target table —
both pure functions of (table state, batch contents), so a
checkpoint-replayed batch is a no-op.

Scale notes: the overwrite-the-whole-table step is the plain-parquet
stand-in for a real MERGE target (Delta/Iceberg, capability-gated in
sources/formats.py) — at 100 TB the upsert output would go through a
partitioned MERGE touching only affected partitions. The collapse +
anti-join shapes are exactly what that MERGE executes underneath.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from build_datawarehouse_demo_spark.operators.scd import apply_cdc_changes, upsert


def apply_batch_upsert(
    spark,
    batch_df: DataFrame,
    table_name: str,
    key_cols: list[str],
    order_cols: list[str],
) -> None:
    """Idempotently fold one micro-batch into `table_name`.

    Collapse the batch to its last change per key (order_cols must end
    in a unique tiebreak), then upsert into the current table state.
    localCheckpoint breaks the read-from/write-to-same-table cycle
    that a parquet overwrite cannot express (a lakehouse MERGE target
    needs no such step).
    """
    collapsed = apply_cdc_changes(
        batch_df, key_cols=key_cols, order_cols=order_cols, op_col=None
    )
    if not spark.catalog.tableExists(table_name):
        collapsed.write.mode("overwrite").format("parquet").saveAsTable(table_name)
        return
    current = spark.table(table_name)
    merged = upsert(current, collapsed, key=key_cols).localCheckpoint()
    merged.write.mode("overwrite").format("parquet").saveAsTable(table_name)


def stream_upsert_to_table(
    events: DataFrame,
    table_name: str,
    key_cols: list[str],
    order_cols: list[str],
    checkpoint_dir: str,
):
    """foreachBatch writer: returns the started StreamingQuery.

    Checkpointing pins batch ids; apply_batch_upsert makes replays
    converge — together: effectively exactly-once.
    """

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        apply_batch_upsert(
            batch_df.sparkSession, batch_df, table_name, key_cols, order_cols
        )

    return (
        events.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
