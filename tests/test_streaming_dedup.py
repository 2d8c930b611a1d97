"""Streaming dedup (streaming/dedup.py): duplicates redelivered across
DIFFERENT micro-batches must still collapse to one row — that is the
property watermark-bounded keyed state buys over per-batch distinct."""

from __future__ import annotations

import tempfile

from build_datawarehouse_demo_spark.sources.readers import read_parquet
from build_datawarehouse_demo_spark.streaming.dedup import dedup_event_stream
from build_datawarehouse_demo_spark.streaming.windows import (
    read_event_stream,
    run_stream_to_memory,
)

SF_DIR = "/root/testdata/sf0.001"

COLS = ["event_id", "user_id", "event_type", "ts", "value"]


def test_event_id_determines_payload_in_testdata(spark):
    """The streaming_dedup_ids oracle (whole-row DISTINCT over a
    doubled input) is equivalent to dropDuplicates(['event_id']) only
    while event_id determines the payload. dropDuplicates keeps an
    ARBITRARY row per key, so a genuine key collision (same id,
    different payload) would make the entry nondeterministic and the
    oracle wrong — pin the invariant so regenerated testdata that
    breaks it fails loudly here, not as a driver hash mismatch."""
    from pyspark.sql import functions as F

    for sf in ("sf0.001", "sf0.01"):
        ev = read_parquet(spark, f"/root/testdata/{sf}/events.parquet")
        row = ev.agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("event_id").alias("n_ids"),
        ).collect()[0]
        assert row.n == row.n_ids, f"{sf}: duplicate event_id in testdata"


def test_stream_dedup_across_batches_equals_batch(spark):
    ev = read_parquet(spark, f"{SF_DIR}/events.parquet").select(*COLS)
    with tempfile.TemporaryDirectory() as tmpdir:
        # two identical files -> with maxFilesPerTrigger=1 every event is
        # redelivered in a LATER micro-batch, so only cross-batch state
        # can drop the copies.
        ev.coalesce(1).write.mode("overwrite").parquet(tmpdir)
        ev.coalesce(1).write.mode("append").parquet(tmpdir)

        batch = dedup_event_stream(spark.read.parquet(tmpdir).select(*COLS))
        stream = dedup_event_stream(
            read_event_stream(spark, tmpdir, max_files_per_trigger=1).select(*COLS)
        )
        assert stream.isStreaming
        run_stream_to_memory(stream, "dedup_out", output_mode="append")
        got = {tuple(r) for r in spark.sql("SELECT * FROM dedup_out").collect()}
        want = {tuple(r) for r in batch.collect()}
        n_input = spark.read.parquet(tmpdir).count()
        assert len(want) * 2 == n_input  # every row really was duplicated
        assert got == want and len(got) > 0
