"""Streaming deduplication with watermark-bounded state (VERDICT
round 2, item 7) — the op an at-least-once ingest pipeline actually
runs: the source may redeliver an event (task retry, producer resend),
and exactly one copy must survive.

ONE definition, two physical forms (the stateful.py pattern):

- batch input -> plain ``dropDuplicates`` on the id column. With
  at-least-once redelivery the duplicate rows are identical copies, so
  keeping "an arbitrary one" is deterministic — the registered registry
  entry states it against a DISTINCT oracle;
- streaming input -> ``dropDuplicatesWithinWatermark``: per-id state
  survives across micro-batches (a redelivery in a LATER batch is
  still dropped) but is evicted once the watermark passes the id's
  event time — the scale contract at 100 TB/day is that state is
  bounded by ids-per-watermark-window, not ids-ever-seen. Plain
  streaming ``dropDuplicates`` on the id alone would grow state
  forever; including the timestamp in the key would stop treating a
  redelivery with a perturbed timestamp as a duplicate.

Batch ≡ streaming (duplicates delivered across DIFFERENT micro-batches
collapse to one row) is asserted in tests/test_streaming_dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_event_stream(
    events: DataFrame,
    id_cols: tuple[str, ...] = ("event_id",),
    event_time_col: str = "ts",
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Keep exactly one copy per id (see module docstring).

    watermark_delay bounds BOTH lateness and the redelivery horizon:
    a duplicate arriving more than `watermark_delay` after the
    original's event time may not be caught (its state was evicted) —
    pick it from the source's documented redelivery window.
    """
    if events.isStreaming:
        return events.withWatermark(
            event_time_col, watermark_delay
        ).dropDuplicatesWithinWatermark(list(id_cols))
    return events.dropDuplicates(list(id_cols))
