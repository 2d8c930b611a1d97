"""Custom stateful streaming operator with a batch-equivalent twin
(SURVEY.md §2.9 extension; VERDICT round 1, item 8).

`user_running_totals` is ONE definition with two physical forms:

- batch input -> a plain groupBy aggregate (the final state each user
  would reach), oracle-checkable in ANSI SQL — this is the registered
  registry entry;
- streaming input -> `applyInPandasWithState`: per-user state
  (n_events, total_value, last event time) accumulated across
  micro-batches, one update row emitted per user per batch. This is
  the shape windows can't express — arbitrary per-key state with
  user-defined merge logic — and the scale contract is Spark's state
  store: state is partitioned by user_id across executors, sized by
  #users not #events.

Equivalence (the final streamed update per user equals the batch
aggregate) is asserted in tests/test_streaming.py.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CENT = Decimal("0.01")

USER_TOTALS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_ts", T.TimestampType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total_cents", T.LongType()),
        T.StructField("last_us", T.LongType()),
    ]
)


def user_running_totals(events: DataFrame) -> DataFrame:
    """Per-user running (event count, value total, latest event time).

    Batch mode returns the final totals directly; streaming mode
    maintains them as explicit keyed state and emits the running value
    every micro-batch. Both sides accumulate money as EXACT integer
    cents with half-away-from-zero per-row rounding — the streaming
    state mirrors the batch DECIMAL(18,2) cast (Spark HALF_UP)
    bit-for-bit, so batch ≡ streaming holds exactly: no pandas
    banker's-rounding divergence at half-cent values, no float drift
    at large totals.
    """
    if events.isStreaming:
        return _running_totals_stream(events)
    price = F.col("value").cast("decimal(18,2)")
    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(price).cast("double").alias("total_value"),
        F.max("ts").alias("last_ts"),
    )


def _running_totals_stream(events: DataFrame) -> DataFrame:
    import numpy as np
    import pandas as pd

    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        n, total_cents, last_us = state.get if state.exists else (0, 0, None)
        for pdf in pdfs:
            if not len(pdf):
                continue
            n += len(pdf)
            # per-row cast to integer cents mirroring Spark's
            # CAST(value AS DECIMAL(18,2)) EXACTLY: the JVM casts via
            # the double's shortest decimal repr (Double.toString)
            # then rounds HALF_UP — so 2.675 -> "2.675" -> 2.68, even
            # though 2.675*100.0 in float64 is 267.4999…, which is why
            # arithmetic tricks like floor(|v|*100+0.5) diverge on
            # 3-decimal half-cent inputs. Python's repr(float) is the
            # same shortest repr, so Decimal(repr(v)) reproduces the
            # JVM path bit-for-bit. Null values arrive as NaN and are
            # skipped, exactly as the batch F.sum skips SQL nulls.
            v = pdf["value"].to_numpy(dtype="float64")
            v = v[~np.isnan(v)]
            if len(v):
                total_cents += sum(
                    int(
                        Decimal(repr(float(x)))
                        .quantize(_CENT, rounding=ROUND_HALF_UP)
                        .scaleb(2)
                    )
                    for x in v
                )
            # null ts arrive as NaT; dropna mirrors batch F.max's
            # null-skipping (NaT.value is -2^63, not a timestamp)
            ts_valid = pdf["ts"].dropna()
            if len(ts_valid):
                batch_last = int(ts_valid.max().value // 1000)
                last_us = batch_last if last_us is None else max(last_us, batch_last)
        state.update((n, total_cents, last_us))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total_cents / 100.0],
                "last_ts": [pd.Timestamp(last_us * 1000) if last_us is not None else None],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update, USER_TOTALS_SCHEMA, _STATE_SCHEMA, "update", GroupStateTimeout.NoTimeout
    )


TYPE_COUNTS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def user_event_type_counts(events: DataFrame) -> DataFrame:
    """Per-(user, event_type) running counts — the transformWithState
    flavor of the stateful surface (Spark 4's successor API to
    applyInPandasWithState, used by user_running_totals above).

    Batch input -> plain groupBy count (the final state; the
    registered, oracle-checked form). Streaming input -> a
    StatefulProcessor holding ONE MapState per user keyed by
    event_type: composable typed state (Value/List/Map + timers + TTL)
    instead of a single monolithic state tuple, still partitioned by
    key across executors and sized by #users x #types, not #events.
    Each micro-batch emits the updated (user, type) counts only.
    """
    if not events.isStreaming:
        return events.groupBy("user_id", "event_type").agg(
            F.count(F.lit(1)).alias("n_events")
        )
    return _event_type_counts_stream(events)


def _event_type_counts_stream(events: DataFrame) -> DataFrame:
    import pandas as pd

    # transformWithState's state server speaks protobuf between the JVM
    # and a Python driver worker; without it the worker crashes with an
    # opaque "exited unexpectedly". Probe up front and fail precisely
    # (same capability-gate convention as sources/formats.py).
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "transformWithStateInPandas needs the 'protobuf' package on the "
            "driver and executors (pip install protobuf); its state-server "
            "protocol is protobuf-encoded. The batch form of "
            "user_event_type_counts works without it."
        ) from exc

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _TypeCounts(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._counts = handle.getMapState("counts", "event_type string", "n long")

        def handleInputRows(self, key, rows, timer_values):
            batch: dict[str, int] = {}
            for pdf in rows:
                if not len(pdf):
                    continue
                for et, c in pdf.groupby("event_type").size().items():
                    batch[et] = batch.get(et, 0) + int(c)
            updated: dict[str, int] = {}
            for et, c in batch.items():
                prev = (
                    self._counts.getValue((et,))[0]
                    if self._counts.containsKey((et,))
                    else 0
                )
                total = prev + c
                self._counts.updateValue((et,), (total,))
                updated[et] = total
            if updated:
                yield pd.DataFrame(
                    {
                        "user_id": [key[0]] * len(updated),
                        "event_type": list(updated),
                        "n_events": list(updated.values()),
                    }
                )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_TypeCounts(),
        outputStructType=TYPE_COUNTS_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
