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

# Cache-hygiene contract (VERDICT round 1 item 6): frames pinned by
# surrogate_key_scalable are tracked PER OUTPUT FRAME, and the writer
# releases exactly the pins belonging to the frame it just
# materialized. A blanket "release everything" on any save would
# unpersist pins of OTHER, not-yet-written surrogate-keyed frames —
# whose id stability depends on that cache (split-save and concurrent
# build patterns). _PINNED remains as the session-wide drain for
# explicit cleanup.
import threading
import weakref

_PIN_LOCK = threading.Lock()
_PINNED: list[DataFrame] = []
_FRAME_PINS: "weakref.WeakKeyDictionary[DataFrame, list[DataFrame]]" = (
    weakref.WeakKeyDictionary()
)


def release_pins_for(df: DataFrame) -> int:
    """Unpersist the pins backing this exact surrogate-keyed output
    frame (writers.save_table calls this after a successful write).
    Frames DERIVED from the output (select/filter/...) carry no pin
    association — their pins stay live until release_pinned_caches().
    Returns the number of frames released."""
    with _PIN_LOCK:
        pins = _FRAME_PINS.pop(df, [])
        for p in pins:
            p.unpersist()
            if p in _PINNED:
                _PINNED.remove(p)
        return len(pins)


def outstanding_pins() -> int:
    """Number of surrogate pins still cached (monitoring surface — a
    steadily growing value across writes means callers are writing
    frames DERIVED from surrogate_key_scalable's output, which carry
    no pin association; see writers.save_table's leak log)."""
    with _PIN_LOCK:
        return len(_PINNED)


def release_pinned_caches() -> int:
    """Session-level drain: unpersist EVERY outstanding surrogate pin.

    Only call when no surrogate-keyed frame still awaits
    materialization — re-materializing after release recomputes ids,
    which is only stable for deterministic sources (see
    surrogate_key_scalable's determinism note).

    Returns the number of frames released.
    """
    with _PIN_LOCK:
        n = 0
        while _PINNED:
            _PINNED.pop().unpersist()
            n += 1
        _FRAME_PINS.clear()
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
    # join. The pin is associated with the RETURNED frame (below);
    # writers.save_table releases it right after that frame is
    # written — no leak across repeated builds, and no early release
    # of pins backing frames someone else hasn't materialized yet.
    tagged = tagged.persist()
    with _PIN_LOCK:
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
    out = (
        tagged.join(F.broadcast(offset_df), "__pid")
        .withColumn(key_col, (F.col("__offset") + F.col("__pos") + F.lit(start)).cast("long"))
        .drop("__pid", "__pos", "__offset")
    )
    with _PIN_LOCK:
        _FRAME_PINS[out] = [tagged]
    return out
