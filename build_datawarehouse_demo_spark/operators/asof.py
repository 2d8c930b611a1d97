"""As-of join — an operator Spark has no native form of (the guide's
'compose built-in ops' path): for each probe row, the most recent build
row at or before the probe's time, per key.

Implementation: union-and-carry-forward. Tag both sides, union, sort
within each key by (time, side) with build rows first on ties, and
carry the build payload forward with last(..., ignorenulls=True) over
an unbounded-preceding window; keep probe rows.

Scale shape: ONE shuffle on the key (the union sorts within window
partitions) — no range explosion, no per-key Python. Compare
`pd.merge_asof` inside applyInPandas, which needs every key's full
history in one pandas frame; this version streams through Spark's
external sort, so a key with a billion build rows still works.

Determinism: the caller must make (key, time) unique on the build side
(pre-aggregate duplicates) — otherwise "the" most recent row is
ambiguous in ANY engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    probe_time: str,
    build_time: str,
    build_cols: tuple[str, ...],
    inclusive: bool = True,
    build_order: tuple[str, ...] = (),
) -> DataFrame:
    """Left as-of join: probe rows annotated with the latest build row
    whose time is <= (or < when inclusive=False) the probe time.

    probe keeps all its columns; `build_cols` (+ matched build time as
    `asof_time`) are appended, null when no build row precedes.

    Duplicate (key, time) build rows: pass `build_order` and the LAST
    row in that ascending order wins (e.g. build_order=("version",)
    picks the max version) — this replaces a pre-aggregation groupBy,
    saving its shuffle: the whole operator then moves data exactly
    once, on the window's hashpartitioning(key).
    """
    p = probe.withColumn("__t", F.col(probe_time)).withColumn("__side", F.lit(1))
    # null build times can never satisfy 'latest at or before' — and
    # unfiltered they would sort FIRST and leak their payload into
    # every probe row.
    b = (
        build.filter(F.col(build_time).isNotNull())
        .select(
            F.col(key),
            F.col(build_time).alias("__t"),
            *[F.col(c) for c in build_cols],
        )
        .withColumn("__side", F.lit(0))
    )
    # align schemas for the union: probe carries null build payload,
    # build carries null probe payload. probe_time itself rides as __t
    # and is renamed back at the end — including it here would emit a
    # duplicate column of the same name.
    probe_payload = [c for c in probe.columns if c not in (key, probe_time)]
    p_aligned = p.select(
        F.col(key),
        "__t",
        "__side",
        *[F.col(c) for c in probe_payload],
        *[F.lit(None).cast(dict(b.dtypes)[c]).alias(c) for c in build_cols],
        F.lit(None).cast(dict(b.dtypes)["__t"]).alias("__bt"),
    )
    b_aligned = b.select(
        F.col(key),
        "__t",
        "__side",
        *[F.lit(None).cast(dict(p.dtypes)[c]).alias(c) for c in probe_payload],
        *[F.col(c) for c in build_cols],
        F.col("__t").alias("__bt"),
    )
    unioned = p_aligned.unionByName(b_aligned)

    # build rows sort before probe rows at equal times when inclusive
    # (so an exact-tie build row is visible to the probe), after when
    # exclusive; among equal-time build rows the last in build_order
    # wins via last().
    side_order = F.col("__side").asc() if inclusive else F.col("__side").desc()
    order_cols = [F.col("__t").asc(), side_order] + [
        F.col(c).asc_nulls_first() for c in build_order
    ]
    w = (
        Window.partitionBy(key)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0 if inclusive else -1)
    )
    carried = unioned.select(
        F.col(key),
        "__t",
        "__side",
        *probe_payload,
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in build_cols],
        F.last("__bt", ignorenulls=True).over(w).alias("asof_time"),
    )
    return (
        carried.filter(F.col("__side") == 1)
        .drop("__side")
        .withColumnRenamed("__t", probe_time)
    )


def range_join_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
) -> DataFrame:
    """Range-containment join (point ∈ [lo, hi)) as an equi-join.

    A naive inequality join is a broadcast-nested-loop — O(points ×
    intervals). Bucketizing both sides onto a fixed grid turns it into
    an equi-join on bucket id: each interval explodes into the grid
    cells it covers, each point hashes to one cell, and the residual
    `lo <= p < hi` filter runs only within matching cells. Cost scales
    with points + Σ interval-widths/bucket_width, not the product.
    """
    p = points.withColumn("__bucket", F.floor(F.col(point_col) / bucket_width).cast("long"))
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bucket_width).cast("long"),
                # include hi's cell unconditionally — when hi sits
                # exactly on a grid line the extra cell matches no
                # points (the residual filter rejects them); costs one
                # spurious cell, avoids float-epsilon games.
                F.floor(F.col(hi_col) / bucket_width).cast("long"),
            )
        ),
    )
    return (
        p.join(iv, "__bucket")
        .filter((F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col)))
        .drop("__bucket")
    )
