"""Graph analytics over DataFrames: weighted PageRank.

Extends the engine beyond the reference's surface (the reference has
no graph operators) alongside ``dedup.connected_components_star``:
iterative distributed algorithms expressed as fixed-point loops of
joins + aggregations — the Pregel-style pattern without any RDD code.

100 TB posture:
- the edge list is aggregated ONCE (one shuffle on (src, dst)) and
  localCheckpoint'ed: iterations re-read the materialized edges, never
  re-derive them;
- each iteration is one join (rank -> edges) + one shuffle on dst for
  the contribution sum.  The rank table has |nodes| rows — tiny next
  to |edges| — so AQE broadcasts it against the stationary edge set;
  with billions of nodes the same plan degrades gracefully to a
  shuffle join on src, still one exchange per side;
- fixed iteration count (not convergence-tested) keeps the job graph
  static and the oracle expressible as unrolled SQL.

Determinism: all math is exact double IEEE ops in both engines; the
per-node in-degree is small so summation-order drift stays far below
the 6-decimal rounding applied by callers (same discipline as the
cosine operators in similarity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def transition_edges(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Weighted directed edge list from consecutive events per user.

    Edge (src, dst, w): user performed event type ``src`` immediately
    before ``dst``, w = number of such transitions corpus-wide.  Order
    within a user is (ts, id) — the id tiebreak makes the lag
    deterministic under equal timestamps.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    return (
        events.where(F.col(type_col).isNotNull())
        .select(user_col, ts_col, id_col, type_col)
        .withColumn("prev_type", F.lag(type_col).over(w))
        .where(F.col("prev_type").isNotNull())
        .groupBy(F.col("prev_type").alias("src"), F.col(type_col).alias("dst"))
        .agg(F.count(F.lit(1)).alias("w"))
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    damping: float = 0.85,
    iterations: int = 5,
    broadcast_ranks: bool = True,
) -> DataFrame:
    """Weighted PageRank, fixed number of power iterations.

    rank'(v) = (1-d)/N + d * sum over in-edges (u,v) of
               rank(u) * (w(u,v) / out_weight(u))

    Dangling mass (nodes with no out-edges) is dropped, not
    redistributed — the standard simplification; both this and the SQL
    oracle implement identical semantics.  Returns (node, rank) with
    full-precision doubles; callers round for display/oracle hashing.

    ``broadcast_ranks`` (default) hints the |nodes|-row rank and
    contribution tables broadcast, so the stationary edge set is NEVER
    shuffled — without the hint Catalyst falls back to sort-merge and
    re-shuffles the edges every iteration (measured: 5 SMJs on the
    edge side). Disable only when the node count itself exceeds
    broadcast capacity; the plan then degrades to shuffle joins whose
    edge-side exchange is at least reused from the checkpoint read.
    """
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))

    out_w = edges.groupBy(src).agg(F.sum(weight).alias("out_w"))
    # share = w / out_weight(src), materialized once: every iteration
    # re-reads this table instead of recomputing the edge aggregation.
    share = (
        edges.join(out_w, on=src)
        .select(
            F.col(src).alias("e_src"),
            F.col(dst).alias("e_dst"),
            (F.col(weight).cast("double") / F.col("out_w")).alias("share"),
        )
        .localCheckpoint()
    )

    # Python-side doubles match SQL: (1.0 - 0.85) and 1.0/n are single
    # IEEE ops on exactly-representable inputs in both engines.
    teleport = (1.0 - damping) / n
    hint = F.broadcast if broadcast_ranks else (lambda df: df)
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for _ in range(iterations):
        contribs = (
            share.join(hint(ranks), share["e_src"] == ranks["node"])
            .groupBy("e_dst")
            .agg(F.sum(F.col("rank") * F.col("share")).alias("c"))
        )
        ranks = nodes.join(hint(contribs), nodes["node"] == contribs["e_dst"], "left").select(
            "node",
            (F.lit(teleport) + F.lit(damping) * F.coalesce(F.col("c"), F.lit(0.0))).alias(
                "rank"
            ),
        )
    return ranks
