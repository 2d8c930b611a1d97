"""Round-5 registry entries: graph analytics, Spark 4 API surface
(UDTF, VARIANT, HLL sketches, mapInArrow), runtime-filter joins,
deterministic per-group sampling, and multi-dim clustering.

Same oracle discipline as registry_extensions: exact integer /
md5-derived values wherever possible, 6-decimal rounding over exact
double math where summation order may drift between engines, identical
aliases on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from build_datawarehouse_demo_spark.registry import register
from build_datawarehouse_demo_spark.sources.readers import read_parquet


def _t(spark: SparkSession, sf_dir: str, name: str, rebalance: bool = True) -> DataFrame:
    return read_parquet(spark, f"{sf_dir}/{name}.parquet", rebalance=rebalance)


def _pagerank_oracle(damping: float = 0.85, iterations: int = 5) -> str:
    """Unrolled fixed-iteration PageRank in portable SQL.

    Mirrors operators/graph.py:pagerank exactly: same edge derivation,
    same share = w/out_w staging, same (1-d)/N + d*sum(rank*share)
    update, decimal literals CAST to DOUBLE so both engines do the
    identical IEEE ops (a bare 0.85 is DECIMAL in DuckDB).
    """
    d = f"CAST({damping} AS DOUBLE)"
    parts = [
        f"""
        WITH seq AS (
          SELECT event_type,
                 lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS prev_type
          FROM events WHERE event_type IS NOT NULL
        ),
        edges AS (
          SELECT prev_type AS src, event_type AS dst, count(*) AS w
          FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2
        ),
        nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
        nn AS (SELECT count(*) AS n FROM nodes),
        outw AS (SELECT src, sum(w) AS out_w FROM edges GROUP BY src),
        sh AS (
          SELECT e.src, e.dst, CAST(e.w AS DOUBLE) / o.out_w AS share
          FROM edges e JOIN outw o ON o.src = e.src
        ),
        pr0 AS (SELECT node, CAST(1 AS DOUBLE) / (SELECT n FROM nn) AS rank FROM nodes)"""
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f""",
        c{i} AS (
          SELECT s.dst AS node, sum(p.rank * s.share) AS c
          FROM pr{i - 1} p JOIN sh s ON s.src = p.node GROUP BY s.dst
        ),
        pr{i} AS (
          SELECT nd.node,
                 (CAST(1 AS DOUBLE) - {d}) / (SELECT n FROM nn)
                 + {d} * coalesce(c.c, CAST(0 AS DOUBLE)) AS rank
          FROM nodes nd LEFT JOIN c{i} c ON c.node = nd.node
        )"""
        )
    parts.append(
        f"""
        SELECT node, round(rank, 6) AS rank FROM pr{iterations}"""
    )
    return "".join(parts)


def register_round5() -> None:
    # ------------------------------------------------------------------
    # graph analytics
    # ------------------------------------------------------------------

    @register("graph_pagerank", oracle=_pagerank_oracle())
    def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Weighted PageRank over the event-type transition graph.

        The iterative join+agg fixed-point pattern (Pregel without
        RDDs); see operators/graph.py for the 100 TB plan shape.
        """
        from build_datawarehouse_demo_spark.operators.graph import (
            pagerank,
            transition_edges,
        )

        edges = transition_edges(_t(spark, sf_dir, "events"))
        return pagerank(edges).select("node", F.round("rank", 6).alias("rank"))
