from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from build_datawarehouse_demo_spark.operators.graph import pagerank, transition_edges


def _reference_pagerank(edges, damping=0.85, iterations=5):
    """Plain-Python mirror of the operator for tiny fixtures."""
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    n = len(nodes)
    out_w = {}
    for s, _, w in edges:
        out_w[s] = out_w.get(s, 0) + w
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(iterations):
        c = {v: 0.0 for v in nodes}
        for s, d, w in edges:
            c[d] += rank[s] * (float(w) / out_w[s])
        rank = {v: (1.0 - damping) / n + damping * c[v] for v in nodes}
    return rank


@pytest.mark.parametrize(
    "edges",
    [
        [("a", "b", 1), ("b", "a", 1)],  # 2-cycle: stationary at 1/2
        [("a", "b", 1)],  # chain with a dangling sink
        [("a", "b", 3), ("a", "c", 1), ("b", "c", 2), ("c", "a", 1)],  # weighted
    ],
)
def test_pagerank_matches_reference(spark, edges):
    df = spark.createDataFrame(edges, "src string, dst string, w long")
    got = {r["node"]: r["rank"] for r in pagerank(df).collect()}
    want = _reference_pagerank(edges)
    assert set(got) == set(want)
    for v in want:
        assert math.isclose(got[v], want[v], rel_tol=1e-12), (v, got[v], want[v])


def test_pagerank_two_cycle_is_stationary(spark):
    df = spark.createDataFrame([("a", "b", 1), ("b", "a", 1)], "src string, dst string, w long")
    got = {r["node"]: r["rank"] for r in pagerank(df).collect()}
    assert got == {"a": 0.5, "b": 0.5}


def test_pagerank_ranks_sum_below_one_with_dangling(spark):
    # b has no out-edges: its mass is dropped, so the total sinks
    # below 1 but stays positive — the documented semantics.
    df = spark.createDataFrame([("a", "b", 1)], "src string, dst string, w long")
    total = sum(r["rank"] for r in pagerank(df).collect())
    assert 0 < total < 1


def test_transition_edges_orders_by_ts_then_id(spark):
    rows = [
        # user 1: view -> click -> view  (ties on ts broken by event_id)
        (1, "2024-01-01 00:00:00", 1, "view"),
        (1, "2024-01-01 00:00:01", 2, "click"),
        (1, "2024-01-01 00:00:01", 3, "view"),
        # user 2: a single event contributes no edge
        (2, "2024-01-01 00:00:00", 4, "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, event_id long, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {(r["src"], r["dst"]): r["w"] for r in transition_edges(df).collect()}
    assert got == {("view", "click"): 1, ("click", "view"): 1}
