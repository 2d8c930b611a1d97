"""Audit: which registry entries execute a Window with NO partition
spec (the `WindowExec: No Partition Defined` warning — all rows move
to one task). VERDICT round 5, item 2: every such op must be either
dim-scale by contract or fixed.

Walks the JVM physical-plan tree for every registered query at a small
SF and reports (query, window node, partition-less sort keys, the
plan's estimated row count at that node where available).

Usage: python tools/audit_windows.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def global_windows(df) -> list[str]:
    """Names of partition-less window nodes in df's executed plan."""
    hits: list[str] = []

    def walk(node) -> None:
        name = node.nodeName()
        if "Window" in name:
            try:
                if node.partitionSpec().isEmpty():
                    order = node.orderSpec().mkString(", ")
                    hits.append(f"{name} orderBy [{order}]")
            except Exception:
                hits.append(f"{name} (partitionSpec unreadable)")
        for i in range(node.children().length()):
            walk(node.children().apply(i))
        # AdaptiveSparkPlan keeps its prepared input out of children()
        if node.nodeName() == "AdaptiveSparkPlan":
            walk(node.initialPlan())

    walk(df._jdf.queryExecution().executedPlan())
    return hits


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from build_datawarehouse_demo_spark import registry
    from build_datawarehouse_demo_spark.session import get_spark

    spark = get_spark("audit_windows")
    flagged: dict[str, list[str]] = {}
    errors: dict[str, str] = {}
    for name, fn in registry.queries().items():
        try:
            hits = global_windows(fn(spark, sf_dir))
        except Exception as exc:
            errors[name] = str(exc).splitlines()[0][:120]
            continue
        if hits:
            flagged[name] = hits
    print(f"\n== {len(flagged)} queries with partition-less Window nodes ==")
    for name, hits in sorted(flagged.items()):
        for h in hits:
            print(f"{name}: {h}")
    if errors:
        print(f"\n== {len(errors)} queries errored during plan build ==")
        for name, e in sorted(errors.items()):
            print(f"{name}: {e}")


if __name__ == "__main__":
    main()
