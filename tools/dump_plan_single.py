"""Dump the AQE-final `.explain("formatted")` output of named registry
queries to plans/<tag>/<name>_<suffix>.txt — the before/after plan
evidence for optimization rounds.

Usage: python tools/dump_plan_single.py <tag> <suffix> <query> [query ...]
e.g.   python tools/dump_plan_single.py r19 before sim_ivf_trained
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    tag, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as em
    from build_datawarehouse_demo_spark.session import get_spark

    spark = get_spark("plans_single")
    qs = em.queries()
    outdir = os.path.join(ROOT, "plans", tag)
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        # execute the df's own QueryExecution so the AQE-final plan is
        # what lands in the file (the dump_plans.py discipline)
        df.collect()
        jdf = df._jdf.queryExecution()
        formatted = jdf.explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(formatted)
        print(f"wrote {path} ({len(formatted)} chars)")


if __name__ == "__main__":
    main()
