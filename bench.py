"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with the `noop` sink (full computation,
no driver-side collect — the honest way to time a distributed plan).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    # reference-parity surface
    "flagship_priority_revenue",
    "sql_q1_pricing_summary",
    "sql_q3_shipping_priority",
    "sql_q5_local_supplier_volume",
    "sql_q6_forecast_revenue",
    "sql_window_rank_topk",
    "sql_window_sessionize",
    "sql_agg_events_hourly",
    "join_inner_single_key",
    "explode_split_tokens",
    # training-data pipeline extensions
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "sim_cosine_topk",
    "text_quality_score",
    "join_asof",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf

    from build_datawarehouse_demo_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("bench")
    qs = entrymod.queries()
    names = [n for n in HEADLINE if n in qs]
    if extra := os.environ.get("SPARK_GRAFT_BENCH_EXTRA"):
        names += [n for n in extra.split(",") if n in qs and n not in names]

    # JVM/codegen warmup on the smallest query so q1 doesn't pay it.
    qs[names[0]](spark, sf_dir).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    print(
        json.dumps(
            {
                "metric": "headline_queries_wall_clock",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )


if __name__ == "__main__":
    main()
