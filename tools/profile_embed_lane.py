"""One-off profiler for the dedup_embedding_cosine_auto lane: times
embedding_near_dup_pairs_bucketed at a given sf dir for a given
lsh_auto_params bucket_size (round-10 retune measurement, VERDICT r9
item 1). Exclusive-run discipline: nothing else on the box while this
runs; legs back-to-back in one JVM so the comparison is drift-immune.

Usage: python tools/profile_embed_lane.py <sf_dir> <bucket_size> [reps]
Prints one JSON line {"sf_dir":..., "bucket":..., "times": [...], "rows": N}.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir, bucket = sys.argv[1], int(sys.argv[2])
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "96g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from build_datawarehouse_demo_spark.operators.similarity import (
        embedding_near_dup_pairs_bucketed,
        lsh_auto_params,
    )
    from build_datawarehouse_demo_spark.sources.readers import read_parquet

    emb = read_parquet(spark, f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    bands, r = lsh_auto_params(n, bucket_size=bucket)
    times, rows = [], None
    for _ in range(reps):
        t0 = time.monotonic()
        rows = embedding_near_dup_pairs_bucketed(
            emb, threshold=0.4, bands=bands, rows_per_band=r, dim=64
        ).count()
        times.append(round(time.monotonic() - t0, 2))
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "n": n,
                "bucket": bucket,
                "bands": bands,
                "r": r,
                "times": times,
                "rows": rows,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
