"""Stage-level profiler for the dedup_embedding_cosine_auto lane
(VERDICT r11 item 3): where does the time go at each scale arm?

Times three nested prefixes of embedding_near_dup_pairs_bucketed's
plan, back-to-back in one JVM (drift-immune within a run):

  sig    staged projections + banding explode (no join) -> noop write
  join   + shuffle-hash self-join + inline dot + threshold filter
         (no dedup) -> count
  full   the registered operator (adds the survivor dedup) -> count

Usage: python tools/profile_embed_stages.py <sf_dir> [reps]
Prints one JSON line.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "96g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from build_datawarehouse_demo_spark.operators.similarity import (
        _as_double,
        dot,
        embedding_near_dup_pairs_bucketed,
        lsh_auto_params,
        norm,
        rp_planes,
        sign_bit,
        staged_projections,
    )
    from build_datawarehouse_demo_spark.sources.readers import read_parquet

    emb = read_parquet(spark, f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    bands, r = lsh_auto_params(n)
    planes = rp_planes(bands * r, 64)

    def tagged_frame():
        vecs = emb.select(F.col("vec_id"), _as_double("embedding").alias("__v"))
        projected = staged_projections(vecs, "__v", planes, out_col="__projs")
        band_structs = []
        for b in range(bands):
            sig = None
            for j in range(r):
                bit = sign_bit(
                    F.element_at(F.col("__projs"), b * r + j + 1), 1 << j
                )
                sig = bit if sig is None else sig + bit
            band_structs.append(
                F.struct(F.lit(b).alias("band"), sig.cast("int").alias("sig"))
            )
        return (
            projected.withColumn("__n", norm(F.col("__v")))
            .filter(F.col("__n") > 0)
            .withColumn("__u", F.transform(F.col("__v"), lambda x: x / F.col("__n")))
            .select(
                F.col("vec_id"),
                F.explode(F.array(*band_structs)).alias("bs"),
                F.col("__u"),
            )
            .select(
                F.col("vec_id"),
                F.col("bs.band").alias("band"),
                F.col("bs.sig").alias("sig"),
                F.col("__u"),
            )
        )

    out = {"sf_dir": sf_dir, "n": n, "bands": bands, "r": r, "stages": {}}
    for name in ("sig", "join", "full"):
        times = []
        for _ in range(reps):
            t0 = time.monotonic()
            if name == "sig":
                tagged_frame().write.format("noop").mode("overwrite").save()
            elif name == "join":
                t = tagged_frame()
                ta = t.select(
                    F.col("vec_id").alias("id_a"), "band", "sig",
                    F.col("__u").alias("__ua"),
                )
                tb = t.select(
                    F.col("vec_id").alias("id_b"), "band", "sig",
                    F.col("__u").alias("__ub"),
                )
                cond = (
                    (ta["band"] == tb["band"])
                    & (ta["sig"] == tb["sig"])
                    & (F.col("id_a") < F.col("id_b"))
                )
                (
                    ta.hint("shuffle_hash")
                    .join(tb.hint("shuffle_hash"), cond)
                    .withColumn("cosine", dot(F.col("__ua"), F.col("__ub")))
                    .filter(F.col("cosine") >= 0.4)
                    .count()
                )
            else:
                embedding_near_dup_pairs_bucketed(
                    emb, threshold=0.4, bands=bands, rows_per_band=r, dim=64
                ).count()
            times.append(round(time.monotonic() - t0, 2))
        out["stages"][name] = times
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
