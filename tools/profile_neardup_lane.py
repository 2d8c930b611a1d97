"""Stage-by-stage wall-clock profile of prepare_training_data_neardup
(r14, VERDICT r13 item 5: the lane is the top headline cost at ~5
normalized / ~8s at sf0.1 — find where the constant goes). Each
bracket forces exactly one subtree with a count(), mirroring the
pipeline's own materialization boundaries, and the last bracket runs
the REAL composed pipeline for the total. Compare the sum of brackets
to the total to see the non-stage (plan/AQE sequencing) overhead.

Usage: python tools/profile_neardup_lane.py <sf_dir> [reps]
"""

from __future__ import annotations

import sys
import time

ROOT = __file__.rsplit("/", 2)[0]
sys.path.insert(0, ROOT)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    from pyspark.sql import functions as F

    from build_datawarehouse_demo_spark.operators.dedup import (
        connected_components_star,
        minhash_auto_params,
        minhash_dedup_pairs,
        remove_duplicate_spans,
    )
    from build_datawarehouse_demo_spark.plans.training_data import (
        _featured_survivors,
        prepare_training_data_neardup,
    )
    from build_datawarehouse_demo_spark.session import get_spark

    spark = get_spark("profile_neardup")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    n = docs.count()
    bands, rows = minhash_auto_params(n)
    print(f"n={n} bands={bands} rows={rows}", flush=True)
    prepare_training_data_neardup(docs, corpus_n=n).count()  # warm

    for rep in range(reps):
        t0 = time.time()
        surv = _featured_survivors(docs, "doc_id", "text", 5, 0.3).localCheckpoint()
        n_surv = surv.count()
        t1 = time.time()
        pairs = minhash_dedup_pairs(
            surv,
            id_col="doc_id",
            text_col="cleaned",
            k=3,
            num_hashes=bands * rows,
            bands=bands,
            threshold=0.8,
            collapse=False,
        ).localCheckpoint()
        n_pairs = pairs.count()
        t2 = time.time()
        comp = connected_components_star(pairs)
        reps_df = (
            surv.join(comp.withColumnRenamed("node", "doc_id"), "doc_id", "left")
            .withColumn("component_id", F.coalesce(F.col("component"), F.col("doc_id")))
            .filter(F.col("component_id") == F.col("doc_id"))
            .drop("component")
            .localCheckpoint()
        )
        n_reps = reps_df.count()
        t3 = time.time()
        cleaned = remove_duplicate_spans(
            reps_df.select("doc_id", "cleaned"),
            id_col="doc_id",
            text_col="cleaned",
            window=5,
            min_docs=2,
        )
        n_clean = cleaned.count()
        t4 = time.time()
        total = prepare_training_data_neardup(docs, corpus_n=n).count()
        t5 = time.time()
        print(
            f"rep{rep}: features+exact {t1-t0:5.2f}s ({n_surv})  "
            f"minhash_pairs {t2-t1:5.2f}s ({n_pairs})  "
            f"components+reps {t3-t2:5.2f}s ({n_reps})  "
            f"span_removal {t4-t3:5.2f}s ({n_clean})  "
            f"| staged_sum {t4-t0:5.2f}s  full_pipeline {t5-t4:5.2f}s ({total})",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
