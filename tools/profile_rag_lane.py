"""Stage-by-stage wall-clock profile of the RAG index pipeline
(plans/rag_index.py) at one scale factor — the measure-first
discipline for diagnosing the r10 sf1->sf8 exponent (1.66 post-embed-
fix vs the 1.3 designed cap). Each stage is forced with a count() or
noop write so the timing brackets exactly one subtree.

Usage: python tools/profile_rag_lane.py <sf_dir>
"""

from __future__ import annotations

import math
import sys
import time

ROOT = __file__.rsplit("/", 2)[0]
sys.path.insert(0, ROOT)


def main() -> None:
    sf_dir = sys.argv[1]
    from pyspark.sql import functions as F

    from build_datawarehouse_demo_spark.operators.dedup import spread
    from build_datawarehouse_demo_spark.operators.similarity import (
        ivf_assign_two_level,
        ivf_group_centroids,
        ivf_topk_assigned,
        ivf_train_sampled,
    )
    from build_datawarehouse_demo_spark.plans.rag_index import (
        CHUNK_UID_STRIDE,
        hash_embed_chunks,
    )
    from build_datawarehouse_demo_spark.session import get_spark
    from build_datawarehouse_demo_spark.sources.readers import read_parquet

    spark = get_spark()
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet", rebalance=True)

    t0 = time.time()
    chunk_vecs = spread(hash_embed_chunks(docs)).localCheckpoint()
    n_chunks = chunk_vecs.count()
    t1 = time.time()
    print(f"embed+checkpoint: {t1 - t0:7.1f}s  n_chunks={n_chunks}", flush=True)

    nlist = max(2, math.ceil(math.sqrt(n_chunks)))
    seeds = chunk_vecs.filter(
        (F.col("vec_id") % CHUNK_UID_STRIDE == 0)
        & (F.col("vec_id") < nlist * CHUNK_UID_STRIDE)
    ).select(F.col("vec_id").alias("centroid_id"), "embedding")
    cents = ivf_train_sampled(
        chunk_vecs, seeds, n=n_chunks, nlist=nlist, n_iter=2, round_to=6
    )
    n_cents = cents.count()
    t2 = time.time()
    print(f"train (2 Lloyd):  {t2 - t1:7.1f}s  nlist={nlist} survivors={n_cents}", flush=True)

    ngroups = max(1, math.ceil(math.sqrt(nlist)))
    sup, groups = ivf_group_centroids(cents, n_groups=ngroups, n_iter=1, round_to=6)
    sup.count(), groups.count()
    t3 = time.time()
    print(f"group centroids:  {t3 - t2:7.1f}s  ngroups={ngroups}", flush=True)

    assigned = ivf_assign_two_level(chunk_vecs, cents, sup, groups, gprobe=2)
    assigned = assigned.localCheckpoint()
    n_assigned = assigned.count()
    t4 = time.time()
    print(f"two-level assign: {t4 - t3:7.1f}s  rows={n_assigned}", flush=True)

    probes = chunk_vecs.filter(
        (F.col("vec_id") % CHUNK_UID_STRIDE == 0)
        & (F.col("vec_id") < 5 * CHUNK_UID_STRIDE)
    ).select(F.col("vec_id").alias("probe_id"), "embedding")
    out = ivf_topk_assigned(assigned, cents, probes, k=5, nprobe=4)
    n_out = out.count()
    t5 = time.time()
    print(f"search:           {t5 - t4:7.1f}s  rows={n_out}", flush=True)
    print(f"TOTAL:            {t5 - t0:7.1f}s", flush=True)


if __name__ == "__main__":
    main()
