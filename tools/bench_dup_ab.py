"""A/B the r13 hot-duplicate-group pre-collapse against the raw LSH
shapes on a DUPLICATE-HEAVY fixture (tools/gen_testdata.py
dup_fraction mode) — alternating reps in ONE JVM (old,new,old,new...),
the only comparison this box's ~1.6x wall-clock drift allows
(ROUND_NOTES r12: the box drifted 3x WITHIN one A/B run when the arms
ran back-to-back in separate blocks).

Usage: python tools/bench_dup_ab.py [sf_dir] [reps] [out_name]
Defaults: testdata_local/dup/sf1  4  BENCH_DUP_AB_r13.json
Writes {out_name} at the repo root:
  {"minhash": {"collapse": [..], "raw": [..]},
   "embedding": {"collapse": [..], "raw": [..]}, ...medians}
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(ROOT, "testdata_local/dup/sf1")
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    out_name = sys.argv[3] if len(sys.argv) > 3 else "BENCH_DUP_AB_r13.json"

    from build_datawarehouse_demo_spark.operators.dedup import (
        minhash_auto_params,
        minhash_dedup_pairs,
    )
    from build_datawarehouse_demo_spark.operators.similarity import (
        embedding_near_dup_pairs_bucketed,
        lsh_auto_params,
    )
    from build_datawarehouse_demo_spark.session import get_spark

    spark = get_spark("bench_dup_ab")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    n_docs, n_vecs = docs.count(), embs.count()
    mb, mr = minhash_auto_params(n_docs)
    eb, er = lsh_auto_params(n_vecs)

    def mh(collapse: bool) -> int:
        return minhash_dedup_pairs(
            docs, num_hashes=mb * mr, bands=mb, collapse=collapse
        ).count()

    def em(collapse: bool) -> int:
        return embedding_near_dup_pairs_bucketed(
            embs, threshold=0.4, bands=eb, rows_per_band=er, collapse=collapse
        ).count()

    result: dict = {"sf_dir": sf_dir, "reps": reps, "n_docs": n_docs, "n_vecs": n_vecs,
                    "minhash_params": [mb, mr], "embedding_params": [eb, er]}
    import statistics

    for name, fn in (("minhash", mh), ("embedding", em)):
        times: dict[str, list[float]] = {"collapse": [], "raw": []}
        counts: dict[str, int] = {}
        # warm BOTH arms outside the measured reps (r13 ADVICE: warming
        # only one left the other's first rep carrying one-time costs)
        fn(True)
        fn(False)
        for _ in range(reps):
            for label, flag in (("raw", False), ("collapse", True)):
                t0 = time.time()
                counts[label] = fn(flag)
                times[label].append(round(time.time() - t0, 2))
        assert counts["raw"] == counts["collapse"], (name, counts)
        # true median (r13 ADVICE: the upper-element pick biased even
        # rep counts)
        med = {k: statistics.median(v) for k, v in times.items()}
        result[name] = {
            **times,
            "median_raw": med["raw"],
            "median_collapse": med["collapse"],
            "speedup": round(med["raw"] / max(med["collapse"], 1e-9), 2),
            "out_pairs": counts["collapse"],
        }
        print(name, json.dumps(result[name]), flush=True)

    with open(os.path.join(ROOT, out_name), "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {out_name}", flush=True)


if __name__ == "__main__":
    main()
