"""Quantify refresh-candidate growth under a FROZEN banding vs a
MIGRATED one (r15, VERDICT r14 item 2's scale note).

A state built at ``build_n`` documents freezes minhash_auto_params
(build_n); as the stored corpus grows past that point, the frozen rows-
per-band admits more background band collisions per key than the
params auto-sizing would choose at the grown size — candidate volume
per refresh batch grows, which is the measurable edge of the frozen-
banding watch item (the 0.241 neardup-apply exponent). Migration
re-signs the reps at minhash_auto_params(n_now); this tool measures
BOTH arms' refresh-candidate volume and wall time on the same grown
corpus with the same re-crawl batch (the bench_scale_incr batch
shape: first 4000 stored docs redelivered under fresh monotone ids +
500 genuinely new docs), isolating the banding from the filter front.

Output: one JSON file with per-arm
{bands, rows, n_stored_reps, n_batch_reps, cand_new_new, cand_new_old,
 verified_member_pairs, wall_s}.

Usage:
  python tools/bench_banding_migration.py [stored_dir] [build_n] [out]
Defaults: testdata_local/sf8  50000  BENCH_BANDING_MIGRATION_r15.json
(build_n=50000 is the sf1 corpus size — the arms replay "state built
at sf1, corpus now sf8".)
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

BATCH_DOCS = 4000
NEW_DOCS = 500
NEW_SRC = "/root/testdata/sf0.1"
REDELIVER_BASE = 1_000_000_000
NEW_BASE = 2_000_000_000
SHINGLE_K = 3
THRESHOLD = 0.8


def main() -> None:
    stored_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        ROOT, "testdata_local/sf8"
    )
    build_n = int(sys.argv[2]) if len(sys.argv) > 2 else 50000
    out_name = sys.argv[3] if len(sys.argv) > 3 else "BENCH_BANDING_MIGRATION_r15.json"

    from pyspark.sql import functions as F

    from build_datawarehouse_demo_spark.operators.dedup import (
        lsh_band_keys,
        minhash_auto_params,
        minhash_signatures_from_arrays,
        shingle_arrays,
        shingle_digest_groups,
    )
    from build_datawarehouse_demo_spark.plans.training_data import (
        _expand_rep_pairs,
        _rep_band_self_candidates,
        _verify_jaccard_pairs,
    )
    from build_datawarehouse_demo_spark.session import get_spark

    spark = get_spark("bench_banding_migration")
    docs = (
        spark.read.parquet(f"{stored_dir}/documents.parquet")
        .select("doc_id", F.col("text").alias("cleaned"))
    )
    n_now = docs.count()
    batch = (
        docs.filter(F.col("doc_id") < BATCH_DOCS)
        .select((F.col("doc_id") + REDELIVER_BASE).alias("doc_id"), "cleaned")
        .unionByName(
            spark.read.parquet(f"{NEW_SRC}/documents.parquet")
            .select("doc_id", F.col("text").alias("cleaned"))
            .filter(F.col("doc_id") < NEW_DOCS)
            .select((F.col("doc_id") + NEW_BASE).alias("doc_id"), "cleaned")
        )
        .localCheckpoint()
    )

    # stored digest groups are banding-independent — build once
    sh = shingle_arrays(docs, "doc_id", "cleaned", SHINGLE_K)
    members, reps = shingle_digest_groups(sh, "doc_id")
    rep_sh = reps.select("doc_id", "shingles").localCheckpoint()
    dg_members = members.select("doc_id", "__rep").localCheckpoint()
    n_stored_reps = rep_sh.count()

    result = {
        "stored_dir": stored_dir,
        "n_stored": n_now,
        "n_stored_reps": n_stored_reps,
        "build_n": build_n,
        "batch_docs": BATCH_DOCS + NEW_DOCS,
        "protocol": (
            "same grown corpus + same re-crawl batch, banding-only arms: "
            "frozen = auto-params at the pretend build point, migrated = "
            "auto-params at the corpus's current size; cand_* count the "
            "rep-level refresh candidates _apply_rep_candidates would "
            "join/verify, verified_member_pairs the expanded exact-"
            "jaccard output (the pairs contract both arms must honor)"
        ),
        "arms": {},
    }

    for arm, n_for_params in (("frozen", build_n), ("migrated", n_now)):
        bands, rows = minhash_auto_params(n_for_params, threshold=THRESHOLD)
        num_hashes = bands * rows
        t0 = time.time()
        stored_keys = lsh_band_keys(
            minhash_signatures_from_arrays(rep_sh, num_hashes, "doc_id"),
            num_hashes,
            bands,
            "doc_id",
        ).localCheckpoint()
        m_new, r_new = shingle_digest_groups(
            shingle_arrays(batch, "doc_id", "cleaned", SHINGLE_K), "doc_id"
        )
        new_rep_sh = r_new.select("doc_id", "shingles").localCheckpoint()
        new_keys = lsh_band_keys(
            minhash_signatures_from_arrays(new_rep_sh, num_hashes, "doc_id"),
            num_hashes,
            bands,
            "doc_id",
        ).localCheckpoint()
        nn = _rep_band_self_candidates(new_keys, "doc_id")
        o = stored_keys.alias("o").hint("shuffle_hash")
        no = (
            new_keys.alias("n")
            .hint("shuffle_hash")
            .join(o, ["band", "band_key"])
            .select(
                F.least(F.col("n.doc_id"), F.col("o.doc_id")).alias("id_a"),
                F.greatest(F.col("n.doc_id"), F.col("o.doc_id")).alias("id_b"),
            )
            .dropDuplicates()
        )
        cand_nn = nn.count()
        cand_no = no.count()
        arrays = new_rep_sh.unionByName(rep_sh)
        rep_pairs = _verify_jaccard_pairs(
            nn.union(no), arrays, arrays, THRESHOLD, "doc_id"
        )
        exp_members = dg_members.unionByName(m_new.select("doc_id", "__rep"))
        verified = _expand_rep_pairs(
            rep_pairs, m_new, exp_members, "doc_id", THRESHOLD
        ).count()
        wall = round(time.time() - t0, 2)
        result["arms"][arm] = {
            "bands": bands,
            "rows": rows,
            "n_batch_reps": new_rep_sh.count(),
            "cand_new_new": cand_nn,
            "cand_new_old": cand_no,
            "verified_member_pairs": verified,
            "wall_s": wall,
        }
        print(f"ARM {arm}: {json.dumps(result['arms'][arm])}", flush=True)

    f, m = result["arms"]["frozen"], result["arms"]["migrated"]
    result["cand_ratio_frozen_over_migrated"] = round(
        (f["cand_new_new"] + f["cand_new_old"])
        / max(1, m["cand_new_new"] + m["cand_new_old"]),
        3,
    )
    with open(os.path.join(ROOT, out_name), "w") as fh:
        json.dump(result, fh, indent=2)
        fh.write("\n")
    print(json.dumps({k: v for k, v in result.items() if k != "protocol"}))


if __name__ == "__main__":
    main()
