"""Diagnose the sf8 neardup-apply run variance (r16, VERDICT r15 item
2): BENCH_SCALE_INCR_r15_sf1_sf8.json recorded apply_runs
[27.0, 38.1, 148.8] — a 5.5x spread across three runs of identical
work, increasing monotonically. Suspects named by the judge:
checkpoint-block memory pressure/eviction during the fold, GC pause,
AQE replan.

Protocol (one subprocess per arm, fresh JVM, the bench_scale.py
discipline):
  arm "inmem":        build training_data_neardup_state over the
                      stored corpus (all frames localCheckpoint-
                      backed), then N identical applies of the same
                      re-crawl batch WITHOUT releasing anything —
                      the EXACT r15 bench protocol, now with per-run
                      wall, JVM GC-time delta, and persisted-RDD
                      storage totals (count / memSize / diskSize)
                      before+after each run. Growing diskSize means
                      MEMORY_AND_DISK blocks were evicted to disk —
                      the eviction signature.
  arm "inmem_retire": same, but each run's refreshed-state delta
                      blocks are retired after the touch
                      (retire_superseded_state) — isolates per-run
                      delta ACCUMULATION as the variance cause.
  arm "compacted":    the state is compact_state()-ed to bucketed
                      parquet tables first (storage memory freed,
                      applies probe tables instead of blocks), deltas
                      retired per run — the designed production fix;
                      stable runs here + unstable "inmem" = the
                      judge's hypothesis confirmed.

Writes BENCH_INCR_OUTLIER_r16.json.

Usage:
  python tools/diagnose_incr_outlier.py [sf_dir] [runs] [out]
  python tools/diagnose_incr_outlier.py --arm <inmem|inmem_retire|compacted> <sf_dir> <runs>
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

BATCH_DOCS = 4000
NEW_DOCS = 500
NEW_SRC = "/root/testdata/sf0.1"
REDELIVER_BASE = 1_000_000_000
NEW_BASE = 2_000_000_000


def _storage_totals(sc) -> dict:
    infos = sc._jsc.sc().getRDDStorageInfo()
    mem = disk = n = 0
    for i in range(len(infos)):
        inf = infos[i]
        n += 1
        mem += inf.memSize()
        disk += inf.diskSize()
    return {"rdds": n, "mem_mb": round(mem / 2**20, 1), "disk_mb": round(disk / 2**20, 1)}


def _gc_ms(spark) -> int:
    beans = (
        spark.sparkContext._jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
    )
    return sum(beans.get(i).getCollectionTime() for i in range(beans.size()))


def _touch(state: dict) -> int:
    n = 0
    for v in state.values():
        if hasattr(v, "count") and not isinstance(v, (str, bytes)):
            n += v.count()
    return n


def arm(kind: str, sf_dir: str, runs: int) -> None:
    from pyspark.sql import functions as F

    from build_datawarehouse_demo_spark.plans.training_data import (
        compact_state,
        retire_superseded_state,
        training_data_neardup_apply,
        training_data_neardup_state,
    )
    from build_datawarehouse_demo_spark.session import get_spark

    spark = get_spark("diagnose_incr_outlier")
    sc = spark.sparkContext
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    redeliver = docs.filter(F.col("doc_id") < BATCH_DOCS).select(
        (F.col("doc_id") + REDELIVER_BASE).alias("doc_id"), "text"
    )
    fresh = (
        spark.read.parquet(f"{NEW_SRC}/documents.parquet")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < NEW_DOCS)
        .select((F.col("doc_id") + NEW_BASE).alias("doc_id"), "text")
    )
    batch = redeliver.unionByName(fresh).localCheckpoint()
    n_stored = docs.count()

    t0 = time.time()
    state = training_data_neardup_state(docs, corpus_n=n_stored)
    _touch(state)
    build_s = round(time.time() - t0, 2)
    if kind == "compacted":
        t0 = time.time()
        state = compact_state(state, "diag_outlier_state")
        compact_s = round(time.time() - t0, 2)
    else:
        compact_s = None

    run_rows = []
    for r in range(runs):
        pre = _storage_totals(sc)
        g0 = _gc_ms(spark)
        t0 = time.time()
        refreshed = training_data_neardup_apply(batch, state)
        _touch(refreshed)
        wall = round(time.time() - t0, 2)
        run_rows.append(
            {
                "wall_s": wall,
                "gc_ms": _gc_ms(spark) - g0,
                "storage_before": pre,
                "storage_after": _storage_totals(sc),
            }
        )
        if kind != "inmem":
            # drop this run's delta blocks so the next run sees the
            # same storage footprint (the "inmem" arm deliberately
            # accumulates — that is the r15 protocol being diagnosed)
            retire_superseded_state(refreshed, state)
        print(f"ARMRUN {json.dumps(run_rows[-1])}", flush=True)
    walls = [r["wall_s"] for r in run_rows]
    print(
        "ARMRESULT "
        + json.dumps(
            {
                "arm": kind,
                "sf_dir": sf_dir,
                "n_stored": n_stored,
                "build_s": build_s,
                "compact_s": compact_s,
                "runs": run_rows,
                "median_s": statistics.median(walls),
                "max_over_median": round(max(walls) / statistics.median(walls), 2),
            }
        ),
        flush=True,
    )


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--arm":
        arm(sys.argv[2], sys.argv[3], int(sys.argv[4]))
        return
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(ROOT, "testdata_local/dup/sf8")
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    out_name = sys.argv[3] if len(sys.argv) > 3 else "BENCH_INCR_OUTLIER_r16.json"

    arms = {}
    for kind in ("inmem", "inmem_retire", "compacted"):
        print(f"diagnose_incr_outlier arm: {kind}", flush=True)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--arm", kind, sf_dir, str(runs)],
            capture_output=True,
            text=True,
            check=True,
        )
        last = [l for l in out.stdout.splitlines() if l.startswith("ARMRESULT ")][-1]
        arms[kind] = json.loads(last[len("ARMRESULT "):])

    result = {
        "sf_dir": sf_dir,
        "runs": runs,
        "protocol": (
            "training_data_neardup_apply of the fixed re-crawl batch (4000 "
            "redelivered + 500 new) repeated over ONE state per arm, each "
            "run's delta blocks retired after the touch; per-run GC delta + "
            "persisted-RDD storage totals; arm inmem = checkpoint-backed "
            "state (the r15 bench arm), arm compacted = compact_state()-ed "
            "bucketed tables"
        ),
        "arms": arms,
    }
    out_path = os.path.join(ROOT, out_name)
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
