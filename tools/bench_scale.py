"""Scale-trend bench: run the headline set at TWO scale factors and
record per-query scaling ratios + exponents (VERDICT round 5, item 1 —
"the 100 TB claims currently rest on plan reading, not measurement").

Each SF runs in its own subprocess (fresh JVM — no cross-SF cache
pollution; same per-run rotation/median discipline as bench.py). The
merged side file reports, per query:

  t_small, t_big   medians (sec)
  ratio            t_big / t_small
  exponent         log(ratio) / log(data_ratio) — 1.0 = perfectly
                   linear scaling, < 1 sub-linear (fixed overheads
                   amortizing), > 1 super-linear (candidate blowup,
                   spill, or a plan that stopped fitting)

Usage: python tools/bench_scale.py [small_dir] [big_dir] [runs] [out_name]
Defaults: /root/testdata/sf0.1  testdata_local/sf1  3  BENCH_SCALE_r06.json
Writes the result JSON at the repo root.
"""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(sf_dir: str, runs: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_BENCH_RUNS=str(runs),
        SPARK_GRAFT_ROUND=f"scale_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        check=True,
    )
    last = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(last)


def main() -> None:
    small = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    big = sys.argv[2] if len(sys.argv) > 2 else os.path.join(ROOT, "testdata_local/sf1")
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    print(f"bench_scale: {small} (runs={runs})", flush=True)
    r_small = run_bench(small, runs)
    print(json.dumps(r_small["queries"]), flush=True)
    print(f"bench_scale: {big} (runs={runs})", flush=True)
    r_big = run_bench(big, runs)
    print(json.dumps(r_big["queries"]), flush=True)

    data_ratio = float(r_big["sf"]) / float(r_small["sf"])
    per_query = {}
    for name, t_small in r_small["queries"].items():
        t_big = r_big["queries"].get(name)
        if t_big is None or t_small <= 0:
            continue
        ratio = t_big / t_small
        per_query[name] = {
            "t_small": t_small,
            "t_big": t_big,
            "ratio": round(ratio, 3),
            "exponent": round(math.log(max(ratio, 1e-9)) / math.log(data_ratio), 3),
        }
    result = {
        "small_sf": r_small["sf"],
        "big_sf": r_big["sf"],
        "data_ratio": data_ratio,
        "runs": runs,
        "total_small": r_small["value"],
        "total_big": r_big["value"],
        # per-leg box-state anchors (bench.py calibration): if the two
        # legs' anchors diverge, the exponents carry that drift
        "calibration_small": r_small.get("calibration"),
        "calibration_big": r_big.get("calibration"),
        "queries": dict(
            sorted(per_query.items(), key=lambda kv: -kv[1]["ratio"])
        ),
    }
    out_name = sys.argv[4] if len(sys.argv) > 4 else "BENCH_SCALE_r06.json"
    out_path = os.path.join(ROOT, out_name)
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
