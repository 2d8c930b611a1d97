"""Round-over-round bench comparison that CONSUMES both calibration
anchors (r17, VERDICT r16 item 2): each headline lane is normalized by
its own class's anchor (shuffle-dominated lanes by the shuffle-join
anchor, scan/agg lanes by the sort/agg anchor — see bench.LANE_CLASS),
per-class geomeans are reported separately, and per-key noise bands
(sample IQR from the BENCH_LOCAL_DETAIL side file, when present) mark
which deltas are separable from the measured ±11.6% box-noise floor.

Usage:
  python tools/bench_compare.py BENCH_new.json BENCH_old.json \
      [DETAIL_new.json]

Output: per-class normalized geomeans for both artifacts, the
round-over-round ratio per class and overall, and a per-key table
flagging deltas that exceed the key's own IQR/median band.
"""

from __future__ import annotations

import json
import math
import os
import sys

# robust to any invocation cwd (r17 ADVICE: the old rsplit('/') trick
# broke when run as `python bench_compare.py` from inside tools/)
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from bench import LANE_CLASS  # noqa: E402

#: lanes whose class changed between rounds (the audited plan crossed
#: the documented shuffle/scan rule) — printed with every comparison so
#: a normalized-split delta isn't misread as a performance move when
#: one side's artifact predates the reclassification:
#:   r19: sim_ivf_trained, pipeline_rag_index_search shuffle→scan
#:   r20: join_levenshtein_band shuffle→scan (VERDICT r19 item 1 —
#:        the r19 materialization cut it to 4 exchanges / no shuffle
#:        join; both sides of a comparison run under the CURRENT class)
RECLASSIFIED = {
    "sim_ivf_trained": "r19 shuffle->scan",
    "pipeline_rag_index_search": "r19 shuffle->scan",
    "join_levenshtein_band": "r20 shuffle->scan",
}


def _load(path: str) -> dict:
    """Accept either a raw bench line (BENCH_LOCAL_*.json) or the
    driver's wrapper artifact (BENCH_r{N}.json = {n, rc, tail,
    parsed, ...}). For a wrapper, prefer the driver-parsed payload;
    else recover the bench line from the stdout tail (complete from
    r18 on — the line was slimmed to fit the ~2 KB tail buffer)."""
    art = json.load(open(path))
    if "queries" in art:
        return art
    if "parsed" in art or "tail" in art:
        if art.get("parsed"):
            return art["parsed"]
        tail = art.get("tail", "")
        # scan every '{"metric"' occurrence from last to first and take
        # the first that parses (r18 ADVICE: a truncated final line must
        # not mask an earlier complete line elsewhere in the tail)
        i = tail.rfind('{"metric"')
        while i >= 0:
            try:
                return json.loads(tail[i:].splitlines()[0])
            except json.JSONDecodeError:
                i = tail.rfind('{"metric"', 0, i)
        sys.exit(
            f"{path}: driver artifact holds only a truncated stdout tail "
            "(pre-r18 bench lines exceeded the driver's 2 KB buffer) — "
            "compare the matching BENCH_LOCAL_*.json instead"
        )
    sys.exit(f"{path}: not a bench artifact (no 'queries' and no 'tail')")


#: the measured full-set box-noise band (±11.6%, r16) — anchor spans
#: past it within one session mark drift the medians under-correct
_DRIFT_FLOOR = 0.116


def _warn_drift(art: dict, label: str) -> None:
    """Flag mid-session anchor drift (r19, VERDICT r18 item 3): each
    r19+ artifact carries (start, end) anchor samples; a span ratio
    past the noise floor means the session's box state moved while the
    queries ran — normalized deltas from that artifact are suspect in
    the drift's direction even after per-class normalization (the r18
    driver session's uniform ×1.17 pattern)."""
    for key in ("calibration_span", "calibration_shuffle_span"):
        span = art.get(key)
        if not span or len(span) != 2 or not all(v > 0 for v in span):
            continue
        ratio = max(span) / min(span)
        if ratio - 1 > _DRIFT_FLOOR:
            print(
                f"WARNING: {label or 'artifact'} {key} drifted x{ratio:.2f} "
                f"start->end ({span[0]} -> {span[1]}) — mid-session box-state "
                "drift beyond the ±11.6% floor; treat this side's "
                "normalized values as inflated/deflated accordingly",
                file=sys.stderr,
            )


def _norm(art: dict, label: str = "") -> dict[str, float]:
    _warn_drift(art, label)
    cal = art["calibration"]
    cal_sh = art.get("calibration_shuffle")
    if cal_sh is None:
        # pre-r16 artifacts carry one anchor only; flag it so a mixed
        # comparison's shuffle-class ratios are visibly anchor-mixed
        # (r17 ADVICE) instead of silently falling back
        print(
            f"WARNING: {label or 'artifact'} has no calibration_shuffle — "
            "shuffle-class lanes normalized by the scan anchor on this side",
            file=sys.stderr,
        )
        cal_sh = cal
    return {
        k: v / (cal_sh if LANE_CLASS.get(k) == "shuffle" else cal)
        for k, v in art["queries"].items()
        # the sink lane measures the write path, not a query — keep it
        # out of the query geomeans (r17 ADVICE), matching bench.py
        if k != "write_tables_concurrent"
    }


def _geomean(vals) -> float | None:
    vals = [v for v in vals if v and v > 0]
    if not vals:
        return None
    return math.exp(sum(math.log(v) for v in vals) / len(vals))


def main() -> None:
    new = _load(sys.argv[1])
    old = _load(sys.argv[2])
    detail = json.load(open(sys.argv[3])) if len(sys.argv) > 3 else {}
    nn, no = _norm(new, sys.argv[1]), _norm(old, sys.argv[2])
    shared = sorted(set(nn) & set(no))
    iqr = detail.get("iqr", {})

    def cls(k):
        return LANE_CLASS.get(k, "scan")

    def _fmt(x) -> str:
        # a class with no shared keys has no geomean (r17 ADVICE: the
        # unconditional :.3f crashed on scale/BENCH_ONLY artifacts)
        return f"{x:.3f}" if x is not None else "n/a"

    print(f"shared keys: {len(shared)}")
    for k, note in RECLASSIFIED.items():
        if k in shared:
            print(f"note: {k} reclassified {note} — both sides use the current class")
    for c in ("scan", "shuffle"):
        keys = [k for k in shared if cls(k) == c]
        gn, go = _geomean([nn[k] for k in keys]), _geomean([no[k] for k in keys])
        ratio = gn / go if gn and go else None
        print(
            f"class {c:7s} ({len(keys):2d} keys): normalized geomean "
            f"new={_fmt(gn)} old={_fmt(go)} ratio={_fmt(ratio)}"
        )
    g_all_n = _geomean([nn[k] for k in shared])
    g_all_o = _geomean([no[k] for k in shared])
    g_ratio = g_all_n / g_all_o if g_all_n and g_all_o else None
    print(
        f"ALL (own-anchor)     : new={_fmt(g_all_n)} old={_fmt(g_all_o)} "
        f"ratio={_fmt(g_ratio)}"
    )
    print()
    hdr = f"{'key':38s} {'cls':7s} {'new':>7s} {'old':>7s} {'ratio':>6s} {'band':>6s} sig"
    print(hdr)
    for k in sorted(shared, key=lambda k: nn[k] / no[k]):
        ratio = nn[k] / no[k]
        med = new["queries"][k]
        band = (iqr.get(k, 0.0) / med) if med else 0.0
        # a delta is flagged significant only when it exceeds the
        # key's own sample spread (IQR/median) — the stated noise band
        sig = "*" if abs(ratio - 1) > max(band, 0.116) else ""
        print(
            f"{k:38s} {cls(k):7s} {nn[k]:7.3f} {no[k]:7.3f} {ratio:6.3f} "
            f"{band:6.3f} {sig}"
        )


if __name__ == "__main__":
    main()
