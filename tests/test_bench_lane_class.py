"""bench.LANE_CLASS hygiene (r17): the per-class anchor normalization
is only as honest as the classification. This pins LANE_CLASS to the
documented rule applied to the committed PLANS.md audit — shuffle-class
iff the audited plan has a ShuffledHashJoin/SortMergeJoin that actually
exchanges, or >= 8 single-section exchanges (PLANS.md counts both AQE
plan sections, so >= 16 there). When a plan-shape change reclassifies a
lane, this fails until LANE_CLASS (and the round's comparison) is
updated — the classification cannot silently rot."""

from __future__ import annotations

import os
import re

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _plans_facts() -> dict[str, tuple[int, bool]]:
    txt = open(os.path.join(ROOT, "PLANS.md")).read()
    facts = {}
    for sec in re.split(r"^## ", txt, flags=re.M)[1:]:
        name = sec.split("\n", 1)[0].strip()
        ex = re.search(r"- exchanges: (\d+)", sec)
        joins = re.search(r"- joins: (.*)", sec)
        j = joins.group(1) if joins else ""
        if ex:
            facts[name] = (
                int(ex.group(1)),
                ("SortMergeJoin" in j or "ShuffledHashJoin" in j),
            )
    return facts


def test_lane_class_matches_plans_audit():
    import sys

    sys.path.insert(0, ROOT)
    from bench import HEADLINE, LANE_CLASS

    facts = _plans_facts()
    checked = 0
    mismatches = []
    for key in HEADLINE:
        if key not in facts:
            continue  # plan-only classified lanes are re-derived per round
        exchanges, has_shuffle_join = facts[key]
        want = (
            "shuffle"
            if ((has_shuffle_join and exchanges > 0) or exchanges >= 16)
            else "scan"
        )
        got = LANE_CLASS.get(key, "scan")
        if got != want:
            mismatches.append((key, got, want, exchanges, has_shuffle_join))
        checked += 1
    assert checked >= 20, "PLANS.md lost its headline coverage"
    assert not mismatches, (
        "LANE_CLASS disagrees with the PLANS.md audit under the documented "
        f"rule — update bench.LANE_CLASS (key, got, want, ex, sj): {mismatches}"
    )


def test_every_shuffle_lane_is_headlined_or_documented():
    """LANE_CLASS only matters for lanes the bench runs — a stale entry
    for a removed headline key would silently misclassify nothing, but
    flags a cleanup."""
    import sys

    sys.path.insert(0, ROOT)
    from bench import HEADLINE, LANE_CLASS

    stale = [k for k in LANE_CLASS if k not in HEADLINE]
    assert not stale, f"LANE_CLASS entries not in HEADLINE: {stale}"
