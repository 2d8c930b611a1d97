"""Regression gate on the COMMITTED scale curve (VERDICT round 7,
item 1): the round-6 quadratic (fixed-signature embedding LSH,
exponent 2.09 at sf1→sf4) was caught by measurement but its fix lived
only in prose — a future round could reintroduce a super-linear query
and no committed artifact would show it. This gate reads the NEWEST
committed ``BENCH_SCALE_r*_sf1_sf4.json`` and fails if any query's
measured scaling exponent exceeds the linear-with-noise ceiling.

The gate intentionally targets the newest round's file only: older
files are honest historical records (r06 contains the pre-fix
quadratic and its saturation-polluted neighbors) and must stay
unchanged.
"""

from __future__ import annotations

import glob
import json
import os
import re

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: ceiling on log(t_big/t_small)/log(data_ratio). 1.0 = perfectly
#: linear; the margin absorbs box noise on sub-second queries without
#: letting a genuine quadratic (exponent ~2) through.
MAX_EXPONENT = 1.1

#: documented super-linear-BY-DESIGN lanes: each gets its own (tighter
#: than quadratic) cap and a stated cost model, so the measurement
#: stays visible — the round-6 lesson was that unmeasured lanes hide —
#: while the gate still catches a regression past the designed curve.
DESIGNED_CAPS = {
    # signature width grows log2(n) (ann_auto_planes), so total
    # projection work is O(n log n) while candidates stay flat;
    # expected exponent 1 + log(planes_big/planes_small)/log(4)
    "sim_ann_rp_lsh_auto": (1.3, "O(n log n): log2(n)-wide signature"),
    # same signature-growth curve, directed-multiprobe lane (probe
    # fanout is CONSTANT 2^T, so only the log2(n) plane count grows)
    "sim_ann_rp_lsh_auto_directed": (1.3, "O(n log n): log2(n)-wide signature"),
    # r7's flat IVF build (exponent 1.42 under a 1.6 cap) was
    # LINEARIZED in r8 — sampled quantizer training + two-level
    # assignment — so sim_ivf_trained now rides the default 1.1
    # ceiling with no designed cap (VERDICT r7 item 1 done).
    # lsh_auto_params holds recall >= 0.93 at fixed threshold while
    # keeping bucket occupancy flat: r grows log2(n) AND bands grow to
    # compensate the narrower buckets (sf1 (12,10) -> sf4 (16,12) =
    # 1.6x more projections per row), so signature work is
    # O(n log^2 n) while CANDIDATES stay linear (pinned by the
    # 4x-corpus -> <9x-candidates pytest). Theoretical exponent from
    # plane growth alone: 1 + log(192/120)/log(4) = 1.34. This is the
    # designed price of the round-6 fix — the 2.09 it replaced came
    # from quadratic candidate growth, a different (and fatal) curve.
    "dedup_embedding_cosine_auto": (1.35, "O(n log^2 n) signature growth"),
    # same curve, text lane: minhash_auto_params grows rows ln(n) AND
    # bands to re-hold recall as t^r shrinks -> O(n log^2 n) signature
    # work while background candidates stay linear
    "dedup_minhash_lsh_auto": (1.35, "O(n log^2 n) signature growth"),
    # block width grows log2(n) -> O(n log n) signature work,
    # candidates linear (bucket-saturation pytest). NOTE r8: the
    # all-pairs lane itself left the headline — its OUTPUT is
    # quadratic on clustered corpora (Hamming-0 pairs inside
    # duplicate-signature clusters; measured 1.785, BENCH_SCALE_
    # r08_PRELIM.json) — replaced by dedup_simhash_collapse (linear
    # radius-0 dedup) + dedup_simhash_rep_pairs (pairs between
    # distinct-signature representatives). The cap stays for any
    # artifact that still carries the old key.
    "dedup_simhash_auto": (1.3, "O(n log n): log2(n)-wide blocks"),
    # signature work O(n log n); collapse is one exchange on the
    # signature. (rep-pairs is not headlined: candidate volume is
    # signature-entropy-bound on low-entropy corpora — see bench.py)
    "dedup_simhash_collapse": (1.3, "O(n log n): log2(n)-wide signature"),
    # r9 composed pipeline: its asymptotically-dominant stage is the
    # auto-banded MinHash near-dup (O(n log^2 n) signature growth, the
    # same designed curve as dedup_minhash_lsh_auto); every other stage
    # is linear (one feature scan, digest exchanges, O(log n) star
    # rounds over the near-dup pair graph, token-stream span removal),
    # so the composition inherits the minhash cap (VERDICT r8 item 1:
    # "sf1->sf4 exponent <= the minhash lane's 1.35 cap")
    "pipeline_training_data_neardup": (1.35, "O(n log^2 n) minhash stage"),
    # r10 composed RAG pipeline: chunk+embed are linear (one scan);
    # the sqrt(n_chunks) quantizer's two-level assignment costs
    # O(n * nlist^(1/4)) = O(n^1.125) with gprobe routing, and the
    # sampled training O(ppc * nlist^2) = O(ppc * n) — worst designed
    # exponent ~1.2 with the regime transition (full-corpus Lloyd at
    # the small leg, sampled at the big legs) pushing the measured
    # number DOWN, not up. Cap mirrors the ANN auto lanes' margin.
    "pipeline_rag_index_search": (1.3, "O(n^1.125) two-level assign"),
    # r12 composed pipeline: the modern cleaning stack's filter front
    # is one linear codegen scan (test_clean_filter_front_is_narrow);
    # the asymptotically-dominant stage is the auto-banded MinHash
    # near-dup — the same O(n log^2 n) designed curve (and cap) as
    # pipeline_training_data_neardup / dedup_minhash_lsh_auto.
    "pipeline_clean_filter_dedup": (1.35, "O(n log^2 n) minhash stage"),
}


def _scale_files(suffix: str) -> list[str]:
    """Committed scale artifacts for one lever arm: the shared
    headline curves (BENCH_SCALE_r*) AND the targeted per-lane curves
    (BENCH_SCALE_RAG_r* — uppercase, so the lowercase r-glob alone
    silently skipped them; caught when the refreshed RAG arm passed
    the full suite while still carrying a 1.66 exponent). Pre-fix
    records keep their _PRECATCH/_PRELIM suffix out of the glob."""
    return glob.glob(
        os.path.join(ROOT, f"BENCH_SCALE_r*_{suffix}.json")
    ) + glob.glob(os.path.join(ROOT, f"BENCH_SCALE_*_r*_{suffix}.json"))


def _round_no(p: str) -> int:
    m = re.search(r"_r(\d+)_", os.path.basename(p))
    return int(m.group(1)) if m else -1


def _newest_round_files(suffix: str) -> list[str]:
    """ALL artifacts of the newest round for this arm — the headline
    curve and every targeted curve measured the same round are one
    cohort; checking only max() would let whichever file ties last
    alphabetically shadow the other's exponents."""
    files = _scale_files(suffix)
    if not files:
        return []
    newest = max(_round_no(p) for p in files)
    return sorted(p for p in files if _round_no(p) == newest)


def _offenders(path: str) -> dict[str, float]:
    with open(path) as f:
        data = json.load(f)
    assert data["data_ratio"] >= 2, "scale curve needs a real data ratio"
    return {
        name: q["exponent"]
        for name, q in data["queries"].items()
        if q["exponent"] > DESIGNED_CAPS.get(name, (MAX_EXPONENT,))[0]
    }


def test_committed_scale_curve_has_no_superlinear_query():
    paths = _newest_round_files("sf1_sf4")
    if not paths:
        pytest.skip("no committed sf1->sf4 scale artifact yet")
    for path in paths:
        if re.search(r"_r0?6_", os.path.basename(path)):
            pytest.fail(
                "newest committed scale artifact is still round 6's (contains "
                "the known pre-fix quadratic + saturation-polluted neighbors); "
                "commit the post-fix curve as BENCH_SCALE_r7+_sf1_sf4.json"
            )
        offenders = _offenders(path)
        assert not offenders, (
            f"{os.path.basename(path)} records super-linear scaling "
            f"(exponent > {MAX_EXPONENT}) for: {offenders} — a scale-killer "
            "landed (fixed-parameter sketch? candidate blowup? plan that "
            "stopped fitting). Fix the operator or isolate/justify the entry "
            "before committing the curve."
        )


def test_long_lever_curve_has_no_superlinear_query():
    """The r9 lesson: the 4x arm is too short — the embedding lane
    measured 1.113 at sf1->sf4 while hiding an interpreted-fold +
    candidate-shuffle blowup that the 8x arm exposed at 1.913
    (BENCH_SCALE_r09_sf1_sf8_PRECATCH.json, fixed same round). Every
    newest-round sf1->sf8 artifact rides the SAME caps as the 4x
    gate; pre-fix records carry a suffix that keeps them out of the
    glob, exactly like r8's _PRELIM."""
    paths = _newest_round_files("sf1_sf8")
    if not paths:
        pytest.skip("no committed sf1->sf8 artifact yet")
    for path in paths:
        offenders = _offenders(path)
        assert not offenders, (
            f"{os.path.basename(path)}: sf1->sf8 curve records super-linear "
            f"scaling past the designed caps: {offenders}"
        )


def test_scale_curve_covers_the_auto_lsh_lane():
    """The exact gap that let round 6's quadratic hide: the scale-safe
    lane existed but was never in the measured set. The committed
    curve must include the auto-scaled embedding LSH entry."""
    paths = _newest_round_files("sf1_sf4")
    if not paths:
        pytest.skip("no committed sf1->sf4 scale artifact yet")
    if all(re.search(r"_r0?6_", os.path.basename(p)) for p in paths):
        pytest.skip("round-6 artifact predates the auto entry")
    covered = set()
    for path in paths:
        with open(path) as f:
            covered |= set(json.load(f)["queries"])
    assert "dedup_embedding_cosine_auto" in covered


def test_semdedup_targeted_curve_within_designed_cap():
    """SemDeDup's production sizing (nlist = n^(2/3)) balances train /
    assign / prune at O(n^(4/3)) — a law the headline sf1->sf4 curve
    cannot see because the REGISTERED entry pins the sqrt(n) quantizer
    for oracle reuse. The targeted artifact
    (tools/bench_semdedup_scale.py, sf1->sf4->sf8 at production
    sizing) carries the measurement; this gate holds its long-lever
    exponent to the designed cap so a regression in any chain stage
    (train sample parallelism, two-level assign fan-out, prune pair
    volume) surfaces in CI, not at 100 TB."""
    files = glob.glob(os.path.join(ROOT, "BENCH_SEMDEDUP_SCALE_r*.json"))
    if not files:
        pytest.skip("no committed targeted SemDeDup scale artifact yet")

    def round_no(p: str) -> int:
        m = re.search(r"_r(\d+)", os.path.basename(p))
        return int(m.group(1)) if m else -1

    with open(max(files, key=round_no)) as f:
        data = json.load(f)
    cap = data["designed_cap"]
    long_lever = data["exponents_raw"]["sf1_sf8"]
    assert long_lever <= cap, (
        f"SemDeDup targeted sf1->sf8 exponent {long_lever} exceeds its "
        f"designed O(n^(4/3)) cap {cap} — a chain stage regressed past "
        "the balanced-sizing law"
    )
    # the legs must actually be at production sizing in the sampled-
    # train regime, or the artifact measures a different law
    for leg in data["legs"]:
        assert leg["sample_modulus"] > 1, (
            f"leg {leg['sf_dir']} trained on the FULL corpus "
            "(sample_modulus 1) — the artifact is measuring full-corpus "
            "Lloyd, not the sampled-train law the cap is derived for"
        )


@pytest.mark.parametrize("lever", ["sf1_sf4", "sf1_sf8"])
def test_rag_pipeline_targeted_curve_within_designed_cap(lever):
    """The RAG pipeline got its designed cap (O(n^1.125) two-level
    assign) in the same round it was headlined; per the repo's method
    note every designed-cap lane owes an 8x confirmation. The targeted
    single-query artifacts (BENCH_SCALE_RAG_r*_sf1_sf{4,8}.json —
    named outside the full-headline glob so they can never shadow it)
    carry the measurement.

    Parametrized per lever (r11 ADVICE): a skip for a missing sf1_sf4
    artifact used to abort the WHOLE test, silently un-gating the
    sf1_sf8 curve — now each lever skips or gates independently."""
    files = glob.glob(os.path.join(ROOT, f"BENCH_SCALE_RAG_r*_{lever}.json"))
    if not files:
        pytest.skip(f"no targeted RAG {lever} artifact yet")

    def round_no(p: str) -> int:
        m = re.search(r"_r(\d+)_", os.path.basename(p))
        return int(m.group(1)) if m else -1

    with open(max(files, key=round_no)) as f:
        data = json.load(f)
    q = data["queries"]["pipeline_rag_index_search"]
    cap = DESIGNED_CAPS["pipeline_rag_index_search"][0]
    assert q["exponent"] <= cap, (
        f"RAG pipeline {lever} exponent {q['exponent']} exceeds its "
        f"designed cap {cap}"
    )
