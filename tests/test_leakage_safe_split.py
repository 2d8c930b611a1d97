"""Leakage-safe train/val/test split (r14): near-dup component members
must share one split (no train/test straddle — the benchmark-leakage
mechanism), singletons must keep their plain per-id split, and the
assignment must stay disjoint + exhaustive."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F


def _plain_bucket(ident) -> int:
    """train_val_test_split's bucket, restated (the oracle's
    md5('0:split:' || id) % 1000 contract)."""
    return int(hashlib.md5(f"0:split:{ident}".encode()).hexdigest()[:8], 16) % 1000


def _plain_split(ident) -> str:
    b = _plain_bucket(ident)
    return "val" if b < 100 else ("test" if b < 200 else "train")


def test_near_dups_never_straddle_and_singletons_unchanged(spark):
    from build_datawarehouse_demo_spark.operators.dedup import minhash_dedup_pairs
    from build_datawarehouse_demo_spark.operators.sampling import (
        leakage_safe_split,
        train_val_test_split,
    )

    # find two ids whose PLAIN splits differ — the pair a per-id hash
    # split would tear across the boundary
    id_a = next(i for i in range(1000) if _plain_split(i) == "val")
    id_b = next(
        i for i in range(1000) if i != id_a and _plain_split(i) == "train"
    )
    lo, hi = min(id_a, id_b), max(id_a, id_b)
    base = [f"tok{i}" for i in range(60)]
    near = base[:56] + [f"x{i}" for i in range(4)]  # jaccard ~0.87 >= 0.8
    singles = [(5000 + d, " ".join(f"s{d}_{i}" for i in range(30))) for d in range(6)]
    rows = [(lo, " ".join(base)), (hi, " ".join(near))] + singles
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    pairs = minhash_dedup_pairs(docs)
    assert {(r.id_a, r.id_b) for r in pairs.select("id_a", "id_b").collect()} == {
        (lo, hi)
    }

    out = leakage_safe_split(docs.select("doc_id"), pairs)
    got = {r["doc_id"]: (r["component_id"], r["split"]) for r in out.collect()}

    # the near-dup pair collapses to one component, min-id rep, ONE
    # split for both members — drawn from the rep's id, so it equals
    # the plain split of the rep
    assert got[lo] == (lo, _plain_split(lo))
    assert got[hi] == (lo, _plain_split(lo))
    # ...whereas the plain per-id split would have torn them apart
    assert _plain_split(lo) != _plain_split(hi)

    # singletons: own component, split identical to train_val_test_split
    plain = {
        r["doc_id"]: r["split"]
        for r in train_val_test_split(docs.select("doc_id"), "doc_id").collect()
    }
    for d, _ in singles:
        assert got[d] == (d, plain[d])

    # disjoint + exhaustive: every row labeled, one row per input doc
    assert len(got) == len(rows)
    assert all(s in ("train", "val", "test") for _, s in got.values())


def test_component_split_stable_under_corpus_growth(spark):
    """The split of an existing component must not move when unrelated
    documents arrive (the train_val_test_split stability contract,
    lifted to components): component ids depend only on member ids, so
    the draw is unchanged."""
    from build_datawarehouse_demo_spark.operators.dedup import minhash_dedup_pairs
    from build_datawarehouse_demo_spark.operators.sampling import leakage_safe_split

    base = [f"gtok{i}" for i in range(50)]
    near = base[:46] + [f"y{i}" for i in range(4)]
    rows = [(10, " ".join(base)), (11, " ".join(near))]
    extra = [(900 + d, " ".join(f"z{d}_{i}" for i in range(25))) for d in range(5)]

    def split_of(rows_):
        docs = spark.createDataFrame(rows_, "doc_id long, text string")
        out = leakage_safe_split(
            docs.select("doc_id"), minhash_dedup_pairs(docs)
        )
        return {r["doc_id"]: r["split"] for r in out.collect()}

    small = split_of(rows)
    grown = split_of(rows + extra)
    assert small[10] == grown[10] and small[11] == grown[11]
    assert grown[10] == grown[11]
