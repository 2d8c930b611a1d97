"""Frozen-banding migration for the NEARDUP pipeline state (r15):
re-banding can change the component-rep set, and the span stage's gram
statistics are computed over the reps — so migration must repair the
span output for exactly the documents whose statistics changed.

The fixture is a SEARCHED, DETERMINISTIC borderline pair (md5-based
minhash is engine-stable): docs A and B share jaccard 0.81 — a true
near-dup pair that the (3, 2) banding of a 50-doc build point MISSES
(no band collides) and the (6, 4) banding of a 2000-doc corpus
CATCHES. Migration therefore merges their components, drops B, and
must flip doc C's span verdict: C shares one 5-token window with B
only (count 2 → span removed from C while B is a rep; count 1 after B
drops → C keeps it)."""

from __future__ import annotations

from tests.test_incremental_state_skew import _corpus, _rows

#: the searched pair (see module docstring): seed-3 generator doc and
#: its 4-token-tail variant — jaccard 0.81, (3,2) miss, (6,4) catch
_VOCAB = [
    "the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog", "and",
    "runs", "to", "its", "warm", "den", "of", "stone", "is", "near", "old",
    "mill", "by", "clear", "stream", "with", "a", "very", "calm", "wind",
]


def _gen(seed: int, n: int = 40) -> list[str]:
    return [
        _VOCAB[(seed * 7 + i * 3) % len(_VOCAB)]
        + (str((seed * 11 + i) % 97) if (seed + i) % 5 == 0 else "")
        for i in range(n)
    ]


A_WORDS = _gen(3)
B_WORDS = _gen(3)[:36] + ["varx46a", "varx46b", "varx46c", "varx46d"]
# C shares exactly one 5-token window with B ("of varx46a varx46b
# varx46c varx46d") and nothing near-dup-scale with anyone
C_WORDS = (
    [f"cuniq{i}" for i in range(16)]
    + ["of", "varx46a", "varx46b", "varx46c", "varx46d"]
    + [f"ctail{i}" for i in range(16)]
)


def test_neardup_migration_drops_rep_and_repairs_spans(spark):
    from build_datawarehouse_demo_spark.operators.dedup import minhash_auto_params
    from build_datawarehouse_demo_spark.plans.training_data import (
        migrate_training_data_neardup_banding,
        prepare_training_data_neardup,
        training_data_neardup_state,
    )

    assert minhash_auto_params(50) == (3, 2)
    assert minhash_auto_params(2000) == (6, 4)

    rows = [(i, " ".join(_gen(10 + i))) for i in range(6)]  # filler
    rows += [(6, " ".join(A_WORDS)), (7, " ".join(B_WORDS)), (8, " ".join(C_WORDS))]
    docs = _corpus(spark, rows)

    state = training_data_neardup_state(docs, corpus_n=50)
    assert (state["bands"], state["rows"]) == (3, 2)
    # the weak banding missed the A~B pair: both are reps, and C's
    # shared window with B is a dup span C (the non-owner) removed
    rep_ids = {r[0] for r in state["rep_ids"].collect()}
    assert 6 in rep_ids and 7 in rep_ids
    c_before = {r["doc_id"]: r for r in state["output"].collect()}[8]
    assert c_before["n_tokens_removed"] > 0

    migrated = migrate_training_data_neardup_banding(state, corpus_n=2000)
    assert (migrated["bands"], migrated["rows"]) == (6, 4)
    # the migrated banding catches the pair: B's component min is A, B
    # drops, and C regains its window (count fell to 1)
    rep_ids2 = {r[0] for r in migrated["rep_ids"].collect()}
    assert 6 in rep_ids2 and 7 not in rep_ids2
    out = {r["doc_id"]: r for r in migrated["output"].collect()}
    assert 7 not in out
    assert out[8]["n_tokens_removed"] == 0

    # exact rebuild parity at the NEW params
    full = prepare_training_data_neardup(docs, corpus_n=2000)
    assert _rows(migrated["output"]) == _rows(full)


def test_neardup_migration_noop_and_next_fold_parity(spark):
    from build_datawarehouse_demo_spark.plans.training_data import (
        migrate_training_data_neardup_banding,
        prepare_training_data_neardup,
        training_data_neardup_apply,
        training_data_neardup_state,
    )

    rows = [(i, " ".join(_gen(10 + i))) for i in range(6)]
    rows += [(6, " ".join(A_WORDS)), (7, " ".join(B_WORDS))]
    docs = _corpus(spark, rows)
    state = training_data_neardup_state(docs, corpus_n=50)
    # no-op path: same params → the SAME dict comes back
    assert migrate_training_data_neardup_banding(state, corpus_n=60) is state

    # migrate then fold a batch at the migrated banding: output equals
    # the full rebuild over the union at the new params (the oracle
    # key's contract, pinned here at fixture scale)
    migrated = migrate_training_data_neardup_banding(state, corpus_n=2000)
    batch = [(100, " ".join(_gen(55))), (101, " ".join(C_WORDS))]
    state2 = training_data_neardup_apply(_corpus(spark, batch), migrated)
    full = prepare_training_data_neardup(
        _corpus(spark, rows + batch), corpus_n=2000
    )
    assert _rows(state2["output"]) == _rows(full)
