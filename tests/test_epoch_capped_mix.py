"""Epoch-capped token-budget mixing (r14, the data-constrained
regime): the water-filling allocation must cap small sources at
max_epochs·tokens and re-spend the freed budget on uncapped sources;
the materialization must emit exactly full-epoch passes plus a
greedy-prefix partial pass in the deterministic hash order."""

from __future__ import annotations

import pytest


def test_water_filling_allocation_arithmetic():
    from build_datawarehouse_demo_spark.operators.sampling import (
        epoch_capped_quotas,
        temperature_quotas,
    )

    counts = {"big": 1000, "mid": 300, "small": 50}
    budget, E = 2000, 2
    # T=1 round 1: quotas ∝ tokens -> big 1481, mid 444, small 74
    # round 1 caps: small 74 <= 100 ok, mid 444 > 600? no... compute:
    q = epoch_capped_quotas(counts, budget, 1.0, E)
    # hand replay of the loop:
    rem, left, want = dict(counts), budget, {}
    while rem and left > 0:
        r = temperature_quotas(rem, left, 1.0)
        over = [s for s in rem if r[s] > E * rem[s]]
        if not over:
            want.update(r)
            break
        for s in over:
            want[s] = E * rem[s]
            left -= want[s]
            del rem[s]
    assert q == want
    # every cap respected, budget never exceeded
    assert all(q[s] <= E * counts[s] for s in counts)
    assert sum(q.values()) <= budget

    # a budget larger than E x total caps EVERYTHING (under-filled)
    q2 = epoch_capped_quotas(counts, 10_000, 1.0, E)
    assert q2 == {s: E * n for s, n in counts.items()}

    # flattening (T=3) must cap the small source before the big one
    q3 = epoch_capped_quotas({"big": 10_000, "small": 100}, 6000, 3.0, E)
    assert q3["small"] == 200  # capped at 2 epochs
    assert q3["big"] > 200 and q3["big"] <= 2 * 10_000

    with pytest.raises(ValueError, match="max_epochs"):
        epoch_capped_quotas(counts, budget, 1.0, 0)


def test_epoch_materialization(spark):
    from build_datawarehouse_demo_spark.operators.sampling import (
        epoch_capped_quotas,
        sample_epoch_capped_mix,
    )

    # source a: 3 docs x 10 tokens = 30; source b: 20 docs x 10 = 200.
    # budget 180, T=1, E=3: round 1 -> a 23, b 156; a <= 90, b <= 600,
    # nothing caps... choose T=3 to overdraw a: weights 30^(1/3) vs
    # 200^(1/3) -> a gets ~ 180*0.31 = 57 <= 90 still. Use E=1:
    # a caps at 30, b water-fills to 150 <= 200.
    rows = [(i, "a", 10) for i in range(3)] + [
        (100 + i, "b", 10) for i in range(20)
    ]
    df = spark.createDataFrame(rows, "doc_id long, src string, n_tok long")
    q = epoch_capped_quotas({"a": 30, "b": 200}, 180, 3.0, 1)
    assert q["a"] == 30  # capped at one full epoch
    assert 30 < q["b"] <= 180 - 30 + 1

    out = sample_epoch_capped_mix(
        df, "src", "doc_id", "n_tok", token_budget=180, max_epochs=1,
        temperature=3.0,
    )
    got = [(r["doc_id"], r["src"], r["epoch"], r["tok_cum"]) for r in out.collect()]
    a_rows = [g for g in got if g[1] == "a"]
    b_rows = [g for g in got if g[1] == "b"]
    # a: exactly one FULL pass (quota == tokens -> full=1, rem=0):
    # every doc once at epoch 0, none at epoch 1
    assert sorted((d, e) for d, _, e, _ in a_rows) == [(i, 0) for i in range(3)]
    # b: partial pass only (quota < tokens): prefix of the hash order,
    # all at epoch 0, running sums within quota
    assert all(e == 0 for _, _, e, _ in b_rows)
    assert len(b_rows) == q["b"] // 10
    assert max(t for *_, t in b_rows) <= q["b"]

    # quota-0 contract (r15 ADVICE): a source that draws quota 0 must
    # contribute NOTHING, even when its leading hash-order documents
    # have 0 tokens (tok_cum 0 <= __rem 0 used to slip through the
    # partial-epoch filter). z totals 1 token vs b's 200 at budget 50:
    # floor quota is 0 for z, and its zero-token doc must not appear.
    zrows = rows + [(200, "z", 0), (201, "z", 1)]
    zdf = spark.createDataFrame(zrows, "doc_id long, src string, n_tok long")
    qz = epoch_capped_quotas({"z": 1, "b": 200}, 50, 1.0, 3)
    assert qz["z"] == 0
    outz = sample_epoch_capped_mix(
        zdf.where("src != 'a'"), "src", "doc_id", "n_tok",
        token_budget=50, max_epochs=3, temperature=1.0,
    )
    assert outz.where("src = 'z'").count() == 0

    # with repetition: budget 90 for a alone at E=3 -> 3 full passes
    out2 = sample_epoch_capped_mix(
        df.where("src = 'a'"), "src", "doc_id", "n_tok",
        token_budget=90, max_epochs=3, temperature=1.0,
    )
    got2 = sorted((r["doc_id"], r["epoch"]) for r in out2.collect())
    assert got2 == sorted((i, e) for i in range(3) for e in range(3))


def test_weighted_epoch_mix_soft_class_costs_one_doc_per_epoch(spark):
    """The r19 weight-aware multi-epoch mixer consuming
    dedup_soft_weights-style output: a duplicate class of 4 copies at
    weight 1/4 charges the budget ~ONE document's tokens per epoch
    (every copy still appears in each full pass), so the same token
    budget buys MORE full epochs than the unweighted accounting."""
    from build_datawarehouse_demo_spark.operators.sampling import (
        sample_epoch_capped_mix,
    )

    # one source: 4 exact copies at weight 1/4 (10 tokens each) + 4
    # singletons at weight 1 (10 tokens each). Weighted mass per pass
    # = 4*(1/4)*10 + 4*1*10 = 50 tokens; unweighted mass = 80.
    rows = [(i, "a", 10, 0.25) for i in range(4)] + [
        (10 + i, "a", 10, 1.0) for i in range(4)
    ]
    df = spark.createDataFrame(rows, "doc_id long, src string, n_tok long, weight double")

    # budget 100 tokens, E=3: weighted -> quota 100e6 mu-tok over a
    # 50e6 mu-tok pass = 2 FULL epochs (rem 0); unweighted the same
    # budget affords only 1 full pass of 80 + a 20-token partial.
    out = sample_epoch_capped_mix(
        df, "src", "doc_id", "n_tok", token_budget=100, max_epochs=3,
        temperature=1.0, weight_col="weight",
    )
    got = sorted((r["doc_id"], r["epoch"]) for r in out.collect())
    assert got == sorted((d, e) for d, _, _, _ in rows for e in range(2))
    # per-pass weighted running sums stay within one pass's mass
    assert out.groupBy().max("wtok_cum").collect()[0][0] == 50_000_000

    base = sample_epoch_capped_mix(
        df, "src", "doc_id", "n_tok", token_budget=100, max_epochs=3,
        temperature=1.0,
    )
    epochs = dict(
        base.groupBy("epoch").count().collect()
    )
    assert epochs[0] == 8 and epochs.get(1, 0) < 8  # 1 full + partial

    # caps are weighted too: budget 1000 >> 3 epochs of 50 weighted
    # tokens -> everything caps at exactly max_epochs full passes
    capped = sample_epoch_capped_mix(
        df, "src", "doc_id", "n_tok", token_budget=1000, max_epochs=3,
        temperature=1.0, weight_col="weight",
    )
    assert capped.count() == 8 * 3
    # nonpositive / null weights are non-drawable (and never counted)
    wz = spark.createDataFrame(
        [(1, "a", 10, 0.0), (2, "a", 10, None), (3, "a", 10, 1.0)],
        "doc_id long, src string, n_tok long, weight double",
    )
    outz = sample_epoch_capped_mix(
        wz, "src", "doc_id", "n_tok", token_budget=10, max_epochs=2,
        temperature=1.0, weight_col="weight",
    )
    assert sorted(r["doc_id"] for r in outz.collect()) == [3]


def test_keep_best_soft_composed_policy(spark):
    """dedup_keep_best_soft (r19): is_kept marks the component member
    maximizing (rank, then smallest id) — dedup_keep_best's rule —
    while EVERY member carries weight = 1/|component| — the
    dedup_soft_weights rule; singletons keep themselves at weight 1."""
    from build_datawarehouse_demo_spark.operators.dedup import (
        dedup_keep_best_soft,
    )

    df = spark.createDataFrame(
        [(1, 5.0), (2, 9.0), (3, 9.0), (4, 1.0)],
        "doc_id long, score double",
    )
    from build_datawarehouse_demo_spark.operators.dedup import (
        connected_components_star,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "id_a long, id_b long"
    )
    comp = connected_components_star(pairs)
    out = {
        r["doc_id"]: (r["is_kept"], r["n_members"], r["weight"])
        for r in dedup_keep_best_soft(df, comp, rank_col="score").collect()
    }
    # component {1,2,3}: best rank 9.0 tie -> smaller id 2 wins; all
    # three carry 1/3 weight
    assert out[1] == (False, 3, round(1 / 3, 6))
    assert out[2] == (True, 3, round(1 / 3, 6))
    assert out[3] == (False, 3, round(1 / 3, 6))
    # singleton keeps itself at weight 1
    assert out[4] == (True, 1, 1.0)
