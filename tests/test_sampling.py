"""Deterministic sampling / split semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from build_datawarehouse_demo_spark.operators.sampling import (
    sample_by_hash,
    stratified_sample_by_hash,
    train_val_test_split,
)


def test_sample_reproducible_and_roughly_sized(spark):
    df = spark.range(10000).selectExpr("id")
    s1 = {r.id for r in sample_by_hash(df, "id", 0.3, seed=1).collect()}
    s2 = {r.id for r in sample_by_hash(df, "id", 0.3, seed=1).collect()}
    assert s1 == s2
    assert 0.25 < len(s1) / 10000 < 0.35
    # a different seed gives a different (but equally stable) sample
    s3 = {r.id for r in sample_by_hash(df, "id", 0.3, seed=2).collect()}
    assert s3 != s1


def test_sample_membership_stable_under_growth(spark):
    small = spark.range(1000).selectExpr("id")
    big = spark.range(5000).selectExpr("id")
    s_small = {r.id for r in sample_by_hash(small, "id", 0.2).collect()}
    s_big = {r.id for r in sample_by_hash(big, "id", 0.2).collect()}
    assert s_small == {i for i in s_big if i < 1000}


def test_stratified_rates(spark):
    df = spark.range(8000).selectExpr("id", "CASE WHEN id % 4 = 0 THEN 'rare' ELSE 'head' END AS g")
    out = stratified_sample_by_hash(df, "id", "g", {"rare": 1.0, "head": 0.1})
    counts = {r.g: r.n for r in out.groupBy("g").agg({"*": "count"}).withColumnRenamed("count(1)", "n").collect()}
    assert counts["rare"] == 2000
    assert 400 < counts["head"] < 800


def test_split_disjoint_exhaustive_stable(spark):
    df = spark.range(5000).selectExpr("id")
    out = train_val_test_split(df, "id", 0.1, 0.2)
    counts = {r.split: r.n for r in out.groupBy("split").agg({"*": "count"}).withColumnRenamed("count(1)", "n").collect()}
    assert sum(counts.values()) == 5000
    assert 0.05 < counts["val"] / 5000 < 0.15
    assert 0.15 < counts["test"] / 5000 < 0.25
    # growth stability: first 1000 rows keep their labels
    small = train_val_test_split(spark.range(1000).selectExpr("id"), "id", 0.1, 0.2)
    lab_small = {(r.id, r.split) for r in small.collect()}
    lab_big = {(r.id, r.split) for r in out.filter("id < 1000").collect()}
    assert lab_small == lab_big


def test_sample_and_stratified_draw_independent_buckets(spark):
    """Same seed, same nominal rate: the plain sampler and the
    stratified sampler must NOT select identical id sets (purpose
    salts keep the draws independent)."""
    from build_datawarehouse_demo_spark.operators.sampling import (
        sample_by_hash,
        stratified_sample_by_hash,
    )

    df = spark.createDataFrame(
        [(i, "en") for i in range(500)], "doc_id long, lang string"
    )
    plain = {r.doc_id for r in sample_by_hash(df, "doc_id", rate=0.2).collect()}
    strat = {
        r.doc_id
        for r in stratified_sample_by_hash(df, "doc_id", "lang", {"en": 0.2}).collect()
    }
    assert plain != strat
    assert 50 < len(plain) < 150 and 50 < len(strat) < 150  # both near 20%


def test_split_null_id_gets_null_label(spark):
    from build_datawarehouse_demo_spark.operators.sampling import train_val_test_split

    df = spark.createDataFrame([(1,), (None,)], "doc_id long")
    got = {r.doc_id: r.split for r in train_val_test_split(df, "doc_id").collect()}
    assert got[None] is None and got[1] in ("train", "val", "test")


def test_reservoir_sample_per_group_exact_k_and_deterministic(spark):
    df = spark.createDataFrame(
        [(i, "a" if i < 80 else "b") for i in range(100)] + [(None, "a")],
        "id long, g string",
    )
    from build_datawarehouse_demo_spark.operators.sampling import reservoir_sample_per_group

    s1 = reservoir_sample_per_group(df, "g", "id", k=10)
    rows = s1.collect()
    by_g = {}
    for r in rows:
        by_g.setdefault(r["g"], set()).add(r["id"])
    assert len(by_g["a"]) == 10 and len(by_g["b"]) == 10
    assert None not in by_g["a"]
    # deterministic under a different partitioning
    s2 = reservoir_sample_per_group(df.repartition(7), "g", "id", k=10)
    assert {(r["g"], r["id"]) for r in s2.collect()} == {(r["g"], r["id"]) for r in rows}
    # small groups return whole group
    tiny = reservoir_sample_per_group(df.where("g = 'b'"), "g", "id", k=500)
    assert tiny.count() == 20
    # seed changes the draw
    s3 = reservoir_sample_per_group(df, "g", "id", k=10, seed=1)
    assert {r["id"] for r in s3.collect()} != {r["id"] for r in rows}
    with pytest.raises(ValueError):
        reservoir_sample_per_group(df, "g", "id", k=0)


def test_weighted_reservoir_exact_k_and_weight_bias(spark):
    """A-ES with hash-derived uniforms: exactly min(k,|group|) rows,
    deterministic across runs, NULL/zero weights dropped, and the
    inclusion rate of heavy items dominates light ones (weight 50x ->
    heavy items should fill most of the sample)."""
    import pytest

    from build_datawarehouse_demo_spark.operators.sampling import (
        weighted_reservoir_per_group,
    )

    rows = [(i, "g", 50.0 if i < 40 else 1.0) for i in range(400)]
    rows += [(1000, "g", None), (1001, "g", 0.0), (None, "g", 9.0)]
    rows += [(2000 + i, "tiny", 1.0) for i in range(3)]
    df = spark.createDataFrame(rows, "id long, grp string, w double")

    got = weighted_reservoir_per_group(df, "grp", "id", "w", k=20).collect()
    by_grp = {}
    for r in got:
        by_grp.setdefault(r.grp, []).append(r.id)
    assert len(by_grp["g"]) == 20
    assert sorted(by_grp["tiny"]) == [2000, 2001, 2002]  # |group| < k
    assert 1000 not in by_grp["g"] and 1001 not in by_grp["g"]
    # 40 heavy (w=50) vs 360 light (w=1): heavy carry ~85% of total
    # mass; the hash is fixed so this is a deterministic assertion,
    # not a flaky statistical one
    n_heavy = sum(1 for i in by_grp["g"] if i < 40)
    assert n_heavy >= 12, by_grp["g"]
    # deterministic: second run identical
    again = weighted_reservoir_per_group(df, "grp", "id", "w", k=20).collect()
    assert {(r.grp, r.id) for r in again} == {(r.grp, r.id) for r in got}
    # seed changes the draw
    other = weighted_reservoir_per_group(df, "grp", "id", "w", k=20, seed=7).collect()
    assert {(r.grp, r.id) for r in other} != {(r.grp, r.id) for r in got}
    with pytest.raises(ValueError):
        weighted_reservoir_per_group(df, "grp", "id", "w", k=0)


def test_sample_temperature_mix_quota_law(spark):
    """Temperature mixing (T=2): per-source quotas follow sqrt(n) —
    the tail source's SHARE of the sample exceeds its share of the
    corpus, the head's shrinks; quota total stays within the budget;
    the draw is deterministic (same rows twice); other temperatures
    are rejected (IEEE-exactness contract)."""
    import pytest

    from build_datawarehouse_demo_spark.operators.sampling import (
        sample_temperature_mix,
    )

    rows = [(i, "head") for i in range(900)] + [(1000 + i, "tail") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    budget = 100
    out = sample_temperature_mix(df, "source", "doc_id", budget=budget).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, set()).add(r.doc_id)
    n_head, n_tail = len(by_src["head"]), len(by_src["tail"])
    assert n_head + n_tail <= budget
    # corpus shares 90/10; sqrt shares 0.75/0.25 — tail up-weighted
    assert n_tail / (n_head + n_tail) > 0.15
    assert n_head / (n_head + n_tail) < 0.85
    again = {
        (r.doc_id, r.source)
        for r in sample_temperature_mix(df, "source", "doc_id", budget=budget).collect()
    }
    assert again == {(r.doc_id, r.source) for r in out}
    with pytest.raises(ValueError, match="temperature"):
        sample_temperature_mix(df, "source", "doc_id", budget=budget, temperature=0.0)


def test_temperature_quotas_integer_contract():
    """The exact-integer quota math (VERDICT r8 item 2), parameterized
    over T: the former T=2-only IEEE restriction is gone and the
    contract is pure bigint arithmetic — verify the floor law against
    arbitrary-precision Fraction references, root exactness, and the
    temperature limits (T=1 natural, T→∞ uniform)."""
    from fractions import Fraction

    import pytest

    from build_datawarehouse_demo_spark.operators.sampling import (
        _TEMP_FP_SCALE,
        _iroot,
        temperature_quotas,
    )

    counts = {"head": 9000, "mid": 640, "tail": 27, "tiny": 1, "empty": 0}
    budget = 1000
    for temp in (0.5, 1.0, 1.5, 2.0, 3.0, 7.0):
        q = temperature_quotas(counts, budget, temp)
        assert q["empty"] == 0 if "empty" in q else True
        live = {s: n for s, n in counts.items() if n > 0}
        assert sum(q.values()) <= budget
        # floor law against an exact rational reference: the weight is
        # floor(n^(q/p) * S) by definition of the integer root, so
        # re-derive it independently with Fraction-exact checks
        t = Fraction(temp).limit_denominator(1000)
        p_, q_ = t.numerator, t.denominator
        w = {}
        for s, n in live.items():
            r = _iroot(n**q_ * _TEMP_FP_SCALE**p_, p_)
            assert r**p_ <= n**q_ * _TEMP_FP_SCALE**p_ < (r + 1) ** p_
            w[s] = r
        tot = sum(w.values())
        for s in live:
            assert q[s] == (budget * w[s]) // tot
        # monotone: more rows never means a smaller quota
        ordered = sorted(live, key=live.__getitem__)
        for a, b in zip(ordered, ordered[1:]):
            assert q[a] <= q[b]
    # T=1 is natural proportions exactly
    q1 = temperature_quotas(counts, budget, 1.0)
    tot = sum(n for n in counts.values() if n > 0)
    for s, n in counts.items():
        if n > 0:
            assert q1[s] == budget * n // tot
    # T→∞ tends to uniform: at T=1000, n^(1/T) is within 1% of 1 even
    # for the 9000-row head, so every live source sits within 1% of
    # budget / n_live
    qinf = temperature_quotas(counts, budget, 1000.0)
    live_n = sum(1 for n in counts.values() if n > 0)
    for s, n in counts.items():
        if n > 0:
            assert abs(qinf[s] - budget / live_n) <= budget * 0.01
    with pytest.raises(ValueError):
        temperature_quotas(counts, budget, -1.0)
    with pytest.raises(ValueError):
        _iroot(-1, 2)


def test_sample_temperature_mix_general_t(spark):
    """General-T behavior on a skewed corpus: higher T flattens the
    mix (tail share rises monotonically with T), and the draw stays
    deterministic at every T."""
    from build_datawarehouse_demo_spark.operators.sampling import (
        sample_temperature_mix,
    )

    rows = [(i, "head") for i in range(900)] + [(1000 + i, "tail") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    tail_share = []
    for temp in (1.0, 2.0, 4.0):
        out = sample_temperature_mix(
            df, "source", "doc_id", budget=100, temperature=temp
        ).collect()
        by = {}
        for r in out:
            by.setdefault(r.source, set()).add(r.doc_id)
        tail_share.append(len(by.get("tail", ())) / len(out))
        again = sample_temperature_mix(
            df, "source", "doc_id", budget=100, temperature=temp
        ).collect()
        assert {(r.doc_id, r.source) for r in again} == {
            (r.doc_id, r.source) for r in out
        }
    assert tail_share[0] < tail_share[1] < tail_share[2]
    # T=1 natural: ~10% tail; T=4: tail up-weighted past 20%
    assert abs(tail_share[0] - 0.1) < 0.02
    assert tail_share[2] > 0.2


def test_dsir_selects_target_vocabulary(spark):
    """Planted corpora with DISJOINT vocabularies: the target half
    writes with vocab A, the raw-only half with vocab B — importance
    weights then dwarf the Gumbel noise, so the top-k must be exactly
    the vocab-A lookalikes (the driver fixture shares one global
    vocabulary across langs, so the behavioral tilt lives here)."""
    from build_datawarehouse_demo_spark.operators.sampling import (
        importance_resample_dsir,
    )

    a_text = "alpha beta gamma delta " * 10
    b_text = "omega psi chi phi " * 10
    rows = []
    for i in range(30):
        rows.append((i, a_text, True))            # target examples
    for i in range(30, 60):
        rows.append((i, a_text, False))           # raw docs shaped like target
    for i in range(60, 120):
        rows.append((i, b_text, False))           # raw docs unlike target
    df = spark.createDataFrame(rows, "doc_id long, text string, is_tgt boolean")
    sel = importance_resample_dsir(
        df, target_pred=F.col("is_tgt"), k=55, n_buckets=64, id_col="doc_id"
    ).toPandas()
    assert len(sel) == 55
    # every selected doc is vocab-A (ids < 60): the ~40-nat weight gap
    # cannot be flipped by Gumbel noise (std ~1.28)
    assert (sel.doc_id < 60).all()


def test_dsir_deterministic_under_repartition(spark):
    from build_datawarehouse_demo_spark.operators.sampling import (
        importance_resample_dsir,
    )

    rows = [(i, f"tok{i % 7} tok{i % 5} tok{i % 3}", i % 2 == 0) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, text string, is_tgt boolean")
    r1 = importance_resample_dsir(
        df, F.col("is_tgt"), k=20, n_buckets=32
    ).toPandas()
    r2 = importance_resample_dsir(
        df.repartition(13), F.col("is_tgt"), k=20, n_buckets=32
    ).toPandas()
    assert sorted(r1.doc_id) == sorted(r2.doc_id)
    assert list(r1.sort_values("doc_id").score) == list(r2.sort_values("doc_id").score)


def test_dsir_zero_token_docs_never_drawn(spark):
    from build_datawarehouse_demo_spark.operators.sampling import (
        importance_resample_dsir,
    )

    rows = [(0, "a b c", True), (1, "   ", False), (2, "a b", False), (3, "", False)]
    df = spark.createDataFrame(rows, "doc_id long, text string, is_tgt boolean")
    sel = importance_resample_dsir(df, F.col("is_tgt"), k=10, n_buckets=16).toPandas()
    assert set(sel.doc_id) == {0, 2}


def _tokmix_reference(rows, budget, temperature, seed=0):
    """Brute Python reference for sample_token_budget_mix: quotas via
    temperature_quotas over per-source token totals, fill by greedy
    prefix of the md5 rank order (same hash the engine uses)."""
    import collections
    import hashlib

    from build_datawarehouse_demo_spark.operators.sampling import (
        temperature_quotas,
    )

    totals: dict = collections.defaultdict(int)
    for doc_id, src, tok in rows:
        if doc_id is None or tok is None:
            continue
        totals[src] += tok
    quotas = temperature_quotas(dict(totals), budget, temperature)

    def rank_key(doc_id):
        h = hashlib.md5(f"{seed}:tokmix:{doc_id}".encode()).hexdigest()[:8]
        return (int(h, 16), doc_id)

    kept = set()
    by_src: dict = collections.defaultdict(list)
    for doc_id, src, tok in rows:
        if doc_id is None or tok is None:
            continue
        by_src[src].append((doc_id, tok))
    for src, docs in by_src.items():
        cum = 0
        for doc_id, tok in sorted(docs, key=lambda d: rank_key(d[0])):
            cum += tok
            if cum > quotas.get(src, 0):
                break
            kept.add(doc_id)
    return kept, quotas


@pytest.mark.parametrize("temperature", [1.0, 1.5, 2.0, 3.0])
def test_sample_token_budget_mix_matches_reference(spark, temperature):
    """Token-budget mixing at several temperatures equals the brute
    Python reference (quota law + greedy-prefix fill), is
    deterministic, and every kept row's running sum respects the
    quota."""
    from build_datawarehouse_demo_spark.operators.sampling import (
        sample_token_budget_mix,
    )

    rows = (
        [(i, "head", 10 + (i * 7) % 90) for i in range(300)]
        + [(1000 + i, "tail", 5 + (i * 11) % 200) for i in range(40)]
        + [(2000, "mid", 0), (2001, "mid", 3), (None, "mid", 50), (2002, "mid", None)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tok long")
    budget = 4000
    out = sample_token_budget_mix(
        df, "source", "doc_id", "n_tok", token_budget=budget, temperature=temperature
    ).collect()
    ref_kept, ref_quotas = _tokmix_reference(rows, budget, temperature)
    assert {r.doc_id for r in out} == ref_kept
    for r in out:
        assert r.tok_cum <= r.token_quota == ref_quotas[r.source]
    again = sample_token_budget_mix(
        df, "source", "doc_id", "n_tok", token_budget=budget, temperature=temperature
    ).collect()
    assert {r.doc_id for r in again} == ref_kept


def test_sample_token_budget_mix_prefix_property(spark):
    """A first-ranked document larger than its source's whole quota
    empties that source (the kept set is a PREFIX of the rank order —
    nothing after an over-budget document sneaks in), and a zero-token
    document costs nothing."""
    from build_datawarehouse_demo_spark.operators.sampling import (
        sample_token_budget_mix,
    )

    rows = [(i, "a", 50) for i in range(10)] + [(100 + i, "b", 10) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tok long")
    # budget 60 at T=1: totals a=500, b=100 -> quotas a=50, b=10 — each
    # source can afford exactly its first-ranked document
    out = sample_token_budget_mix(df, "source", "doc_id", "n_tok", token_budget=60)
    got = out.collect()
    by_src = {}
    for r in got:
        by_src.setdefault(r.source, []).append(r)
    assert len(by_src.get("a", [])) == 1 and len(by_src.get("b", [])) == 1
    # shrink a's quota below any single document: source a vanishes,
    # nothing later in its rank order is promoted
    tiny = sample_token_budget_mix(
        df, "source", "doc_id", "n_tok", token_budget=20
    ).collect()
    assert all(r.source == "b" for r in tiny)


def test_shard_token_balanced_matches_global_cumsum(spark):
    """The distributed prefix-sum construction (range partition +
    per-partition cumsum + offsets) equals a brute global cumsum in
    hash order; shard token masses land within one document of
    total/N; the assignment is deterministic under input
    repartitioning."""
    import hashlib

    from build_datawarehouse_demo_spark.operators.sampling import (
        shard_token_balanced,
    )

    rows = [(i, 1 + (i * 13) % 97) for i in range(500)] + [(None, 40), (900, None)]
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    n_shards = 7
    out = shard_token_balanced(df, "doc_id", "n_tok", n_shards).collect()

    def hkey(doc_id):
        return int(hashlib.md5(f"0:shardord:{doc_id}".encode()).hexdigest()[:8], 16)

    ordered = sorted(
        [(i, t if t is not None else 0) for i, t in rows if i is not None],
        key=lambda r: (hkey(r[0]), r[0]),
    )
    total, cum, ref = sum(t for _, t in ordered), 0, {}
    for doc_id, tok in ordered:
        ref[doc_id] = (cum, min(n_shards - 1, cum * n_shards // total))
        cum += tok
    assert {r.doc_id: (r.prev_cum, r.shard) for r in out} == ref

    # balance: every shard's token mass within one max document of fair
    by_shard = {}
    for r in out:
        by_shard[r.shard] = by_shard.get(r.shard, 0) + r.n_tokens
    fair, max_doc = total / n_shards, max(t for _, t in ordered)
    assert set(by_shard) == set(range(n_shards))
    for mass in by_shard.values():
        assert abs(mass - fair) <= max_doc

    # deterministic under a different input partitioning
    again = shard_token_balanced(
        df.repartition(13), "doc_id", "n_tok", n_shards
    ).collect()
    assert {r.doc_id: (r.prev_cum, r.shard) for r in again} == ref


def test_shard_token_balanced_edges(spark):
    from build_datawarehouse_demo_spark.operators.sampling import (
        shard_token_balanced,
    )

    # all-zero token corpus: everything in shard 0, prev_cum 0
    zero = spark.createDataFrame(
        [(i, 0) for i in range(5)], "doc_id long, n_tok long"
    )
    got = shard_token_balanced(zero, "doc_id", "n_tok", 4).collect()
    assert len(got) == 5
    assert all(r.shard == 0 and r.prev_cum == 0 for r in got)
    # n_shards=1 puts everything in shard 0 but keeps the cumsum
    one = shard_token_balanced(
        spark.createDataFrame([(1, 5), (2, 7)], "doc_id long, n_tok long"),
        "doc_id", "n_tok", 1,
    ).collect()
    assert all(r.shard == 0 for r in one)
    # the later doc's prev_cum is the earlier doc's token count
    assert sorted(r.prev_cum for r in one) in ([0, 5], [0, 7])
    with pytest.raises(ValueError, match="n_shards"):
        shard_token_balanced(zero, "doc_id", "n_tok", 0)


def test_weighted_token_budget_mix_soft_dedup_class_costs_one_doc(spark):
    """The r18 weight-aware mixer consuming dedup_soft_weights output
    (VERDICT r17 item 2): a duplicate class of 4 copies at weight 1/4
    costs the token budget ~ONE document's tokens — all copies stay
    drawable, the class contributes one unit of mass. Contrast: the
    unweighted mixer at the same budget can only afford 3 documents."""
    from build_datawarehouse_demo_spark.operators.dedup import dedup_soft_weights
    from build_datawarehouse_demo_spark.operators.sampling import (
        sample_token_budget_mix,
    )
    from pyspark.sql import functions as F

    dup = "same boilerplate page body here"
    rows = [(i, "web", dup, 10) for i in range(1, 5)] + [
        (10, "web", "unique text one", 10),
        (11, "web", "unique text two", 10),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, src string, text string, n_tok long"
    )
    # exact-digest duplicate classes -> (node, component) frame
    comp = (
        docs.withColumn("__d", F.md5("text"))
        .groupBy("__d")
        .agg(F.min("doc_id").alias("component"))
        .join(docs.withColumn("__d", F.md5("text")), "__d")
        .select(F.col("doc_id").alias("node"), "component")
    )
    soft = dedup_soft_weights(docs, comp)
    assert {r["weight"] for r in soft.collect()} == {0.25, 1.0}
    # weighted mass = 4*0.25*10 + 2*10 = 30 tokens: budget 30 keeps ALL
    got = sample_token_budget_mix(
        soft, "src", "doc_id", "n_tok", token_budget=30, weight_col="weight"
    )
    kept = {r["doc_id"] for r in got.collect()}
    assert kept == {1, 2, 3, 4, 10, 11}
    # every cum stays within the micro-token quota
    assert all(
        r["wtok_cum"] <= r["wtok_quota"] == 30 * 1_000_000
        for r in got.collect()
    )
    # unweighted at the same budget: 6 docs * 10 tokens = 60 > 30 — the
    # greedy prefix stops at 3 documents (the policy difference)
    base = sample_token_budget_mix(
        docs, "src", "doc_id", "n_tok", token_budget=30
    )
    assert base.count() == 3


def test_weighted_mixers_drop_nonpositive_weights_and_are_deterministic(spark):
    """Drawable-population discipline: NULL/zero/negative weights leave
    before totals and can never be drawn; the weighted draw is a pure
    function of (data, budget, T, seed) — rerun-identical."""
    from build_datawarehouse_demo_spark.operators.sampling import (
        sample_temperature_mix,
        sample_token_budget_mix,
    )

    rows = [
        (1, "a", 10, 1.0),
        (2, "a", 10, 0.0),      # zero weight: never drawn
        (3, "a", 10, None),     # null weight: never drawn
        (4, "a", 10, 0.5),
        (5, "b", 10, 1.0),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, src string, n_tok long, wgt double"
    )
    got = sample_token_budget_mix(
        docs, "src", "doc_id", "n_tok", token_budget=1000, weight_col="wgt"
    )
    kept = {r["doc_id"] for r in got.collect()}
    assert kept == {1, 4, 5}
    again = sample_token_budget_mix(
        docs, "src", "doc_id", "n_tok", token_budget=1000, weight_col="wgt"
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, again.collect()))
    tm = sample_temperature_mix(
        docs, "src", "doc_id", budget=100, temperature=1.0, weight_col="wgt"
    )
    assert {r["doc_id"] for r in tm.collect()} == {1, 4, 5}


def test_weighted_temperature_mix_quotas_follow_weighted_mass(spark):
    """T=1 weighted document quotas are proportional to WEIGHTED doc
    mass, not row counts: source a = 4 docs at 1/4 (mass 1), source
    b = 3 docs at 1.0 (mass 3); budget 4 -> micro quotas 1e6 / 3e6,
    and the greedy weighted fill keeps every copy of both sources
    (the duplicate class fits in exactly one document of quota)."""
    from build_datawarehouse_demo_spark.operators.sampling import (
        sample_temperature_mix,
    )

    rows = [(i, "a", 0.25) for i in range(1, 5)] + [
        (i, "b", 1.0) for i in range(10, 13)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, src string, wgt double")
    got = sample_temperature_mix(
        docs, "src", "doc_id", budget=4, temperature=1.0, weight_col="wgt"
    )
    by_src = {}
    for r in got.collect():
        by_src.setdefault(r["src"], set()).add(r["doc_id"])
        assert r["wdoc_quota"] == (1_000_000 if r["src"] == "a" else 3_000_000)
    assert by_src == {"a": {1, 2, 3, 4}, "b": {10, 11, 12}}
