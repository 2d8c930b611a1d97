"""Round-19 registry entries.

Theme (VERDICT r18 items 2 and 5): weight-awareness reaches the
multi-epoch mixer — ``sample_epoch_capped_mix`` consumes soft-dedup
mass with caps, quotas and fills all accounted in exact micro-weighted
tokens, the water-filling allocation RE-DERIVED independently in
HUGEINT SQL (unrolled rounds — at T = 1/2 the temperature weight is
wtok², exact integer arithmetic end to end) — and the composed
curation policy lands: keep the BEST copy AND down-weight its
near-class (dedup_keep_best_soft).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from build_datawarehouse_demo_spark.registry import register
from build_datawarehouse_demo_spark.registry_round7 import _t


def _waterfill_ctes(budget_micro: int, max_epochs: int, rounds: int) -> str:
    """Unrolled epoch-capped water-filling at T = 1/2, entirely in
    HUGEINT SQL (r19, VERDICT r18 item 2: "caps re-derived in HUGEINT
    SQL" — the r14 key pinned the allocation as derived VALUES; this
    oracle recomputes it from the data inside DuckDB).

    Each round mirrors one iteration of
    operators/sampling.epoch_capped_quotas: uncapped sources draw
    quota q_s = (budget_left · wtok_s²) // Σ_uncapped wtok² (T = 1/2
    ⇒ 1/T = 2, so the temperature weight is the exact integer square;
    ``temperature_quotas``' 10^30 fixed-point scale is a common factor
    of numerator and denominator and cancels under floor division),
    any source whose draw exceeds its repetition cap
    (max_epochs · wtok_s) is capped AT the cap and its cap leaves the
    budget, and the loop re-runs until stable. ``rounds`` unrolled
    iterations suffice for any corpus with <= rounds sources (each
    round either converges or caps at least one source); extra rounds
    are no-ops on a converged state. Expects a CTE ``wd(lang, mw,
    n_ws_tokens, ...)`` in scope; emits ``plan(lang, eful, erem)``.
    """
    ctes = [
        f"""w0 AS MATERIALIZED (
          SELECT lang, CAST(sum(mw * n_ws_tokens) AS HUGEINT) AS wtok,
                 CAST({max_epochs} AS HUGEINT)
                   * CAST(sum(mw * n_ws_tokens) AS HUGEINT) AS cap,
                 FALSE AS capped
          FROM wd GROUP BY lang
        )""",
        f"b0 AS MATERIALIZED (SELECT CAST({budget_micro} AS HUGEINT) AS b)",
    ]
    for i in range(1, rounds + 1):
        ctes.append(
            f"""q{i} AS MATERIALIZED (
          SELECT s.lang, s.wtok, s.cap, s.capped,
                 CASE WHEN s.capped OR b.b <= 0 THEN NULL
                      ELSE (b.b * s.wtok * s.wtok)
                           // (SELECT sum(wtok * wtok) FROM w{i - 1}
                               WHERE NOT capped)
                 END AS q
          FROM w{i - 1} s, b{i - 1} b
        )"""
        )
        ctes.append(
            f"""w{i} AS MATERIALIZED (
          SELECT lang, wtok, cap,
                 capped OR COALESCE(q > cap, FALSE) AS capped
          FROM q{i}
        )"""
        )
        ctes.append(
            f"""b{i} AS MATERIALIZED (
          SELECT b.b - COALESCE((SELECT sum(cap) FROM q{i}
                                 WHERE NOT capped AND q > cap), 0) AS b
          FROM b{i - 1} b
        )"""
        )
    ctes.append(
        f"""quota AS (
          SELECT lang, wtok,
                 CASE WHEN capped OR COALESCE(q > cap, FALSE) THEN cap
                      ELSE COALESCE(q, 0) END AS quota
          FROM q{rounds}
        )"""
    )
    ctes.append(
        """plan AS (
          SELECT lang, CAST(quota // wtok AS BIGINT) AS eful,
                 CAST(quota % wtok AS BIGINT) AS erem
          FROM quota WHERE wtok > 0
        )"""
    )
    return ",\n        ".join(ctes)


def register_round19_weighted_epoch_mix() -> None:
    # ------------------------------------------------------------------
    # soft dedup -> WEIGHTED MULTI-EPOCH mixing (VERDICT r18 item 2):
    # the re-crawled corpus' soft-dedup mass flows through the
    # data-constrained mixer — repetition caps, water-filled quotas and
    # the greedy partial-epoch fill all in exact micro-weighted tokens.
    # T = 1/2 sharpens toward the head source, so the budget over-draws
    # it past the 2-epoch cap and the freed budget water-fills into the
    # tail — the capping path is exercised AND fully re-derived in
    # HUGEINT SQL (unrolled rounds; no pinned VALUES).
    # ------------------------------------------------------------------
    from build_datawarehouse_demo_spark.registry_extensions import _HASH32, _TOK

    _WEB = 40_000  # token budget (plain tokens; quotas run in micro-tokens)
    _WEEP = 2  # max epochs per source
    _es_hash = _HASH32.format(expr="'0:wepochmix:' || CAST(doc_id AS VARCHAR)")

    @register(
        "sample_epoch_capped_mix_weighted",
        oracle=f"""
        WITH corpus AS (
          SELECT doc_id, lang, text FROM documents WHERE doc_id IS NOT NULL
          UNION ALL
          SELECT doc_id + 1000000, lang, text FROM documents
          WHERE doc_id IS NOT NULL AND doc_id % 2 = 0
        ),
        d AS (
          SELECT doc_id, lang,
                 CAST(len({_TOK}) AS BIGINT) AS n_ws_tokens,
                 md5(text) AS dg
          FROM corpus
        ),
        cls AS (SELECT dg, count(*) AS n FROM d GROUP BY dg),
        wd AS MATERIALIZED (
          SELECT d.doc_id, d.lang, d.n_ws_tokens,
                 round(1.0 / cls.n, 6) AS weight,
                 CAST(round(round(1.0 / cls.n, 6) * 1000000, 0) AS BIGINT) AS mw
          FROM d JOIN cls USING (dg)
        ),
        {_waterfill_ctes(_WEB * 1_000_000, _WEEP, 8)},
        r AS (
          SELECT doc_id, lang, n_ws_tokens, weight,
                 CAST(sum(mw * n_ws_tokens) OVER (PARTITION BY lang
                     ORDER BY ln(({_es_hash} + 1) / 4294967296.0)
                              / CAST(mw AS DOUBLE) DESC,
                              doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS wtok_cum
          FROM wd
        ),
        fe AS (
          SELECT r.doc_id, r.lang, r.n_ws_tokens, r.weight, r.wtok_cum,
                 CAST(e.e AS BIGINT) AS epoch
          FROM r JOIN plan q ON q.lang = r.lang,
               unnest(generate_series(0, q.eful - 1)) AS e(e)
        ),
        pe AS (
          SELECT r.doc_id, r.lang, r.n_ws_tokens, r.weight, r.wtok_cum,
                 CAST(q.eful AS BIGINT) AS epoch
          FROM r JOIN plan q ON q.lang = r.lang
          WHERE q.erem > 0 AND r.wtok_cum <= q.erem
        )
        SELECT * FROM fe UNION ALL SELECT * FROM pe
        """,
    )
    def q_weighted_epoch_capped_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Soft-dedup mass through the MULTI-EPOCH mixer (r19, VERDICT
        r18 item 2): a deterministic re-crawl doubles every even-id
        document; exact-digest classes carry dedup_soft_weights'
        1/|class| mass; sample_epoch_capped_mix(weight_col='weight')
        then accounts repetition caps, water-filled quotas AND the
        greedy partial-epoch fill in exact micro-weighted tokens — a
        duplicate class costs the budget ~one document's tokens per
        epoch while every copy stays in each full pass. T = 1/2
        over-draws the head language past the 2-epoch cap, so the
        water-filling redistribution is exercised, and the oracle
        re-derives the whole allocation independently in HUGEINT SQL
        (unrolled water-fill rounds — no pinned VALUES, unlike the
        r14 unweighted key)."""
        from build_datawarehouse_demo_spark.operators.dedup import (
            dedup_soft_weights,
        )
        from build_datawarehouse_demo_spark.operators.sampling import (
            sample_epoch_capped_mix,
        )
        from build_datawarehouse_demo_spark.operators.text import token_count

        docs = (
            _t(spark, sf_dir, "documents", rebalance=False)
            .select("doc_id", "lang", "text")
            .where(F.col("doc_id").isNotNull())
        )
        recrawl = docs.where(F.col("doc_id") % 2 == 0).select(
            (F.col("doc_id") + F.lit(1_000_000)).alias("doc_id"), "lang", "text"
        )
        corpus = docs.unionByName(recrawl)
        dg = corpus.withColumn("__dg", F.md5("text"))
        comp = (
            dg.groupBy("__dg")
            .agg(F.min("doc_id").alias("component"))
            .join(dg, "__dg")
            .select(F.col("doc_id").alias("node"), "component")
        )
        soft = dedup_soft_weights(token_count(corpus), comp)
        return sample_epoch_capped_mix(
            soft,
            "lang",
            "doc_id",
            "n_ws_tokens",
            token_budget=_WEB,
            max_epochs=_WEEP,
            temperature=0.5,
            weight_col="weight",
        ).select(
            "doc_id", "lang", "n_ws_tokens", "weight", "wtok_cum", "epoch"
        )


def register_round19_keep_best_soft() -> None:
    # ------------------------------------------------------------------
    # the COMPOSED curation policy (VERDICT r18 item 5): keep the best
    # copy AND down-weight its near-class. Same simhash pair graph and
    # star components as dedup_cluster_keep_best, so the key differs
    # from its r17 sibling ONLY in the added soft mass — and the oracle
    # pins exactly that composition (row_number keep window + the
    # 1/|component| weight from the same membership).
    # ------------------------------------------------------------------
    from build_datawarehouse_demo_spark.registry_extensions import _HASH32, _TOK

    pair_ctes = f"""
        tok AS (
          SELECT DISTINCT doc_id, tok
          FROM documents, unnest({_TOK}) AS t(tok)
        ),
        hashed AS (
          SELECT doc_id, {_HASH32.format(expr="'0:' || tok")} AS h FROM tok
        ),
        votes AS (
          SELECT doc_id, i AS bit,
                 sum(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) AS v
          FROM hashed, unnest(generate_series(0, 31)) AS g(i)
          GROUP BY doc_id, i
        ),
        sigs AS (
          SELECT doc_id,
                 CAST(sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS simhash
          FROM votes GROUP BY doc_id
        ),
        blocked AS (
          SELECT doc_id, simhash, blk, (simhash >> (blk * 8)) & 255 AS blk_val
          FROM sigs, unnest(generate_series(0, 3)) AS g(blk)
        ),
        pairs AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM blocked a
          JOIN blocked b ON a.blk = b.blk AND a.blk_val = b.blk_val AND a.doc_id < b.doc_id
          WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
        )"""

    @register(
        "dedup_cluster_keep_best_soft",
        oracle=f"""
        WITH RECURSIVE {pair_ctes},
        edges AS MATERIALIZED (
          SELECT id_a AS s, id_b AS d FROM pairs
          UNION SELECT id_b, id_a FROM pairs
        ),
        reach(s, d) AS (
          SELECT s, d FROM edges
          UNION SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s
        ),
        comp AS (SELECT s AS node, least(s, min(d)) AS component FROM reach GROUP BY s),
        memb AS (
          SELECT doc.doc_id, doc.n_chars,
                 COALESCE(c.component, doc.doc_id) AS component_id
          FROM documents doc LEFT JOIN comp c ON c.node = doc.doc_id
        ),
        per AS (
          SELECT component_id, count(*) AS n_members
          FROM memb GROUP BY component_id
        ),
        keep AS (
          SELECT component_id, doc_id AS keep_id FROM (
            SELECT component_id, doc_id,
                   row_number() OVER (PARTITION BY component_id
                                      ORDER BY n_chars DESC, doc_id) AS rn
            FROM memb) WHERE rn = 1
        )
        SELECT m.doc_id, m.component_id, m.doc_id = k.keep_id AS is_kept,
               p.n_members, round(1.0 / p.n_members, 6) AS weight
        FROM memb m
        JOIN keep k ON k.component_id = m.component_id
        JOIN per p ON p.component_id = m.component_id
        """,
    )
    def q_dedup_cluster_keep_best_soft(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Near-dup clustering under the COMPOSED policy
        (operators/dedup.dedup_keep_best_soft, r19): each cluster
        keeps its LONGEST member (n_chars, id tiebreak — the
        dedup_cluster_keep_best rule) AND every row carries the
        cluster's soft mass (weight = 1/|component|), so filtering to
        is_kept yields best-copy survivors down-weighted by how many
        near-copies their content had — boilerplate that mirrored 100
        times trains at 1/100 mass through its single best copy. One
        slim per-component aggregate computes the argmax and the size
        together; documents never shuffle on content. The weight
        column feeds the weight-aware mixers directly."""
        from build_datawarehouse_demo_spark.operators.dedup import (
            connected_components_star,
            dedup_keep_best_soft,
            simhash,
            simhash_near_pairs,
        )

        docs = _t(spark, sf_dir, "documents")
        pairs = simhash_near_pairs(simhash(docs), max_hamming=3, blocks=4)
        comp = connected_components_star(pairs)
        return dedup_keep_best_soft(docs, comp, rank_col="n_chars").select(
            "doc_id", "component_id", "is_kept", "n_members", "weight"
        )
