"""Round-18 registry entries.

Theme (VERDICT r17 item 1): the KEEP-BEST policy threaded through the
incremental curation state — the survivor of every duplicate class is
the member maximizing (rank, then smallest id) instead of the min id,
and a later higher-rank re-crawl DISPLACES the stored representative.
The oracle is the r12 full-chain DuckDB restatement with the final
representative selection swapped for a row_number window over every
component member (keep_best_rank), banding pinned at the OLD subset
count — so the hash match proves incremental keep-best ≡ one-shot
keep-best rebuild, end to end through the displacement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from build_datawarehouse_demo_spark.registry import register
from build_datawarehouse_demo_spark.registry_round7 import _driver_rows, _t
from build_datawarehouse_demo_spark.registry_round10 import _driver_old_subset_count


def register_round18_keep_best_incremental() -> None:
    from build_datawarehouse_demo_spark.operators.dedup import minhash_auto_params
    from build_datawarehouse_demo_spark.operators.text import (
        default_classifier_weights,
    )
    from build_datawarehouse_demo_spark.registry_round12 import (
        _CLF_T,
        _GQ_MINW,
        _GQ_STOP,
        _QC_DIM,
        _TOPG,
        _clean_filter_dedup_sql,
        pageify,
    )

    _N_DOCS = _driver_rows("documents", 500)
    _SPLIT_AT = (3 * _N_DOCS) // 4
    _N_OLD = _driver_old_subset_count(_SPLIT_AT)
    _MB, _MR = minhash_auto_params(_N_OLD)
    _W_SQL = "[" + ", ".join(repr(x) for x in default_classifier_weights(_QC_DIM)) + "]"

    @register(
        "pipeline_clean_filter_dedup_keep_best",
        oracle=_clean_filter_dedup_sql(
            _MB, _MR, _W_SQL, keep_best_rank="clf_score"
        ),
    )
    def q_clean_filter_dedup_keep_best(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """The incremental modern cleaning stack under the KEEP-BEST
        policy (r18, VERDICT r17 item 1): clean_filter_dedup_state on
        the first 3/4 of the pageified corpus with
        ``rank_col='clf_score'`` — every duplicate class keeps its
        HIGHEST-QUALITY member, ties to the smaller id — then the last
        1/4 folded in as one monotone batch through
        clean_filter_dedup_apply at the same policy. Unlike min-id, a
        higher-rank later copy DISPLACES the stored representative;
        the fold recomputes winners for exactly the batch-touched
        components (one slim min_by over their stored keeps + the
        batch survivors — plans/training_data.clean_filter_dedup_apply
        has the stage argument) and reuses every untouched stored row.
        The oracle runs the full batch chain over the union at the
        state's frozen banding with the keep-best final selection, so
        the hash match IS the refresh ≡ rebuild proof for the policy.
        component_id is the component's star label (its min id), which
        under keep-best need not be the kept row's id."""
        from build_datawarehouse_demo_spark.plans.training_data import (
            clean_filter_dedup_apply,
            clean_filter_dedup_state,
        )

        docs = pageify(_t(spark, sf_dir, "documents").select("doc_id", "text"))
        n = docs.count()
        split_at = (3 * n) // 4
        old = docs.filter(F.col("doc_id") < split_at)
        batch = docs.filter(F.col("doc_id") >= split_at)
        knobs = dict(
            min_words=_GQ_MINW,
            min_stopword_hits=_GQ_STOP,
            max_top_gram_char_frac=_TOPG,
            clf_dim=_QC_DIM,
            clf_threshold=_CLF_T,
            rank_col="clf_score",
        )
        state = clean_filter_dedup_state(old, corpus_n=old.count(), **knobs)
        refreshed = clean_filter_dedup_apply(batch, state, **knobs)
        return refreshed["output"]


def register_round18_weighted_mix() -> None:
    # ------------------------------------------------------------------
    # soft dedup -> weighted mixing, end to end (VERDICT r17 item 2):
    # the corpus is re-crawled (every even-id document appears twice
    # under a later id), exact-digest duplicate classes get
    # dedup_soft_weights' 1/|class| mass, and the token-budget mixer
    # consumes it — quotas, order and fill all in WEIGHTED tokens, so
    # a duplicate class costs the budget ~one document. Every step is
    # exact micro-unit integer arithmetic except the per-row ES key (a
    # pure row function both engines derive identically — the
    # sample_weighted_reservoir precedent); the oracle re-derives the
    # T=1 quotas independently in HUGEINT SQL.
    # ------------------------------------------------------------------
    from build_datawarehouse_demo_spark.registry_extensions import _HASH32, _TOK

    _WB = 5000  # token budget (plain tokens; quotas run in micro-tokens)
    _es_hash = _HASH32.format(expr="'0:wtokmix:' || CAST(doc_id AS VARCHAR)")

    @register(
        "sample_token_budget_mix_weighted",
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
        wd AS (
          SELECT d.doc_id, d.lang, d.n_ws_tokens,
                 round(1.0 / cls.n, 6) AS weight,
                 CAST(round(round(1.0 / cls.n, 6) * 1000000, 0) AS BIGINT) AS mw
          FROM d JOIN cls USING (dg)
        ),
        c AS (SELECT lang, sum(mw * n_ws_tokens) AS wtok FROM wd GROUP BY lang),
        tot AS (SELECT sum(wtok) AS t FROM c),
        tgt AS (
          SELECT lang,
                 CAST((CAST({_WB} AS HUGEINT) * 1000000 * wtok) // t AS BIGINT)
                   AS wtok_quota
          FROM c, tot
        ),
        r AS (
          SELECT doc_id, lang, n_ws_tokens, weight,
                 CAST(sum(mw * n_ws_tokens) OVER (PARTITION BY lang
                     ORDER BY ln(({_es_hash} + 1) / 4294967296.0)
                              / CAST(mw AS DOUBLE) DESC,
                              doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS wtok_cum
          FROM wd
        )
        SELECT r.doc_id, r.lang, r.n_ws_tokens, r.weight, r.wtok_cum,
               g.wtok_quota
        FROM r JOIN tgt g ON g.lang = r.lang
        WHERE r.wtok_cum <= g.wtok_quota
        """,
    )
    def q_weighted_token_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Soft-dedup mass flowing into training-data assembly (r18,
        VERDICT r17 item 2): a deterministic re-crawl doubles every
        even-id document under a later id; exact-digest components give
        each duplicate class dedup_soft_weights' 1/|class| weight; the
        weight-aware token-budget mixer (T=1) then draws with
        probability ∝ weight and accounts quotas in weighted tokens —
        the duplicate class costs ~one document's tokens instead of
        two. All quota/fill arithmetic is exact micro-unit integers
        (operators/sampling._micro_weight); the draw order is the
        engine-portable Efraimidis–Spirakis id-hash key."""
        from build_datawarehouse_demo_spark.operators.dedup import (
            dedup_soft_weights,
        )
        from build_datawarehouse_demo_spark.operators.sampling import (
            sample_token_budget_mix,
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
        return sample_token_budget_mix(
            soft,
            "lang",
            "doc_id",
            "n_ws_tokens",
            token_budget=_WB,
            temperature=1.0,
            weight_col="weight",
        ).select("doc_id", "lang", "n_ws_tokens", "weight", "wtok_cum", "wtok_quota")


def register_round18_weighted_temperature_mix() -> None:
    # ------------------------------------------------------------------
    # the DOCUMENT-quota twin of sample_token_budget_mix_weighted:
    # soft-dedup mass drives the per-source document quotas (micro-doc
    # units), the ES key orders the draw, the fill is the running
    # weighted-mass prefix. T=1 so the oracle re-derives the quotas
    # independently in HUGEINT SQL (the fixed-point scale cancels).
    # ------------------------------------------------------------------
    from build_datawarehouse_demo_spark.registry_extensions import _HASH32

    _WDB = 120  # document budget (plain docs; quotas run in micro-docs)
    _es_hash = _HASH32.format(expr="'0:wtemp:' || CAST(doc_id AS VARCHAR)")

    @register(
        "sample_temperature_mix_weighted",
        oracle=f"""
        WITH corpus AS (
          SELECT doc_id, lang, text FROM documents WHERE doc_id IS NOT NULL
          UNION ALL
          SELECT doc_id + 1000000, lang, text FROM documents
          WHERE doc_id IS NOT NULL AND doc_id % 2 = 0
        ),
        d AS (SELECT doc_id, lang, md5(text) AS dg FROM corpus),
        cls AS (SELECT dg, count(*) AS n FROM d GROUP BY dg),
        wd AS (
          SELECT d.doc_id, d.lang,
                 round(1.0 / cls.n, 6) AS weight,
                 CAST(round(round(1.0 / cls.n, 6) * 1000000, 0) AS BIGINT) AS mw
          FROM d JOIN cls USING (dg)
        ),
        c AS (SELECT lang, sum(mw) AS mass FROM wd GROUP BY lang),
        tot AS (SELECT sum(mass) AS t FROM c),
        tgt AS (
          SELECT lang,
                 CAST((CAST({_WDB} AS HUGEINT) * 1000000 * mass) // t AS BIGINT)
                   AS wdoc_quota
          FROM c, tot
        ),
        r AS (
          SELECT doc_id, lang, weight,
                 CAST(sum(mw) OVER (PARTITION BY lang
                     ORDER BY ln(({_es_hash} + 1) / 4294967296.0)
                              / CAST(mw AS DOUBLE) DESC,
                              doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS wdoc_cum
          FROM wd
        )
        SELECT r.doc_id, r.lang, r.weight, r.wdoc_cum, g.wdoc_quota
        FROM r JOIN tgt g ON g.lang = r.lang
        WHERE r.wdoc_cum <= g.wdoc_quota
        """,
    )
    def q_weighted_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Weighted DOCUMENT-quota mixing (r18): the re-crawled corpus'
        soft-dedup mass (1/|exact-digest class|) drives per-language
        quotas in exact micro-doc integers; the draw is the
        Efraimidis–Spirakis id-hash key, the fill the greedy prefix of
        the running weighted mass — a duplicate class counts as ~one
        document toward its source's quota (the document-unit twin of
        sample_token_budget_mix_weighted)."""
        from build_datawarehouse_demo_spark.operators.dedup import (
            dedup_soft_weights,
        )
        from build_datawarehouse_demo_spark.operators.sampling import (
            sample_temperature_mix,
        )

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
        soft = dedup_soft_weights(corpus, comp)
        return sample_temperature_mix(
            soft,
            "lang",
            "doc_id",
            budget=_WDB,
            temperature=1.0,
            weight_col="weight",
        ).select("doc_id", "lang", "weight", "wdoc_cum", "wdoc_quota")


def register_round18_neardup_keep_best() -> None:
    # ------------------------------------------------------------------
    # the NEARDUP twin of pipeline_clean_filter_dedup_keep_best: the
    # span-removal-bearing pipeline's incremental state under the
    # keep-best policy (rank = quality). The oracle is the r9 full
    # chain with the representative selection swapped for the
    # row_number keep window — the span stage then runs over the
    # WINNER set, so the hash match proves the policy through gram
    # ownership, span rebuilds and the label/keep separation.
    # ------------------------------------------------------------------
    from build_datawarehouse_demo_spark.operators.dedup import minhash_auto_params
    from build_datawarehouse_demo_spark.registry_round9 import (
        neardup_full_chain_sql,
    )

    _N_DOCS = _driver_rows("documents", 500)
    _SPLIT_AT = (3 * _N_DOCS) // 4
    _N_OLD = _driver_old_subset_count(_SPLIT_AT)
    _MB, _MR = minhash_auto_params(_N_OLD)

    @register(
        "pipeline_training_data_neardup_keep_best",
        oracle=neardup_full_chain_sql(_MB, _MR, keep_best_rank="quality"),
    )
    def q_training_neardup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
        """The span-bearing neardup pipeline run incrementally under
        KEEP-BEST (r18, VERDICT r17 item 1): state on the first 3/4 of
        the corpus with ``rank_col='quality'`` — every near-dup class
        keeps its highest-quality member (ties to the smaller id) —
        then the last 1/4 folded in through
        training_data_neardup_apply at the same policy. A higher-rank
        near-dup in the batch DISPLACES its stored representative: its
        grams enter the span index, the loser's leave, and affected
        documents re-span — all through the apply's delta machinery.
        The oracle replays the whole chain over the union at the
        frozen banding with the keep-best representative window, so
        the hash match is the refresh ≡ rebuild proof for the policy
        through the span stage."""
        from build_datawarehouse_demo_spark.plans.training_data import (
            prepare_training_data_neardup_incremental,
            training_data_neardup_state,
        )

        docs = _t(spark, sf_dir, "documents")
        n = docs.count()
        split_at = (3 * n) // 4
        old = docs.filter(F.col("doc_id") < split_at)
        batch = docs.filter(F.col("doc_id") >= split_at)
        state = training_data_neardup_state(
            old, corpus_n=old.count(), rank_col="quality"
        )
        return prepare_training_data_neardup_incremental(
            batch, state, rank_col="quality"
        )


def register_round18_soft_incremental() -> None:
    # ------------------------------------------------------------------
    # the THIRD keep policy through the incremental state (r18): DROP-
    # FREE soft dedup — every survivor kept at 1/|component| weight,
    # folded incrementally (only batch-touched components re-weight /
    # re-label), the exact feed the weight-aware mixers consume. With
    # min-id (default) and keep-best (rank_col), the policy triple the
    # curation literature runs is now complete on the same machinery.
    # ------------------------------------------------------------------
    from build_datawarehouse_demo_spark.operators.dedup import minhash_auto_params
    from build_datawarehouse_demo_spark.operators.text import (
        default_classifier_weights,
    )
    from build_datawarehouse_demo_spark.registry_round12 import (
        _CLF_T,
        _GQ_MINW,
        _GQ_STOP,
        _QC_DIM,
        _TOPG,
        _clean_filter_dedup_sql,
        pageify,
    )

    _N_DOCS = _driver_rows("documents", 500)
    _SPLIT_AT = (3 * _N_DOCS) // 4
    _N_OLD = _driver_old_subset_count(_SPLIT_AT)
    _MB, _MR = minhash_auto_params(_N_OLD)
    _W_SQL = "[" + ", ".join(repr(x) for x in default_classifier_weights(_QC_DIM)) + "]"

    @register(
        "pipeline_clean_filter_dedup_soft",
        oracle=_clean_filter_dedup_sql(_MB, _MR, _W_SQL, soft_weights=True),
    )
    def q_clean_filter_dedup_soft(spark: SparkSession, sf_dir: str) -> DataFrame:
        """The incremental cleaning stack under SOFT dedup (r18):
        clean_filter_dedup_state on the first 3/4 of the pageified
        corpus with ``soft_weights=True`` — EVERY surviving document
        kept, each duplicate class carrying one unit of training mass
        (weight = 1/|component|, the dedup_soft_weights contract) —
        then the last 1/4 folded in through clean_filter_dedup_apply
        at the same policy. A fold recomputes exactly the
        batch-touched components' member rows (their sizes and labels
        are the only things a fold can change; old members of touched
        components are pair-graph nodes, so the stored-survivor scan
        prunes to them) and reuses everything else. The oracle runs
        the full chain over the union at the frozen banding with the
        soft final selection, so the hash match proves refresh ≡
        rebuild INCLUDING the re-weighting of classes the batch grew.
        Output feeds the weight-aware mixers directly
        (sample_token_budget_mix weight_col)."""
        from build_datawarehouse_demo_spark.plans.training_data import (
            clean_filter_dedup_apply,
            clean_filter_dedup_state,
        )

        docs = pageify(_t(spark, sf_dir, "documents").select("doc_id", "text"))
        n = docs.count()
        split_at = (3 * n) // 4
        old = docs.filter(F.col("doc_id") < split_at)
        batch = docs.filter(F.col("doc_id") >= split_at)
        knobs = dict(
            min_words=_GQ_MINW,
            min_stopword_hits=_GQ_STOP,
            max_top_gram_char_frac=_TOPG,
            clf_dim=_QC_DIM,
            clf_threshold=_CLF_T,
            soft_weights=True,
        )
        state = clean_filter_dedup_state(old, corpus_n=old.count(), **knobs)
        refreshed = clean_filter_dedup_apply(batch, state, **knobs)
        return refreshed["output"]
