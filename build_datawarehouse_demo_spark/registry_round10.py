"""Round-10 registry entries.

Theme (VERDICT r9): incremental maintenance of the composed near-dup
training pipeline — corpus refresh without recompute — plus the
streaming front-half. Same oracle discipline as rounds 7-9: pinned
constants derived from the driver fixture through the SAME functions
the implementation calls.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from build_datawarehouse_demo_spark.registry import register
from build_datawarehouse_demo_spark.registry_round7 import (
    _DRIVER_SF_DIR,
    _driver_rows,
    _t,
)


def _driver_old_subset_count(
    split_at: int, table: str = "documents", id_col: str = "doc_id"
) -> int:
    """Rows of a driver fixture table with id < split_at — the
    OLD-corpus count that pins the incremental entries' frozen
    banding/quantizer (same fixture-derived-pin discipline as
    _driver_rows)."""
    try:
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        t = pq.read_table(f"{_DRIVER_SF_DIR}/{table}.parquet", columns=[id_col])
        return pc.sum(pc.less(t.column(id_col), split_at)).as_py() or 0
    except (ImportError, FileNotFoundError, OSError) as e:
        import warnings

        warnings.warn(
            f"_driver_old_subset_count: fixture unreadable "
            f"({type(e).__name__}: {e}) — falling back to split_at",
            stacklevel=2,
        )
        return split_at


def register_round10_incremental() -> None:
    # ------------------------------------------------------------------
    # incremental composed pipeline (VERDICT r9 item 3): fold a new
    # batch into a persisted pipeline state — reusing the stored band
    # keys, pairs, gram index and output — and prove the refreshed
    # output IDENTICAL to a full rebuild over old ∪ new at the state's
    # frozen banding parameters. The oracle IS that proof: DuckDB runs
    # the FULL chain over all documents (banding pinned from the OLD
    # subset count, the frozen-quantizer discipline of
    # ivf_index_append) while Spark runs the incremental path over the
    # 75/25 split; a hash match means refresh ≡ rebuild on the fixture.
    # ------------------------------------------------------------------
    from build_datawarehouse_demo_spark.operators.dedup import minhash_auto_params
    from build_datawarehouse_demo_spark.registry_round9 import neardup_full_chain_sql

    _N_DOCS = _driver_rows("documents", 500)
    _SPLIT_AT = (3 * _N_DOCS) // 4
    _N_OLD = _driver_old_subset_count(_SPLIT_AT)
    _MB, _MR = minhash_auto_params(_N_OLD)

    @register(
        "pipeline_training_data_neardup_incremental",
        oracle=neardup_full_chain_sql(_MB, _MR),
    )
    def q_training_neardup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Corpus refresh without recompute: build the pipeline state
        on the first 3/4 of the corpus (by doc_id — batches append with
        monotone ids, the log-structured contract), then fold the last
        1/4 in as TWO monotone batches with a state COMPACTION between
        them (r15 — the fold1 apply compacts the refreshed state to
        bucketed parquet tables and retires the superseded checkpoint
        blocks; fold2 runs against pure table scans). Old documents'
        signatures, near-dup pairs, span-gram index and output rows
        are REUSED from the state — only each batch is scanned, only
        affected documents are re-span-checked. The oracle runs the
        full chain over the UNION at the state's frozen banding, so
        the hash match is the refresh ≡ rebuild parity proof THROUGH
        the compaction (plans/training_data.py docstrings have the
        stage-by-stage argument)."""
        import uuid

        from build_datawarehouse_demo_spark.plans.training_data import (
            prepare_training_data_neardup_incremental,
            training_data_neardup_apply,
            training_data_neardup_state,
        )
        from build_datawarehouse_demo_spark.registry_extensions import (
            _bucketed_scratch_dir,
        )

        docs = _t(spark, sf_dir, "documents")
        n = docs.count()
        split_at = (3 * n) // 4
        mid = (7 * n) // 8
        old = docs.filter(F.col("doc_id") < split_at)
        b1 = docs.filter((F.col("doc_id") >= split_at) & (F.col("doc_id") < mid))
        b2 = docs.filter(F.col("doc_id") >= mid)
        state = training_data_neardup_state(old, corpus_n=old.count())
        tag = uuid.uuid4().hex[:8]
        state = training_data_neardup_apply(
            b1,
            state,
            compact_to=f"ndinc_{tag}",
            compact_path=f"{_bucketed_scratch_dir()}/ndinc_{tag}",
        )
        return prepare_training_data_neardup_incremental(b2, state)


def register_round10_fetch() -> None:
    # ------------------------------------------------------------------
    # client-boundary fetch round-trip (VERDICT r9 item 6): sink_fetch_df
    # was the one §2.1 op with pytest-only evidence — this closes it
    # with an oracle row by driving the REAL fetch path (spark.sql ->
    # Arrow toPandas) and handing the fetched frame back, so the hash
    # check proves the client boundary preserves values and types.
    # ------------------------------------------------------------------
    @register(
        "sink_fetch_df_roundtrip",
        oracle="""
        SELECT n_nationkey, n_name, n_regionkey
        FROM nation ORDER BY n_nationkey
        """,
    )
    def q_fetch_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
        """fetch_df (sources/catalog.py:19; reference fetchdf(),
        /root/reference/test_sql.py:8,14) exercised end-to-end: SQL
        over the registered star views, Arrow transfer to pandas at
        the driver, then re-ingested so the driver's value hash
        verifies the round-trip. The client boundary only — never an
        operator; the re-ingest exists purely to surface the fetched
        values to the correctness gate."""
        from build_datawarehouse_demo_spark.sources.catalog import fetch_df
        from build_datawarehouse_demo_spark.sources.readers import (
            register_star_views,
        )

        register_star_views(spark, sf_dir)
        pdf = fetch_df(
            spark,
            "SELECT n_nationkey, n_name, n_regionkey "
            "FROM nation ORDER BY n_nationkey",
        )
        return spark.createDataFrame(pdf)


def register_round10_streaming_front() -> None:
    # ------------------------------------------------------------------
    # streaming front-half of the training pipeline (VERDICT r9 item
    # 4): clean → langid → quality → filter → near-dup collapse as ONE
    # streaming query. This entry states the DETERMINISTIC batch twin
    # (min-id survivor per cleaned-text signature, with features)
    # against a DuckDB restatement of every stage; the stream ≡ batch
    # property — near-dups and junk redelivered across micro-batches —
    # is the accompanying pytest, which a batch oracle cannot express.
    # ------------------------------------------------------------------
    from build_datawarehouse_demo_spark.operators.dedup import simhash_auto_width
    from build_datawarehouse_demo_spark.registry_extensions import _HASH32
    from build_datawarehouse_demo_spark.registry_round9 import neardup_front_sql

    _N_DOCS = _driver_rows("documents", 500)
    _SBITS = 4 * simhash_auto_width(_N_DOCS)
    _SHASH = (
        _HASH32
        if _SBITS <= 32
        else "CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"
    )
    _CTOK = r"list_filter(regexp_split_to_array(trim(cleaned), '\s+'), x -> x <> '')"

    @register(
        "streaming_pipeline_front_batch",
        oracle=f"""
        WITH {neardup_front_sql()},
        tok AS (
          SELECT DISTINCT doc_id, tok
          FROM kept, unnest({_CTOK}) AS t(tok)
        ),
        hashed AS (
          SELECT doc_id, {_SHASH.format(expr="'0:' || tok")} AS h FROM tok
        ),
        votes AS (
          SELECT doc_id, i AS bit,
                 sum(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) AS v
          FROM hashed, unnest(generate_series(0, {_SBITS - 1})) AS g(i)
          GROUP BY doc_id, i
        ),
        sigs AS (
          SELECT doc_id,
                 CAST(sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS simhash
          FROM votes GROUP BY doc_id
        )
        SELECT k.doc_id, k.pred_lang, k.n_tokens, k.quality,
               s.simhash, CAST(cnt AS BIGINT) AS cluster_size
        FROM kept k
        JOIN (
          SELECT doc_id, simhash,
                 min(doc_id) OVER (PARTITION BY simhash) AS keep_id,
                 count(*) OVER (PARTITION BY simhash) AS cnt
          FROM sigs
        ) s ON s.doc_id = k.doc_id
        WHERE s.doc_id = s.keep_id
        """,
    )
    def q_streaming_front_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Batch form of prepare_document_stream (streaming/dedup.py):
        the same per-row feature expressions the stream runs (clean /
        langid / quality — zero stateful stages), the batch survivor
        predicate, then the narrow cleaned-text SimHash collapse to
        the min-id canonical per signature. The oracle restates the
        WHOLE composition — features, filter, narrow signature, and
        collapse — so the streaming query's only untestable-here part
        is the watermark state itself (pytest-covered). Width pinned
        from the raw fixture count via simhash_auto_width, like the
        banding pins: an upper bound that is stable under filter
        tweaks."""
        from build_datawarehouse_demo_spark.streaming.dedup import (
            prepare_document_stream,
        )

        docs = _t(spark, sf_dir, "documents")
        w = simhash_auto_width(docs.count())
        return prepare_document_stream(docs, bits=4 * w).select(
            "doc_id", "pred_lang", "n_tokens", "quality", "simhash", "cluster_size"
        )


def register_round10_training_ops() -> None:
    # ------------------------------------------------------------------
    # four published training-data operators the registry lacked:
    # SemDeDup (semantic dedup over the trained coarse quantizer),
    # DSIR importance resampling, CCNet perplexity bucketing, and
    # containment near-dup pairs. Each oracle restates the WHOLE
    # computation in DuckDB (training runs included), per the r7 IVF
    # discipline.
    # ------------------------------------------------------------------
    import math

    from build_datawarehouse_demo_spark.registry_extensions import _HASH32, _TOK
    from build_datawarehouse_demo_spark.registry_round7 import (
        IVF_GPROBE,
        _cos_sql,
        ivf_trained_with_block,
    )

    _SD_EPS = 0.3  # fixture operating point: max pairwise cosine in the
    # driver embeddings is 0.513, p99 0.289 — 0.3 prunes a real (small)
    # fraction; production corpora tune eps per SemDeDup sec. 4

    @register(
        "dedup_semantic_semdedup",
        oracle=f"""
        {ivf_trained_with_block()},
        asg AS (
          SELECT l.vec_id, l.cid, l.v,
                 round({_cos_sql("l.v", "c.cv")}, 6) AS cent_sim
          FROM lists l JOIN c2 c ON c.cid = l.cid
        ),
        rk AS (
          SELECT vec_id, cid, v, cent_sim,
                 row_number() OVER (PARTITION BY cid
                     ORDER BY cent_sim, vec_id) AS rk
          FROM asg
        ),
        cov AS (
          SELECT DISTINCT b.vec_id
          FROM rk a JOIN rk b ON a.cid = b.cid AND a.rk < b.rk
          WHERE round({_cos_sql("a.v", "b.v")}, 6) >= {_SD_EPS}
        )
        SELECT r.vec_id, r.cid AS centroid_id, r.cent_sim,
               (c.vec_id IS NULL) AS kept
        FROM rk r LEFT JOIN cov c ON c.vec_id = r.vec_id
        """,
    )
    def q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
        """SemDeDup (Abbas et al. 2023, arXiv:2303.09540) end to end:
        the SAME linearized quantizer chain as sim_ivf_trained (sampled
        Lloyd training, super-centroid grouping, two-level assignment —
        so the oracle reuses ivf_trained_with_block verbatim), then the
        paper's prune rule per cluster: order by similarity-to-centroid
        ascending (keep the far-from-centroid representative), drop
        anything with cosine >= eps to an earlier member
        (operators/similarity.py:semdedup_prune). Output is the full
        per-vector verdict (kept boolean), not just survivors, so the
        hash also pins what was REMOVED."""
        from build_datawarehouse_demo_spark.operators.similarity import (
            ivf_assign_two_level,
            ivf_group_centroids,
            ivf_train_sampled,
            semdedup_prune,
        )

        emb = _t(spark, sf_dir, "embeddings")
        n = emb.count()
        nlist = max(2, math.ceil(math.sqrt(n)))
        seeds = emb.filter(F.col("vec_id") < nlist).select(
            F.col("vec_id").alias("centroid_id"), "embedding"
        )
        cents = ivf_train_sampled(emb, seeds, n=n, nlist=nlist, n_iter=2, round_to=6)
        ngroups = max(1, math.ceil(math.sqrt(nlist)))
        sup, groups = ivf_group_centroids(cents, n_groups=ngroups, n_iter=1, round_to=6)
        assigned = ivf_assign_two_level(emb, cents, sup, groups, gprobe=IVF_GPROBE)
        return semdedup_prune(assigned, cents, eps=_SD_EPS)

    # ------------------------------------------------------------------
    # incremental SemDeDup (r10 theme applied to the semantic lane):
    # fold a new vector batch into an existing run — frozen quantizer,
    # stored verdicts never flip (append-only priority: every stored
    # member outranks every new one; new members keep the paper's
    # order among themselves). The oracle restates the WHOLE two-phase
    # rule: trains the quantizer on the OLD subset only (the
    # parameterized ivf_trained_with_block), assigns BOTH subsets with
    # it, and re-derives the stored-covers-new ∪ earlier-new-covers-new
    # prune set.
    # ------------------------------------------------------------------
    _N_EMB = _driver_rows("embeddings", 500)
    _EMB_SPLIT = (3 * _N_EMB) // 4
    _N_EMB_OLD = _driver_old_subset_count(_EMB_SPLIT, "embeddings", "vec_id")

    @register(
        "dedup_semdedup_incremental",
        oracle=f"""
        {ivf_trained_with_block(f"vec_id < {_EMB_SPLIT}", _N_EMB_OLD)},
        en AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
          WHERE vec_id >= {_EMB_SPLIT}
        ),
        route_n AS (
          SELECT vec_id, gid, v FROM (
            SELECT e.vec_id, s.cid AS gid, e.v,
                   row_number() OVER (PARTITION BY e.vec_id
                       ORDER BY {_cos_sql("e.v", "s.cv")} DESC, s.cid) AS rn
            FROM en e, s1 s
          ) WHERE rn <= {IVF_GPROBE}
        ),
        lists_n AS (
          SELECT vec_id, cid, v FROM (
            SELECT r.vec_id, g.cid, r.v,
                   row_number() OVER (PARTITION BY r.vec_id
                       ORDER BY {_cos_sql("r.v", "c.cv")} DESC, g.cid) AS rn
            FROM route_n r JOIN grp g ON g.gid = r.gid JOIN c2 c ON c.cid = g.cid
          ) WHERE rn = 1
        ),
        rk AS (
          SELECT l.vec_id, l.cid, l.v,
                 round({_cos_sql("l.v", "c.cv")}, 6) AS cent_sim,
                 row_number() OVER (PARTITION BY l.cid
                     ORDER BY round({_cos_sql("l.v", "c.cv")}, 6), l.vec_id) AS rk
          FROM lists_n l JOIN c2 c ON c.cid = l.cid
        ),
        cov AS (
          SELECT b.vec_id
          FROM lists a JOIN rk b ON a.cid = b.cid
          WHERE round({_cos_sql("a.v", "b.v")}, 6) >= {_SD_EPS}
          UNION
          SELECT b.vec_id
          FROM rk a JOIN rk b ON a.cid = b.cid AND a.rk < b.rk
          WHERE round({_cos_sql("a.v", "b.v")}, 6) >= {_SD_EPS}
        )
        SELECT r.vec_id, r.cid AS centroid_id, r.cent_sim,
               (c.vec_id IS NULL) AS kept
        FROM rk r LEFT JOIN cov c ON c.vec_id = r.vec_id
        """,
    )
    def q_semdedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Incremental SemDeDup over a 75/25 vec_id split: quantizer
        trained on the OLD subset only, both subsets assigned with the
        frozen two-level quantizer, then the new batch pruned under
        append-only priority (stored members cover new ones regardless
        of rank; new members follow the paper's order among
        themselves — operators/similarity.py:semdedup_prune_incremental,
        which documents why exact rebuild-parity is structurally
        impossible for an append-only SemDeDup)."""
        from build_datawarehouse_demo_spark.operators.similarity import (
            ivf_assign_two_level,
            ivf_group_centroids,
            ivf_train_sampled,
            semdedup_prune_incremental,
        )

        emb = _t(spark, sf_dir, "embeddings")
        old = emb.filter(F.col("vec_id") < _EMB_SPLIT)
        new = emb.filter(F.col("vec_id") >= _EMB_SPLIT)
        n_old = old.count()
        nlist = max(2, math.ceil(math.sqrt(n_old)))
        seeds = old.filter(F.col("vec_id") < nlist).select(
            F.col("vec_id").alias("centroid_id"), "embedding"
        )
        cents = ivf_train_sampled(
            old, seeds, n=n_old, nlist=nlist, n_iter=2, round_to=6
        )
        ngroups = max(1, math.ceil(math.sqrt(nlist)))
        sup, groups = ivf_group_centroids(
            cents, n_groups=ngroups, n_iter=1, round_to=6
        )
        assigned_old = ivf_assign_two_level(
            old, cents, sup, groups, gprobe=IVF_GPROBE
        )
        assigned_new = ivf_assign_two_level(
            new, cents, sup, groups, gprobe=IVF_GPROBE
        )
        return semdedup_prune_incremental(
            assigned_new, assigned_old, cents, eps=_SD_EPS
        )

    _DSIR_B, _DSIR_K = 1024, 100

    @register(
        "sample_importance_dsir",
        oracle=f"""
        WITH tok AS (
          SELECT doc_id, (lang = 'en') AS is_t, lower(tok) AS tok
          FROM documents, unnest({_TOK}) AS t(tok)
        ),
        b AS (
          SELECT doc_id, is_t,
                 {_HASH32.format(expr="'0:dsir:' || tok")} % {_DSIR_B} AS bucket
          FROM tok
        ),
        pb AS (
          SELECT bucket, count(*) AS cr,
                 sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS ct
          FROM b GROUP BY 1
        ),
        tot AS (SELECT sum(cr) AS nr, sum(ct) AS nt FROM pb),
        w AS (
          SELECT bucket,
                 ln((ct + 1.0) / (nt + {_DSIR_B}.0))
                 - ln((cr + 1.0) / (nr + {_DSIR_B}.0)) AS wb
          FROM pb, tot
        ),
        sc AS (
          SELECT b.doc_id, count(*) AS n_tokens, sum(w.wb) AS logw
          FROM b JOIN w USING (bucket) GROUP BY 1
        )
        SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
               round(logw, 6) AS log_weight,
               round(logw + (- ln(- ln(
                 ({_HASH32.format(expr="'0:dsirg:' || CAST(doc_id AS VARCHAR)")} + 0.5)
                 / 4294967296.0))), 6) AS score
        FROM sc
        ORDER BY score DESC, doc_id
        LIMIT {_DSIR_K}
        """,
    )
    def q_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
        """DSIR importance resampling (Xie et al., NeurIPS 2023) with
        the English subset as the target distribution: hashed-unigram
        add-1 multinomials over {_DSIR_B} buckets, per-doc log
        importance weight, deterministic Gumbel top-{_DSIR_K}
        (operators/sampling.py:importance_resample_dsir). The oracle
        refits BOTH models and replays the Gumbel draw from the same
        md5 uniforms."""
        from build_datawarehouse_demo_spark.operators.sampling import (
            importance_resample_dsir,
        )

        return importance_resample_dsir(
            _t(spark, sf_dir, "documents"),
            target_pred=F.col("lang") == "en",
            k=_DSIR_K,
            n_buckets=_DSIR_B,
        )

    @register(
        "text_perplexity_buckets",
        oracle=f"""
        WITH tok AS (
          SELECT doc_id, list_transform({_TOK}, x -> lower(x)) AS w
          FROM documents
        ),
        g AS (
          SELECT doc_id,
                 [w[i] || ' ' || w[i + 1] FOR i IN generate_series(1, len(w) - 1)] AS grams
          FROM tok
        ),
        bi AS (SELECT doc_id, gram FROM g, unnest(grams) AS t(gram)),
        c2 AS (SELECT gram, CAST(count(*) AS DOUBLE) AS c2 FROM bi GROUP BY 1),
        c1 AS (
          SELECT split_part(gram, ' ', 1) AS w1, sum(c2) AS c1
          FROM c2 GROUP BY 1
        ),
        lm AS (
          SELECT bi.doc_id, count(*) AS n_bigrams,
                 round(avg(ln(c2.c2 / c1.c1)), 6) AS avg_logprob
          FROM bi
          JOIN c2 USING (gram)
          JOIN c1 ON split_part(bi.gram, ' ', 1) = c1.w1
          GROUP BY bi.doc_id
        ),
        ppl AS (
          SELECT doc_id, n_bigrams, avg_logprob,
                 round(exp(-avg_logprob), 6) AS perplexity
          FROM lm
        ),
        cuts AS (
          SELECT round(quantile_cont(perplexity, 1.0/3.0), 6) AS p33,
                 round(quantile_cont(perplexity, 2.0/3.0), 6) AS p66
          FROM ppl
        )
        SELECT doc_id, n_bigrams, avg_logprob, perplexity,
               CASE WHEN perplexity <= p33 THEN 'head'
                    WHEN perplexity <= p66 THEN 'middle'
                    ELSE 'tail' END AS bucket
        FROM ppl, cuts
        """,
    )
    def q_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
        """CCNet head/middle/tail perplexity terciles (Wenzek et al.,
        LREC 2020) under the corpus's own bigram LM
        (operators/text.py:perplexity_buckets): exp(-mean logprob) from
        the 6dp-rounded mean, cutoffs = exact interpolated terciles
        broadcast back as comparators — never a corpus-wide ntile
        window."""
        from build_datawarehouse_demo_spark.operators.text import perplexity_buckets

        return perplexity_buckets(_t(spark, sf_dir, "documents"))

    @register(
        "dedup_ngram_containment",
        oracle=f"""
        WITH tok AS (
          SELECT DISTINCT doc_id, lang, source, tok
          FROM documents, unnest({_TOK}) AS t(tok)
        ),
        sizes AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
          FROM tok a
          JOIN tok b ON a.lang = b.lang AND a.source = b.source AND a.tok = b.tok
                    AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT i.id_a, i.id_b,
               CAST(i.n_inter AS DOUBLE) / least(na.n, nb.n) AS containment
        FROM inter i
        JOIN sizes na ON na.doc_id = i.id_a
        JOIN sizes nb ON nb.doc_id = i.id_b
        WHERE CAST(i.n_inter AS DOUBLE) / least(na.n, nb.n) >= 0.8
        """,
    )
    def q_ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Asymmetric containment pairs (Broder 1997): catches the
        subset-shaped duplication Jaccard structurally misses — same
        (lang, source)-blocked self-join shape as dedup_ngram_jaccard
        (operators/dedup.py:ngram_containment_pairs); integer/integer
        division so no rounding step."""
        from build_datawarehouse_demo_spark.operators.dedup import (
            ngram_containment_pairs,
        )

        return ngram_containment_pairs(
            _t(spark, sf_dir, "documents"),
            block_cols=("lang", "source"),
            threshold=0.8,
        )


def _driver_source_token_sums(
    source_col: str = "lang", id_col: str = "doc_id"
) -> dict:
    """Per-source whitespace-token totals of the driver documents
    fixture — the quota-pin input for the token-budget mix oracle.
    Tokenization matches operators/text.tokens exactly: ASCII \\s+
    split of the trimmed text, empty tokens removed (re.ASCII pins the
    same whitespace class Java regex uses by default — the round-6
    UDTF lesson). Counts only rows with non-null id AND non-null text
    token count, the operator's drawable population."""
    try:
        import collections
        import re

        import pyarrow.parquet as pq

        t = pq.read_table(
            f"{_DRIVER_SF_DIR}/documents.parquet",
            columns=[source_col, id_col, "text"],
        )
        ids = t.column(id_col).is_valid().to_pylist()
        srcs = t.column(source_col).to_pylist()
        texts = t.column("text").to_pylist()
        sums: dict = collections.defaultdict(int)
        for ok, s, x in zip(ids, srcs, texts):
            if not ok or x is None:
                continue
            sums[s] += len([w for w in re.split(r"\s+", x.strip(), flags=re.ASCII) if w])
        return dict(sums)
    except (ImportError, FileNotFoundError, OSError) as e:
        import warnings

        warnings.warn(
            f"_driver_source_token_sums: fixture unreadable "
            f"({type(e).__name__}: {e}) — token-mix oracle pins may diverge",
            stacklevel=2,
        )
        return {}


def register_round10_token_budget() -> None:
    # ------------------------------------------------------------------
    # token-budget corpus mixing: production mixes are specified in
    # TOKENS ("500B tokens, temperature-rebalanced"),
    # not documents — quota ∝ tok_s^(1/T), filled by the greedy prefix
    # of the deterministic hash order (running token sum <= quota).
    # T=1's oracle re-derives the quotas INDEPENDENTLY in integer SQL
    # (the 10^30 fixed-point scale cancels exactly under floor
    # division); T=2 pins quotas through temperature_quotas at
    # fixture-derived token totals — the same two-tier verification
    # the document-quota family uses (registry_round9).
    # ------------------------------------------------------------------
    from build_datawarehouse_demo_spark.registry_extensions import _HASH32, _TOK

    _TBUDGET = 5000
    _rank_hash = _HASH32.format(expr="'0:tokmix:' || CAST(doc_id AS VARCHAR)")
    _ranked = f"""
        d AS (
          SELECT doc_id, lang, CAST(len({_TOK}) AS BIGINT) AS n_ws_tokens
          FROM documents WHERE doc_id IS NOT NULL
        ),
        r AS (
          SELECT doc_id, lang, n_ws_tokens,
                 CAST(sum(n_ws_tokens) OVER (PARTITION BY lang
                     ORDER BY {_rank_hash}, doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS tok_cum
          FROM d
        )"""

    def _run_tokmix(
        spark: SparkSession, sf_dir: str, temperature: float
    ) -> DataFrame:
        from build_datawarehouse_demo_spark.operators.sampling import (
            sample_token_budget_mix,
        )
        from build_datawarehouse_demo_spark.operators.text import token_count

        docs = token_count(
            _t(spark, sf_dir, "documents", rebalance=False).select("doc_id", "lang", "text")
        ).select("doc_id", "lang", "n_ws_tokens")
        return sample_token_budget_mix(
            docs, "lang", "doc_id", "n_ws_tokens",
            token_budget=_TBUDGET, temperature=temperature,
        ).select("doc_id", "lang", "n_ws_tokens", "tok_cum", "token_quota")

    @register(
        "sample_token_budget_mix_t1",
        oracle=f"""
        WITH {_ranked},
        c AS (SELECT lang, sum(n_ws_tokens) AS tok FROM d GROUP BY lang),
        tot AS (SELECT sum(tok) AS t FROM c),
        tgt AS (
          SELECT lang, CAST(({_TBUDGET} * tok) // t AS BIGINT) AS token_quota
          FROM c, tot
        )
        SELECT r.doc_id, r.lang, r.n_ws_tokens, r.tok_cum, g.token_quota
        FROM r JOIN tgt g ON g.lang = r.lang
        WHERE r.tok_cum <= g.token_quota
        """,
    )
    def q_tokmix_t1(spark: SparkSession, sf_dir: str) -> DataFrame:
        """T=1 token-budget mix over the skewed lang column — natural
        token proportions: quota_s = floor(budget * tok_s / Σtok),
        re-derived independently in integer SQL (the fixed-point scale
        cancels exactly at T=1), then the greedy-prefix fill verified
        as a windowed running sum
        (operators/sampling.py:sample_token_budget_mix)."""
        return _run_tokmix(spark, sf_dir, 1.0)

    from build_datawarehouse_demo_spark.registry_round9 import _quota_values_sql

    @register(
        "sample_token_budget_mix_t2",
        oracle=f"""
        WITH {_ranked},
        tgt(lang, token_quota) AS (
          {_quota_values_sql(_driver_source_token_sums(), _TBUDGET, 2.0)}
        )
        SELECT r.doc_id, r.lang, r.n_ws_tokens, r.tok_cum,
               CAST(g.token_quota AS BIGINT) AS token_quota
        FROM r JOIN tgt g ON g.lang = r.lang
        WHERE r.tok_cum <= g.token_quota
        """,
    )
    def q_tokmix_t2(spark: SparkSession, sf_dir: str) -> DataFrame:
        """T=2 token-budget mix: token quotas ∝ sqrt(tok_s) by the
        exact-integer fixed-point contract, pinned into the oracle
        through temperature_quotas at fixture-derived per-lang token
        totals (_driver_source_token_sums replays
        operators/text.tokens' ASCII whitespace split); the ranked
        greedy-prefix fill is verified in SQL."""
        return _run_tokmix(spark, sf_dir, 2.0)

    _N_SHARDS = 8
    _ord_hash = _HASH32.format(expr="'0:shardord:' || CAST(doc_id AS VARCHAR)")

    @register(
        "shard_token_balanced",
        oracle=f"""
        WITH d AS (
          SELECT doc_id, CAST(len({_TOK}) AS BIGINT) AS n_tokens,
                 {_ord_hash} AS hkey
          FROM documents WHERE doc_id IS NOT NULL
        ),
        tot AS (SELECT sum(n_tokens) AS t FROM d),
        r AS (
          SELECT doc_id, n_tokens,
                 CAST(coalesce(sum(n_tokens) OVER (ORDER BY hkey, doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS prev_cum
          FROM d
        )
        SELECT r.doc_id, r.n_tokens, r.prev_cum,
               CAST(least({_N_SHARDS - 1}, (r.prev_cum * {_N_SHARDS}) // t)
                 AS INTEGER) AS shard
        FROM r, tot
        """,
    )
    def q_shard_balanced(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Token-balanced corpus sharding: global md5-hash shuffle
        order, shard = prev-cum-tokens * N div total — every shard's
        token mass within one document of total/N
        (operators/sampling.py:shard_token_balanced). The oracle
        recomputes the GLOBAL running sum as one SQL window; the
        engine builds the same sum scalably from range-partitioned
        per-partition prefix sums + a bounded offsets collect — a hash
        match proves the distributed cumsum ≡ the global window."""
        from build_datawarehouse_demo_spark.operators.sampling import (
            shard_token_balanced,
        )
        from build_datawarehouse_demo_spark.operators.text import token_count

        docs = token_count(
            _t(spark, sf_dir, "documents").select("doc_id", "text")
        ).select("doc_id", F.col("n_ws_tokens"))
        return shard_token_balanced(docs, "doc_id", "n_ws_tokens", _N_SHARDS)


def _driver_chunk_count(step: int, max_doc_id: int | None = None) -> int:
    """Chunks of the driver documents fixture at the given window
    step: a document with n > 0 whitespace tokens yields
    (n-1)//step + 1 sliding windows (chunk_documents' sequence()).
    ASCII split, same class as operators/text.tokens. ``max_doc_id``
    restricts to doc_id < max_doc_id (the OLD-subset chunk count that
    pins the incremental RAG entry's frozen quantizer — the
    _driver_old_subset_count discipline)."""
    try:
        import re

        import pyarrow.parquet as pq

        t = pq.read_table(
            f"{_DRIVER_SF_DIR}/documents.parquet", columns=["doc_id", "text"]
        )
        total = 0
        ids = t.column("doc_id").to_pylist()
        for doc_id, x in zip(ids, t.column("text").to_pylist()):
            if x is None or (max_doc_id is not None and doc_id >= max_doc_id):
                continue
            n = len([w for w in re.split(r"\s+", x.strip(), flags=re.ASCII) if w])
            if n > 0:
                total += (n - 1) // step + 1
        return total
    except (ImportError, FileNotFoundError, OSError) as e:
        import warnings

        warnings.warn(
            f"_driver_chunk_count: fixture unreadable "
            f"({type(e).__name__}: {e}) — RAG-index oracle pins may diverge",
            stacklevel=2,
        )
        return 0


#: shared RAG-lane parameters (chunking, embedding width, probe/search
#: sizes) — pinned once so the base pipeline entry and the incremental
#: append entry derive their oracles from the same constants.
_RAG_CHUNK, _RAG_OVL, _RAG_DIM = 32, 8, 16
_RAG_STEP = _RAG_CHUNK - _RAG_OVL
_RAG_PROBE_DOCS, _RAG_K = 5, 5


def _rag_chunkvec_src() -> str:
    """DuckDB subquery deriving the chunk hash-embedding vectors
    (vec_id, embedding) from the documents table — the SQL twin of
    plans/rag_index.hash_embed_chunks, used as the parameterized
    ivf_trained_with_block's SOURCE subquery by both RAG entries."""
    from build_datawarehouse_demo_spark.plans.rag_index import CHUNK_UID_STRIDE
    from build_datawarehouse_demo_spark.registry_extensions import _TOK

    h32_tok = "CAST(('0x' || substr(md5('0:' || t), 1, 8)) AS BIGINT)"
    return f"""(
      WITH tk AS (SELECT doc_id, {_TOK} AS w FROM documents),
      st AS (
        SELECT doc_id, w, unnest(range(0, len(w), {_RAG_STEP})) AS s
        FROM tk WHERE len(w) > 0
      )
      SELECT CAST(doc_id * {CHUNK_UID_STRIDE} + (s // {_RAG_STEP}) AS BIGINT)
               AS vec_id,
             list_transform(range(0, {_RAG_DIM}), i ->
               CAST(len(list_filter(w[s + 1 : s + {_RAG_CHUNK}],
                    t -> {h32_tok} % {_RAG_DIM} = i)) AS DOUBLE)) AS embedding
      FROM st) src"""


def register_round10_rag() -> None:
    # ------------------------------------------------------------------
    # composed RAG retrieval-index pipeline: chunk -> hash-embed ->
    # train IVF quantizer on chunk vectors -> inverted lists -> nprobe
    # top-k search, all in one entry (plans/rag_index.py — every stage
    # is an individually-registered operator). The oracle restates the
    # WHOLE chain: the chunk+featurize SQL becomes the parameterized
    # ivf_trained_with_block's SOURCE subquery, so DuckDB re-runs the
    # training, assignment, and search over the same derived vectors.
    # ------------------------------------------------------------------
    import math

    from build_datawarehouse_demo_spark.registry_round7 import (
        IVF_NPROBE,
        _cos_sql,
        ivf_trained_with_block,
    )
    from build_datawarehouse_demo_spark.plans.rag_index import CHUNK_UID_STRIDE

    _N_CHUNKS = _driver_chunk_count(_RAG_STEP)
    _RAG_NLIST = max(2, math.ceil(math.sqrt(max(1, _N_CHUNKS))))
    _chunkvec_src = _rag_chunkvec_src()

    @register(
        "pipeline_rag_index_search",
        oracle=f"""
        {ivf_trained_with_block(
            "TRUE",
            _N_CHUNKS,
            source_sql=_chunkvec_src,
            seed_where=(
                f"vec_id % {CHUNK_UID_STRIDE} = 0 "
                f"AND vec_id < {_RAG_NLIST * CHUNK_UID_STRIDE}"
            ),
            dim=_RAG_DIM,
        )},
        p AS (
          SELECT vec_id AS probe_id, v AS pv FROM e
          WHERE vec_id % {CHUNK_UID_STRIDE} = 0
            AND vec_id < {_RAG_PROBE_DOCS * CHUNK_UID_STRIDE}
        ),
        pa AS (
          SELECT probe_id, pv, cid FROM (
            SELECT p.probe_id, p.pv, c.cid,
                   row_number() OVER (PARTITION BY p.probe_id
                       ORDER BY {_cos_sql("p.pv", "c.cv")} DESC, c.cid) AS rn
            FROM p, c2 c
          ) WHERE rn <= {IVF_NPROBE}
        ),
        scored AS (
          SELECT pa.probe_id, l.vec_id, {_cos_sql("pa.pv", "l.v")} AS cos
          FROM pa JOIN lists l ON l.cid = pa.cid AND l.vec_id <> pa.probe_id
        ),
        ranked AS (
          SELECT probe_id, vec_id, cos,
                 CAST(row_number() OVER (PARTITION BY probe_id
                     ORDER BY cos DESC, vec_id) AS INTEGER) AS rank
          FROM scored
        )
        SELECT probe_id, vec_id, round(cos, 6) AS cosine, rank
        FROM ranked WHERE rank <= {_RAG_K}
        """,
    )
    def q_rag_index_search(spark: SparkSession, sf_dir: str) -> DataFrame:
        """RAG index pipeline end to end (plans/rag_index.py): sliding
        token-window chunking, dense hash-embedding per chunk (one
        codegen'd scan — transform/filter HOFs, no UDF), sampled-Lloyd
        quantizer trained on the chunk vectors, two-level inverted
        lists, nprobe top-k search probed with the first chunk of the
        first {_RAG_PROBE_DOCS} documents. The oracle re-derives the
        chunk vectors as the training block's source subquery and
        replays the entire train/assign/search chain in SQL."""
        from build_datawarehouse_demo_spark.plans.rag_index import rag_index_search

        return rag_index_search(
            _t(spark, sf_dir, "documents"),
            n_probe_docs=_RAG_PROBE_DOCS,
            k=_RAG_K,
            nprobe=IVF_NPROBE,
            chunk_size=_RAG_CHUNK,
            overlap=_RAG_OVL,
            dim=_RAG_DIM,
        )


def register_round10_rag_append() -> None:
    # ------------------------------------------------------------------
    # incremental RAG index refresh: the r10 incremental theme applied
    # to the retrieval index — build the persisted IVF index on the OLD
    # 3/4 of the corpus, fold the NEW 1/4 in via the frozen-quantizer
    # append (chunk -> embed -> ivf_index_append), search the union.
    # The oracle trains the quantizer on the OLD chunk vectors only,
    # assigns BOTH subsets with it (the ivf_index_append contract:
    # appended vectors land in the IDENTICAL list a frozen-quantizer
    # build would have put them in), and replays the nprobe search over
    # the union lists — a hash match proves refresh ≡ frozen-rebuild
    # end to end THROUGH the persisted table round-trip.
    # ------------------------------------------------------------------
    import math

    from build_datawarehouse_demo_spark.registry_round7 import (
        IVF_GPROBE,
        IVF_NPROBE,
        _cos_sql,
        ivf_trained_with_block,
    )
    from build_datawarehouse_demo_spark.plans.rag_index import CHUNK_UID_STRIDE

    _N_DOCS = _driver_rows("documents", 500)
    _SPLIT_DOCS = (3 * _N_DOCS) // 4
    _SPLIT_VEC = _SPLIT_DOCS * CHUNK_UID_STRIDE
    _N_OLD_CHUNKS = _driver_chunk_count(_RAG_STEP, max_doc_id=_SPLIT_DOCS)
    _NL_OLD = max(2, math.ceil(math.sqrt(max(1, _N_OLD_CHUNKS))))
    _chunkvec_src = _rag_chunkvec_src()

    @register(
        "pipeline_rag_index_append",
        oracle=f"""
        {ivf_trained_with_block(
            f"vec_id < {_SPLIT_VEC}",
            _N_OLD_CHUNKS,
            source_sql=_chunkvec_src,
            seed_where=(
                f"vec_id % {CHUNK_UID_STRIDE} = 0 "
                f"AND vec_id < {_NL_OLD * CHUNK_UID_STRIDE}"
            ),
            dim=_RAG_DIM,
        )},
        en AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
          FROM {_chunkvec_src} WHERE vec_id >= {_SPLIT_VEC}
        ),
        route_n AS (
          SELECT vec_id, gid, v FROM (
            SELECT e.vec_id, s.cid AS gid, e.v,
                   row_number() OVER (PARTITION BY e.vec_id
                       ORDER BY {_cos_sql("e.v", "s.cv")} DESC, s.cid) AS rn
            FROM en e, s1 s
          ) WHERE rn <= {IVF_GPROBE}
        ),
        lists_n AS (
          SELECT vec_id, cid, v FROM (
            SELECT r.vec_id, g.cid, r.v,
                   row_number() OVER (PARTITION BY r.vec_id
                       ORDER BY {_cos_sql("r.v", "c.cv")} DESC, g.cid) AS rn
            FROM route_n r JOIN grp g ON g.gid = r.gid JOIN c2 c ON c.cid = g.cid
          ) WHERE rn = 1
        ),
        alll AS (
          SELECT vec_id, cid, v FROM lists
          UNION ALL
          SELECT vec_id, cid, v FROM lists_n
        ),
        p AS (
          SELECT vec_id AS probe_id, v AS pv FROM alll
          WHERE vec_id % {CHUNK_UID_STRIDE} = 0
            AND vec_id < {_RAG_PROBE_DOCS * CHUNK_UID_STRIDE}
        ),
        pa AS (
          SELECT probe_id, pv, cid FROM (
            SELECT p.probe_id, p.pv, c.cid,
                   row_number() OVER (PARTITION BY p.probe_id
                       ORDER BY {_cos_sql("p.pv", "c.cv")} DESC, c.cid) AS rn
            FROM p, c2 c
          ) WHERE rn <= {IVF_NPROBE}
        ),
        scored AS (
          SELECT pa.probe_id, l.vec_id, {_cos_sql("pa.pv", "l.v")} AS cos
          FROM pa JOIN alll l ON l.cid = pa.cid AND l.vec_id <> pa.probe_id
        ),
        ranked AS (
          SELECT probe_id, vec_id, cos,
                 CAST(row_number() OVER (PARTITION BY probe_id
                     ORDER BY cos DESC, vec_id) AS INTEGER) AS rank
          FROM scored
        )
        SELECT probe_id, vec_id, round(cos, 6) AS cosine, rank
        FROM ranked WHERE rank <= {_RAG_K}
        """,
    )
    def q_rag_index_append(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Incremental RAG index refresh
        (plans/rag_index.py:rag_index_append_search): persisted IVF
        index built over the first 3/4 of the corpus's chunk vectors,
        the last 1/4 chunked + embedded + appended against the FROZEN
        stored quantizer (ivf_index_append — routing rederived from
        the stored centroid table), then nprobe top-k search over the
        union lists read back from the catalog. The oracle trains on
        the old chunks only and routes all chunks — a hash match is
        the refresh ≡ frozen-rebuild proof through the table
        round-trip."""
        from build_datawarehouse_demo_spark.plans.rag_index import (
            rag_index_append_search,
        )
        from build_datawarehouse_demo_spark.registry_extensions import (
            _bucketed_scratch_dir,
        )

        docs = _t(spark, sf_dir, "documents")
        n = docs.count()
        split = (3 * n) // 4
        return rag_index_append_search(
            docs.filter(F.col("doc_id") < split),
            docs.filter(F.col("doc_id") >= split),
            "rag_app_idx",
            n_probe_docs=_RAG_PROBE_DOCS,
            k=_RAG_K,
            nprobe=IVF_NPROBE,
            chunk_size=_RAG_CHUNK,
            overlap=_RAG_OVL,
            dim=_RAG_DIM,
            path=f"{_bucketed_scratch_dir()}/rag_app_idx",
        )


def register_round10_classifier() -> None:
    # ------------------------------------------------------------------
    # linear quality classifier (the fastText/LR document filter of
    # GPT-3 / CCNet): hashed bag-of-words features, length-normalized,
    # dot with a pinned weight vector, sigmoid, threshold. The weights
    # are the documented deterministic stand-in (no model weights in
    # the sandbox); the oracle replays features, dot, sigmoid and
    # verdict in SQL at the same literals.
    # ------------------------------------------------------------------
    from build_datawarehouse_demo_spark.operators.text import (
        default_classifier_weights,
    )
    from build_datawarehouse_demo_spark.registry_extensions import _TOK

    _QC_DIM, _QC_THRESH = 64, 0.5
    _QC_W = default_classifier_weights(_QC_DIM)
    _w_sql = "[" + ", ".join(repr(w) for w in _QC_W) + "]"
    _h32_tok = "CAST(('0x' || substr(md5('0:' || t), 1, 8)) AS BIGINT)"

    @register(
        "text_quality_classifier",
        oracle=f"""
        WITH d AS (SELECT doc_id, {_TOK} AS w FROM documents),
        f AS (
          SELECT doc_id, CAST(len(w) AS BIGINT) AS n_ws_tokens,
                 list_transform(range(0, {_QC_DIM}), i ->
                   CAST(len(list_filter(w, t -> {_h32_tok} % {_QC_DIM} = i))
                     AS DOUBLE)) AS feat
          FROM d
        ),
        s AS (
          SELECT doc_id, n_ws_tokens,
                 CASE WHEN n_ws_tokens > 0 THEN
                   round(1.0 / (1.0 + exp(-(
                     list_dot_product(feat, {_w_sql}) / n_ws_tokens))), 6)
                 END AS clf_score
          FROM f
        )
        SELECT doc_id, n_ws_tokens, clf_score,
               clf_score >= {_QC_THRESH} AS kept
        FROM s
        """,
    )
    def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Linear quality classifier
        (operators/text.py:quality_classifier_score): md5-hashed
        bag-of-words buckets, length-normalized, pinned stand-in
        weights, sigmoid + 0.5 threshold — features, dot, sigmoid and
        verdict all replayed by the oracle at the same literals.
        Zero-token documents score NULL (no features = no verdict)."""
        from build_datawarehouse_demo_spark.operators.text import (
            quality_classifier_score,
        )

        return quality_classifier_score(
            _t(spark, sf_dir, "documents"), dim=_QC_DIM, threshold=_QC_THRESH
        )


def register_round10_gopher() -> None:
    # ------------------------------------------------------------------
    # the Gopher rule set (Rae et al. 2021, Appendix A1.1.3) — the
    # published heuristic battery most large-corpus pipelines start
    # from, as ONE codegen'd scan; every ratio an exact integer/integer
    # division, every rule a boolean both engines restate.
    # ------------------------------------------------------------------
    from build_datawarehouse_demo_spark.operators.text import GOPHER_STOPWORDS
    from build_datawarehouse_demo_spark.registry_extensions import _TOK

    _stop_sql = "[" + ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS) + "]"

    @register(
        "text_gopher_rules",
        oracle=f"""
        WITH d AS (
          SELECT doc_id, text, {_TOK} AS w,
                 list_filter(string_split(text, chr(10)), l -> trim(l) <> '')
                   AS lines
          FROM documents
        ),
        m AS (
          SELECT doc_id,
                 CAST(len(w) AS BIGINT) AS n_words,
                 len(w) AS n,
                 greatest(len(lines), 1) AS nl,
                 round(CAST(list_sum(list_transform(w, t -> len(t)))
                       AS DOUBLE) / len(w), 6) AS mean_word_len,
                 (len(text) - len(replace(text, '#', ''))
                  + (len(text) - len(replace(text, '...', ''))) / 3)
                   AS n_sym,
                 len(list_filter(lines, l ->
                   ltrim(l) LIKE '-%' OR ltrim(l) LIKE '*%')) AS n_bullet,
                 len(list_filter(lines, l -> rtrim(l) LIKE '%...'))
                   AS n_ell_lines,
                 len(list_filter(w, t -> regexp_matches(t, '[A-Za-z]')))
                   AS n_alpha,
                 CAST(len(list_intersect(
                   list_distinct(list_transform(w, t -> lower(t))),
                   {_stop_sql})) AS BIGINT) AS stopword_hits
          FROM d
        ),
        r AS (
          SELECT doc_id, n_words,
                 CASE WHEN n > 0 THEN mean_word_len END AS mean_word_len,
                 CASE WHEN n > 0
                      THEN round(CAST(n_sym AS DOUBLE) / n, 6) END
                   AS symbol_word_ratio,
                 round(CAST(n_bullet AS DOUBLE) / nl, 6) AS bullet_line_ratio,
                 round(CAST(n_ell_lines AS DOUBLE) / nl, 6)
                   AS ellipsis_line_ratio,
                 CASE WHEN n > 0
                      THEN round(CAST(n_alpha AS DOUBLE) / n, 6) END
                   AS alpha_word_ratio,
                 stopword_hits, n
          FROM m
        )
        SELECT doc_id, n_words, mean_word_len, symbol_word_ratio,
               bullet_line_ratio, ellipsis_line_ratio, alpha_word_ratio,
               stopword_hits,
               (n > 0 AND n BETWEEN 50 AND 100000) AS rule_word_count,
               (n > 0 AND mean_word_len BETWEEN 3.0 AND 10.0)
                 AS rule_mean_word_len,
               (n > 0 AND symbol_word_ratio <= 0.1) AS rule_symbol_ratio,
               (bullet_line_ratio <= 0.9) AS rule_bullet_lines,
               (ellipsis_line_ratio <= 0.3) AS rule_ellipsis_lines,
               (n > 0 AND alpha_word_ratio >= 0.8) AS rule_alpha_words,
               (stopword_hits >= 2) AS rule_stopwords,
               ((n > 0 AND n BETWEEN 50 AND 100000)
                AND (n > 0 AND mean_word_len BETWEEN 3.0 AND 10.0)
                AND (n > 0 AND symbol_word_ratio <= 0.1)
                AND (bullet_line_ratio <= 0.9)
                AND (ellipsis_line_ratio <= 0.3)
                AND (n > 0 AND alpha_word_ratio >= 0.8)
                AND (stopword_hits >= 2)) AS kept
        FROM r
        """,
    )
    def q_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
        """The Gopher quality-filter rule battery
        (operators/text.py:gopher_quality_rules — Rae et al. 2021
        Appendix A1.1.3 thresholds): word-count bounds, mean word
        length, symbol-to-word ratio (# + ellipsis), bullet /
        ellipsis line fractions, alphabetic-word fraction, distinct
        stopword hits — per-document metrics, per-rule booleans and
        the conjunction verdict, all in one codegen'd scan with the
        oracle restating every ratio as the same exact integer
        division."""
        from build_datawarehouse_demo_spark.operators.text import (
            gopher_quality_rules,
        )

        return gopher_quality_rules(_t(spark, sf_dir, "documents"))


def register_round10_curation() -> None:
    # ------------------------------------------------------------------
    # second r10 curation batch: embedding-space benchmark
    # decontamination (the semantic twin of text_decontaminate) and the
    # per-slice corpus health report.
    # ------------------------------------------------------------------
    from build_datawarehouse_demo_spark.registry_extensions import _TOK
    from build_datawarehouse_demo_spark.registry_round7 import _cos_sql

    _DC_TAU, _DC_BENCH = 0.4, 20

    @register(
        "sim_decontaminate_embedding",
        oracle=f"""
        WITH e AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        b AS (SELECT v AS bv FROM e WHERE vec_id < {_DC_BENCH}),
        c AS (SELECT vec_id, v FROM e WHERE vec_id >= {_DC_BENCH})
        SELECT c.vec_id,
               max(round({_cos_sql("c.v", "b.bv")}, 6)) AS max_benchmark_cos,
               max(round({_cos_sql("c.v", "b.bv")}, 6)) >= {_DC_TAU} AS contaminated
        FROM c, b
        GROUP BY 1
        """,
    )
    def q_semantic_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Embedding-space decontamination (GPT-3 appendix C pairs this
        with the n-gram check): the first {_DC_BENCH} fixture vectors
        stand in as the benchmark set, broadcast against the rest;
        per-doc max cosine + flag at tau={_DC_TAU}
        (operators/similarity.py:semantic_decontaminate — the corpus
        never re-shuffles, pair volume never crosses the wire)."""
        from build_datawarehouse_demo_spark.operators.similarity import (
            semantic_decontaminate,
        )

        emb = _t(spark, sf_dir, "embeddings")
        bench = emb.filter(F.col("vec_id") < _DC_BENCH)
        corpus = emb.filter(F.col("vec_id") >= _DC_BENCH)
        return semantic_decontaminate(corpus, bench, tau=_DC_TAU)

    @register(
        "profile_corpus_report",
        oracle=f"""
        SELECT lang, source,
               count(*) AS n_docs,
               CAST(sum(len({_TOK})) AS BIGINT) AS n_tokens,
               round(avg(len({_TOK})), 6) AS avg_tokens,
               CAST(sum(len(text)) AS BIGINT) AS n_chars,
               count(DISTINCT md5(text)) AS n_distinct_texts,
               CAST(count(*) - count(DISTINCT md5(text)) AS DOUBLE)
                 / count(*) AS dup_rate
        FROM documents
        GROUP BY 1, 2
        """,
    )
    def q_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Per-(lang, source) corpus health report
        (operators/profiling.py:corpus_report): doc/token/char volumes,
        mean length, and the exact-duplicate rate off the md5 digest —
        one scan, one bounded-key aggregate."""
        from build_datawarehouse_demo_spark.operators.profiling import corpus_report

        return corpus_report(_t(spark, sf_dir, "documents"))

    _SO_N = 8

    @register(
        "profile_source_overlap",
        oracle=f"""
        WITH tok AS (
          SELECT source, {_TOK} AS w FROM documents WHERE text IS NOT NULL
        ),
        g AS (
          SELECT DISTINCT source,
                 array_to_string(w[i.i : i.i + {_SO_N - 1}], ' ') AS gram
          FROM tok, unnest(range(1, len(w) - {_SO_N} + 2)) AS i(i)
          WHERE len(w) >= {_SO_N}
        ),
        sizes AS (SELECT source, count(*) AS n_grams_a FROM g GROUP BY source),
        pairs AS (
          SELECT a.source AS source_a, b.source AS source_b,
                 count(*) AS n_shared
          FROM g a JOIN g b ON a.gram = b.gram AND a.source <> b.source
          GROUP BY 1, 2
        )
        SELECT p.source_a, p.source_b, p.n_shared, s.n_grams_a,
               CAST(p.n_shared AS DOUBLE) / s.n_grams_a AS containment
        FROM pairs p JOIN sizes s ON s.source = p.source_a
        """,
    )
    def q_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Cross-source {_SO_N}-gram containment matrix
        (operators/profiling.py:source_overlap_report): how much of
        each source's distinct n-gram content appears in every other
        source — the slice-level duplication governance view. Exact
        cross-source duplicate TEXTS are zero at this fixture (texts
        are corpus-unique), which is exactly why the report measures
        n-gram containment: shared boilerplate grams across sources
        are real and nonzero."""
        from build_datawarehouse_demo_spark.operators.profiling import (
            source_overlap_report,
        )

        return source_overlap_report(_t(spark, sf_dir, "documents"), n=_SO_N)


def register_round10_c4() -> None:
    # ------------------------------------------------------------------
    # C4 line-level cleaning (Raffel et al. 2020 section 2.2) — the
    # line filters that run BEFORE the doc-level batteries (Gopher),
    # as ONE codegen'd scan; the oracle restates every line predicate,
    # the rejoin, the replace-chain sentence count and the page
    # verdict in DuckDB.
    # ------------------------------------------------------------------
    @register(
        "text_c4_line_filters",
        oracle=r"""
        WITH d AS (
          SELECT doc_id, text, string_split(text, chr(10)) AS lines
          FROM documents
        ),
        k AS (
          SELECT doc_id, text, lines,
                 list_filter(lines, l ->
                   regexp_matches(rtrim(l), '[.!?"]$')
                   AND len(list_filter(
                         regexp_split_to_array(trim(l), '\s+'),
                         w -> w <> '')) >= 5
                   AND NOT contains(lower(l), 'javascript')) AS keptl
          FROM d
        ),
        c AS (
          -- array_to_string([]) is NULL in DuckDB while Spark's
          -- array_join([]) is '' — coalesce so the all-lines-dropped
          -- document (the common case on the punctuation-free
          -- fixture) matches the engine's empty string
          SELECT doc_id, text, lines, keptl,
                 CASE WHEN text IS NULL THEN NULL
                      ELSE coalesce(array_to_string(keptl, chr(10)), '')
                 END AS cleaned
          FROM k
        ),
        m AS (
          SELECT doc_id, text, cleaned,
                 CAST(len(keptl) AS BIGINT) AS n_lines_kept,
                 CAST(len(lines) - len(keptl) AS BIGINT) AS n_lines_dropped,
                 CAST(len(cleaned)
                      - len(replace(replace(replace(cleaned, '.', ''),
                                    '!', ''), '?', '')) AS BIGINT)
                   AS n_sentences,
                 contains(lower(text), 'lorem ipsum') AS has_lorem_ipsum,
                 contains(text, '{') AS has_brace
          FROM c
        )
        SELECT doc_id, cleaned, n_lines_kept, n_lines_dropped, n_sentences,
               has_lorem_ipsum, has_brace,
               coalesce(text IS NOT NULL AND NOT has_lorem_ipsum
                        AND NOT has_brace AND n_sentences >= 3, FALSE)
                 AS kept
        FROM m
        """,
    )
    def q_c4_line_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
        """C4 line-level cleaning (operators/text.py:c4_line_filters —
        Raffel et al. 2020 section 2.2): keep lines ending in terminal
        punctuation with >= 5 words and no 'javascript'; drop pages
        containing 'lorem ipsum' or '{' or carrying < 3 sentences in
        the kept text. Per-document cleaned text, line keep/drop
        counts, sentence count, page flags and the verdict — one
        codegen'd scan, every rule restated by the oracle."""
        from build_datawarehouse_demo_spark.operators.text import c4_line_filters

        return c4_line_filters(_t(spark, sf_dir, "documents"))
