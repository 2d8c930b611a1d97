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


def _driver_old_subset_count(split_at: int) -> int:
    """Rows of the driver documents fixture with doc_id < split_at —
    the OLD-corpus count that pins the incremental entry's frozen
    banding (same fixture-derived-pin discipline as _driver_rows)."""
    try:
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        t = pq.read_table(f"{_DRIVER_SF_DIR}/documents.parquet", columns=["doc_id"])
        return pc.sum(pc.less(t.column("doc_id"), split_at)).as_py() or 0
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
        1/4 in as a new batch via training_data_neardup_apply. Old
        documents' signatures, near-dup pairs, span-gram index and
        output rows are REUSED from the state — only the batch is
        scanned, only affected documents are re-span-checked. The
        oracle runs the full chain over the UNION at the state's
        frozen banding, so the hash match is the refresh ≡ rebuild
        parity proof (plans/training_data.py docstring has the
        stage-by-stage argument)."""
        from build_datawarehouse_demo_spark.plans.training_data import (
            prepare_training_data_neardup_incremental,
            training_data_neardup_state,
        )

        docs = _t(spark, sf_dir, "documents")
        n = docs.count()
        split_at = (3 * n) // 4
        old = docs.filter(F.col("doc_id") < split_at)
        new = docs.filter(F.col("doc_id") >= split_at)
        state = training_data_neardup_state(old, corpus_n=old.count())
        return prepare_training_data_neardup_incremental(new, state)


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
