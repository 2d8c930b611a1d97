"""Round-13 registry entries.

Theme (VERDICT r12 item 3): the INCREMENTAL modern cleaning stack —
fold a new document batch into a persisted clean-filter-dedup state
(frozen banding, stored band keys / pairs / output) and prove the
refreshed output IDENTICAL to a full rebuild over old ∪ new. Same
oracle discipline as rounds 10-12: the oracle runs the FULL batch
chain over all documents with banding pinned from the OLD subset
count (the frozen-quantizer contract of ivf_index_append and
pipeline_training_data_neardup_incremental), while Spark runs the
incremental path over the 75/25 split — a hash match IS the
refresh ≡ rebuild parity proof.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from build_datawarehouse_demo_spark.registry import register
from build_datawarehouse_demo_spark.registry_round7 import _driver_rows, _t
from build_datawarehouse_demo_spark.registry_round10 import _driver_old_subset_count


def register_round13_incremental_clean() -> None:
    # ------------------------------------------------------------------
    # incremental cleaning stack (VERDICT r12 item 3): the batch
    # pipeline_clean_filter_dedup's stage chain, now with state — the
    # shape a continuously-ingesting 100 TB curation run executes.
    # The oracle is the r12 full-chain DuckDB restatement with banding
    # pinned at the OLD subset count.
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
        "pipeline_clean_filter_dedup_incremental",
        oracle=_clean_filter_dedup_sql(_MB, _MR, _W_SQL),
    )
    def q_clean_filter_dedup_incremental(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Corpus refresh of the modern cleaning stack without
        recompute: build clean_filter_dedup_state on the first 3/4 of
        the pageified corpus (by doc_id — monotone-id append, the
        log-structured contract), then fold the last 1/4 in as TWO
        monotone batches with a state COMPACTION between them (r15 —
        the fold1 apply compacts the refreshed state to bucketed
        parquet tables and retires the superseded checkpoint blocks;
        fold2 then runs against pure table scans). Old documents'
        filter verdicts, LSH band keys, near-dup pairs and output rows
        are REUSED from the state — only each batch is filtered and
        signed, only candidate old survivors are re-shingled. The
        oracle runs the full batch chain over the union at the state's
        frozen banding, so the hash match is the refresh ≡ rebuild
        proof THROUGH the compaction (plans/training_data.py
        clean_filter_dedup_apply / compact_state docstrings have the
        stage-by-stage argument)."""
        import uuid

        from build_datawarehouse_demo_spark.plans.training_data import (
            clean_filter_dedup_apply,
            clean_filter_dedup_state,
            prepare_clean_filter_dedup_incremental,
        )
        from build_datawarehouse_demo_spark.registry_extensions import (
            _bucketed_scratch_dir,
        )

        docs = pageify(_t(spark, sf_dir, "documents").select("doc_id", "text"))
        n = docs.count()
        split_at = (3 * n) // 4
        mid = (7 * n) // 8
        old = docs.filter(F.col("doc_id") < split_at)
        b1 = docs.filter((F.col("doc_id") >= split_at) & (F.col("doc_id") < mid))
        b2 = docs.filter(F.col("doc_id") >= mid)
        knobs = dict(
            min_words=_GQ_MINW,
            min_stopword_hits=_GQ_STOP,
            max_top_gram_char_frac=_TOPG,
            clf_dim=_QC_DIM,
            clf_threshold=_CLF_T,
        )
        state = clean_filter_dedup_state(old, corpus_n=old.count(), **knobs)
        tag = uuid.uuid4().hex[:8]
        state = clean_filter_dedup_apply(
            b1,
            state,
            compact_to=f"cfinc_{tag}",
            compact_path=f"{_bucketed_scratch_dir()}/cfinc_{tag}",
            **knobs,
        )
        return prepare_clean_filter_dedup_incremental(b2, state, **knobs)
