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
        log-structured contract), then fold the last 1/4 in via
        clean_filter_dedup_apply. Old documents' filter verdicts, LSH
        band keys, near-dup pairs and output rows are REUSED from the
        state — only the batch is filtered and signed, only candidate
        old survivors are re-shingled. The oracle runs the full batch
        chain over the union at the state's frozen banding, so the
        hash match is the refresh ≡ rebuild proof
        (plans/training_data.py clean_filter_dedup_apply docstring has
        the stage-by-stage argument)."""
        from build_datawarehouse_demo_spark.plans.training_data import (
            clean_filter_dedup_state,
            prepare_clean_filter_dedup_incremental,
        )

        docs = pageify(_t(spark, sf_dir, "documents").select("doc_id", "text"))
        n = docs.count()
        split_at = (3 * n) // 4
        old = docs.filter(F.col("doc_id") < split_at)
        new = docs.filter(F.col("doc_id") >= split_at)
        knobs = dict(
            min_words=_GQ_MINW,
            min_stopword_hits=_GQ_STOP,
            max_top_gram_char_frac=_TOPG,
            clf_dim=_QC_DIM,
            clf_threshold=_CLF_T,
        )
        state = clean_filter_dedup_state(old, corpus_n=old.count(), **knobs)
        return prepare_clean_filter_dedup_incremental(new, state, **knobs)
