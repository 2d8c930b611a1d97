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
