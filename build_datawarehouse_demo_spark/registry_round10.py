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
