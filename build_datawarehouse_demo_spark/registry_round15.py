"""Round-15 registry entries.

Theme (VERDICT r14 item 2): frozen-banding MIGRATION for the
incremental cleaning stack — when the corpus outgrows the state's
build-time auto-params point, re-sign the digest-group reps at the new
(bands, rows) and swap the state's band keys and pair set, reps-only
cost. The oracle proves the migration contract end-to-end: a migrated
state's NEXT apply hash-matches a full rebuild at the NEW params.

The fixture is sized to cross a real auto-params boundary: the state
is built on the first n/5 documents (~100 at the driver fixture —
banding (3, 2)), grows past the 100-doc boundary during fold 1, and
migrates to the (4, 3) banding minhash_auto_params chooses at 3n/4
documents; fold 2 then runs at the migrated banding. The oracle runs
the full batch chain over ALL documents at the MIGRATED params.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from build_datawarehouse_demo_spark.registry import register
from build_datawarehouse_demo_spark.registry_round7 import _driver_rows, _t
from build_datawarehouse_demo_spark.registry_round10 import _driver_old_subset_count


def register_round15_banding_migration() -> None:
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
    _BUILD_AT = _N_DOCS // 5
    _MIGRATE_AT = (3 * _N_DOCS) // 4
    _N_BUILD = _driver_old_subset_count(_BUILD_AT)
    _N_MIG = _driver_old_subset_count(_MIGRATE_AT)
    # the whole point: the boundary is crossed, so the migration is
    # real — (3, 2) at ~100 build docs vs (4, 3) at ~375 on the driver
    # fixture (a vacuous fixture would make these equal; the in-key
    # assert still holds, but the key stops exercising a re-band)
    _MB0, _MR0 = minhash_auto_params(_N_BUILD)  # noqa: F841 — documented pin
    _MB1, _MR1 = minhash_auto_params(_N_MIG)
    _W_SQL = "[" + ", ".join(repr(x) for x in default_classifier_weights(_QC_DIM)) + "]"

    @register(
        "pipeline_clean_filter_dedup_migrated",
        oracle=_clean_filter_dedup_sql(_MB1, _MR1, _W_SQL),
    )
    def q_clean_filter_dedup_migrated(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Banding migration end-to-end
        (plans/training_data.migrate_clean_filter_banding): build
        clean_filter_dedup_state on the first n/5 of the pageified
        corpus (banding auto-sized there), fold [n/5, 3n/4) at that
        FROZEN banding, then MIGRATE the state to the banding
        auto-params choose at 3n/4 documents — reps re-signed, band
        keys and pairs swapped, components and output rebuilt at
        rep scale; survivors and the member map untouched — and fold
        the last quarter at the migrated banding. The oracle runs the
        full batch chain over ALL documents at the MIGRATED params, so
        the hash match is the migrated-apply ≡ rebuild-at-new-params
        proof. The in-key assert fails loudly if the fixture ever
        stops matching the pinned migrated params (parity would
        silently hold even for a no-op migration — the assert keeps
        the key honest about exercising a real re-band)."""
        from build_datawarehouse_demo_spark.plans.training_data import (
            clean_filter_dedup_apply,
            clean_filter_dedup_state,
            migrate_clean_filter_banding,
            prepare_clean_filter_dedup_incremental,
        )

        docs = pageify(_t(spark, sf_dir, "documents").select("doc_id", "text"))
        n = docs.count()
        build_at = n // 5
        migrate_at = (3 * n) // 4
        old = docs.filter(F.col("doc_id") < build_at)
        b1 = docs.filter(
            (F.col("doc_id") >= build_at) & (F.col("doc_id") < migrate_at)
        )
        b2 = docs.filter(F.col("doc_id") >= migrate_at)
        knobs = dict(
            min_words=_GQ_MINW,
            min_stopword_hits=_GQ_STOP,
            max_top_gram_char_frac=_TOPG,
            clf_dim=_QC_DIM,
            clf_threshold=_CLF_T,
        )
        state = clean_filter_dedup_state(old, corpus_n=old.count(), **knobs)
        state = clean_filter_dedup_apply(b1, state, **knobs)
        state = migrate_clean_filter_banding(state, corpus_n=b1.count() + old.count())
        if n == _N_DOCS:
            # the pinned-fixture honesty check (see docstring); at other
            # SFs the banding derives from the runtime count instead
            assert (state["bands"], state["rows"]) == (_MB1, _MR1)
        return prepare_clean_filter_dedup_incremental(b2, state, **knobs)


def register_round15_neardup_migration() -> None:
    from build_datawarehouse_demo_spark.operators.dedup import minhash_auto_params
    from build_datawarehouse_demo_spark.registry_round9 import neardup_full_chain_sql

    _N_DOCS = _driver_rows("documents", 500)
    _BUILD_AT = _N_DOCS // 5
    _MIGRATE_AT = (3 * _N_DOCS) // 4
    _N_MIG = _driver_old_subset_count(_MIGRATE_AT)
    _MB1, _MR1 = minhash_auto_params(_N_MIG)

    @register(
        "pipeline_training_data_neardup_migrated",
        oracle=neardup_full_chain_sql(_MB1, _MR1),
    )
    def q_training_neardup_migrated(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Banding migration for the NEARDUP pipeline state
        (plans/training_data.migrate_training_data_neardup_banding):
        same rep-resign core as the clean-stack key, plus the SPAN
        refresh — re-banding can change the component-rep set, so the
        migration re-runs the apply's span-delta machinery over the
        rep-set diff (dropped + added reps mark their grams' digests
        changed; only affected docs rebuild). Build at n/5 (banding
        (3,2) on the driver fixture), fold [n/5, 3n/4) frozen, migrate
        at 3n/4 → (4,3), fold the last quarter at the migrated
        banding; the oracle runs the full chain over ALL documents at
        the MIGRATED params."""
        from build_datawarehouse_demo_spark.plans.training_data import (
            migrate_training_data_neardup_banding,
            prepare_training_data_neardup_incremental,
            training_data_neardup_apply,
            training_data_neardup_state,
        )

        docs = _t(spark, sf_dir, "documents")
        n = docs.count()
        build_at = n // 5
        migrate_at = (3 * n) // 4
        old = docs.filter(F.col("doc_id") < build_at)
        b1 = docs.filter(
            (F.col("doc_id") >= build_at) & (F.col("doc_id") < migrate_at)
        )
        b2 = docs.filter(F.col("doc_id") >= migrate_at)
        state = training_data_neardup_state(old, corpus_n=old.count())
        state = training_data_neardup_apply(b1, state)
        state = migrate_training_data_neardup_banding(
            state, corpus_n=b1.count() + old.count()
        )
        if n == _N_DOCS:
            assert (state["bands"], state["rows"]) == (_MB1, _MR1)
        return prepare_training_data_neardup_incremental(b2, state)
