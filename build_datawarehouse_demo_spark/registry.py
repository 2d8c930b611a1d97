"""Query registry: every implemented operator exposed as a
(spark, sf_dir) -> DataFrame callable plus a DuckDB oracle SQL string.

This is the driver contract surface (``__spark_entry__.py`` delegates
here) and the line-by-line answer to SURVEY.md §2's inventory: each op
key from the survey appears as a registry key.

Determinism rules (so order-insensitive value hashes match the oracle):
- money aggregates go through DECIMAL(18,2) casts on BOTH sides, so
  sums are exact integers-in-disguise and bit-identical, then cast back
  to double;
- every computed column is aliased identically in Spark and SQL;
- row_number windows always carry a total order (natural key
  tiebreaks);
- LIMIT queries order by a unique key suffix.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def register_sql(name: str, spark_sql: str, oracle: str | None = None) -> None:
    """Layer-B query: same text semantics on Spark SQL and DuckDB
    (SURVEY.md §2 layer B — the reference delegates full SQL to DuckDB,
    we delegate to Catalyst)."""

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        _views(spark, sf_dir)
        return spark.sql(spark_sql)

    fn.__name__ = f"sql_{name}"
    _QUERIES[name] = fn
    _ORACLES[name] = oracle if oracle is not None else spark_sql


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _load_all()
    return dict(_ORACLES)


def _views(spark: SparkSession, sf_dir: str) -> None:
    from build_datawarehouse_demo_spark.sources.readers import register_star_views

    register_star_views(spark, sf_dir)


_LOADED = False


def _rotation_rank() -> dict[str, int]:
    """Map each key to the LAST round it was green in a driver
    CORRECTNESS_r*.json file (0 = never green).

    Iteration order is a driver contract: each round's correctness pass
    truncates after the first 50 keys, so keys must rotate — round 1
    missed every extension family, round 2's extensions-first reorder
    missed 17 SQL keys (VERDICT.md round 2, "What's missing" #1).
    Ordering by last-green-round ascending self-maintains: err rows
    (e.g. r2's ml_kmeans_lloyd_step canonicalizer crash) and brand-new
    keys sort to the front, last round's green keys sink to the back,
    and every key gets a driver row within two rounds of its creation.
    """
    import glob
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rank: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        try:
            rnd = int(os.path.basename(path)[len("CORRECTNESS_r") : -len(".json")])
            data = json.load(open(path))
        except (ValueError, OSError, json.JSONDecodeError):
            continue
        for key, row in data.items():
            if isinstance(row, dict) and row.get("hash_match") and row.get("err") is None:
                rank[key] = max(rank.get(key, 0), rnd)
    return rank


def _load_all() -> None:
    """Import every module that registers queries (idempotent), then
    reorder the registry by rotation rank (see _rotation_rank)."""
    global _LOADED, _QUERIES, _ORACLES
    if _LOADED:
        return
    from build_datawarehouse_demo_spark.registry_parity import register_parity  # noqa
    from build_datawarehouse_demo_spark.registry_round5 import register_round5  # noqa
    from build_datawarehouse_demo_spark.registry_round6 import (  # noqa
        register_round6,
        register_round6_analytics,
        register_round6_basket,
        register_round6_lsh_auto,
        register_round6_quality,
        register_round6_quality_ri,
        register_round6_streaming,
    )
    from build_datawarehouse_demo_spark.registry_round7 import (  # noqa
        register_round7_ann,
        register_round7_asof,
        register_round7_graph,
        register_round7_interval,
        register_round7_minhash_auto,
        register_round7_simhash_auto,
        register_round7_profiling,
        register_round7_regexp,
        register_round7_sampling,
        register_round7_star,
        register_round7_url,
    )
    from build_datawarehouse_demo_spark.registry_round8 import (  # noqa
        register_round8_ann,
        register_round8_asof,
        register_round8_ivf_index,
        register_round8_multimodal,
        register_round8_sampling,
        register_round8_simhash_components,
        register_round8_simhash_scalable,
        register_round8_spans,
    )
    from build_datawarehouse_demo_spark.registry_round9 import (  # noqa
        register_round9_bpe,
        register_round9_ivf_append,
        register_round9_pipeline,
        register_round9_streaming_neardup,
        register_round9_temperature,
    )
    from build_datawarehouse_demo_spark.registry_round10 import (  # noqa
        register_round10_fetch,
        register_round10_incremental,
        register_round10_streaming_front,
        register_round10_classifier,
        register_round10_curation,
        register_round10_rag,
        register_round10_c4,
        register_round10_rag_append,
        register_round10_gopher,
        register_round10_token_budget,
        register_round10_training_ops,
    )
    from build_datawarehouse_demo_spark.registry_round11 import (  # noqa
        register_round11_gopher_repetition,
    )
    from build_datawarehouse_demo_spark.registry_round12 import (  # noqa
        register_round12_clean_filter_dedup,
        register_round12_dup_ngrams,
        register_round12_streaming_rag,
    )
    from build_datawarehouse_demo_spark.registry_round13 import (  # noqa
        register_round13_incremental_clean,
    )
    from build_datawarehouse_demo_spark.registry_round14 import (  # noqa
        register_round14_leakage_safe_split,
        register_round14_epoch_capped_mix,
        register_round14_logreg_train,
        register_round14_streaming_clean_filter,
    )
    from build_datawarehouse_demo_spark.registry_round15 import (  # noqa
        register_round15_banding_migration,
        register_round15_neardup_migration,
    )
    from build_datawarehouse_demo_spark.registry_round17 import (  # noqa
        register_round17_keep_best,
        register_round17_streaming_migration,
        register_round17_soft_dedup,
        register_round17_streaming_neardup_state,
    )
    from build_datawarehouse_demo_spark.registry_round18 import (  # noqa
        register_round18_keep_best_incremental,
        register_round18_weighted_mix,
        register_round18_weighted_temperature_mix,
        register_round18_neardup_keep_best,
        register_round18_soft_incremental,
    )
    from build_datawarehouse_demo_spark.registry_round19 import (  # noqa
        register_round19_weighted_epoch_mix,
        register_round19_keep_best_soft,
    )
    from build_datawarehouse_demo_spark.registry_sql import register_layer_b  # noqa
    from build_datawarehouse_demo_spark.registry_extensions import register_extensions  # noqa

    register_extensions()
    register_parity()
    register_layer_b()
    register_round5()
    register_round6()
    register_round6_analytics()
    register_round6_basket()
    register_round6_lsh_auto()
    register_round6_quality()
    register_round6_quality_ri()
    register_round6_streaming()
    register_round7_ann()
    register_round7_asof()
    register_round7_graph()
    register_round7_interval()
    register_round7_minhash_auto()
    register_round7_simhash_auto()
    register_round7_profiling()
    register_round7_regexp()
    register_round7_sampling()
    register_round7_star()
    register_round7_url()
    register_round8_ann()
    register_round8_asof()
    register_round8_ivf_index()
    register_round8_multimodal()
    register_round8_sampling()
    register_round8_simhash_components()
    register_round8_simhash_scalable()
    register_round8_spans()
    register_round9_pipeline()
    register_round9_temperature()
    register_round9_bpe()
    register_round9_ivf_append()
    register_round9_streaming_neardup()
    register_round10_incremental()
    register_round10_fetch()
    register_round10_streaming_front()
    register_round10_training_ops()
    register_round10_curation()
    register_round10_token_budget()
    register_round10_rag()
    register_round10_rag_append()
    register_round10_c4()
    register_round10_gopher()
    register_round10_classifier()
    register_round11_gopher_repetition()
    register_round12_clean_filter_dedup()
    register_round12_streaming_rag()
    register_round12_dup_ngrams()
    register_round13_incremental_clean()
    register_round14_leakage_safe_split()
    register_round14_epoch_capped_mix()
    register_round14_logreg_train()
    register_round14_streaming_clean_filter()
    register_round15_banding_migration()
    register_round15_neardup_migration()
    register_round17_streaming_migration()
    register_round17_keep_best()
    register_round17_streaming_neardup_state()
    register_round17_soft_dedup()
    register_round18_keep_best_incremental()
    register_round18_weighted_mix()
    register_round18_weighted_temperature_mix()
    register_round18_neardup_keep_best()
    register_round18_soft_incremental()
    register_round19_weighted_epoch_mix()
    register_round19_keep_best_soft()

    rank = _rotation_rank()
    reg_order = {k: i for i, k in enumerate(_QUERIES)}
    ordered = sorted(_QUERIES, key=lambda k: (rank.get(k, 0), reg_order[k]))
    _QUERIES = {k: _QUERIES[k] for k in ordered}
    _ORACLES = {k: _ORACLES[k] for k in ordered if k in _ORACLES}
    _LOADED = True
