"""End-to-end training-data preparation pipeline.

Composes the text-analysis, dedup, and sampling operator families into
the single pass an LLM data pipeline actually runs over a raw corpus:

    clean -> language ID -> quality score -> filter -> exact dedup
          -> train/val/test split

Each stage is the SAME operator registered (and oracle-checked)
individually — this module only wires them, so the composed result is
exactly what a user would get calling the pieces themselves.

Scale shape: the feature stages (clean/langid/quality) are one
codegen'd scan — withColumn chains over the same row, no joins between
them. The only shuffle is the dedup window on the cleaned-text digest
(16-byte key). The split assignment is a narrow hash filter. At 100 TB
this is: one scan, one digest-keyed exchange, done.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def prepare_training_data(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 5,
    min_quality: float = 0.3,
    val_frac: float = 0.1,
    test_frac: float = 0.1,
) -> DataFrame:
    """Filter, dedup, and split a raw document corpus for training.

    Keeps documents with >= min_tokens tokens, quality >= min_quality,
    and a determined language; keeps the smallest id per distinct
    cleaned text; assigns every survivor a stable hash-keyed split.
    Returns (id, pred_lang, n_tokens, quality, split).
    """
    from build_datawarehouse_demo_spark.operators.sampling import train_val_test_split
    from build_datawarehouse_demo_spark.operators.text import (
        clean_normalize,
        lang_id,
        quality_score,
    )

    featured = quality_score(lang_id(clean_normalize(df, text_col), text_col), text_col)
    # Optimizer barrier: without it, PushDownPredicates substitutes the
    # filter below the feature projection, re-evaluating
    # split(trim(text)) ~20x per row (higher-order functions get no
    # codegen CSE) BELOW the rebalance exchange — the heaviest stage
    # runs once per reference at scan parallelism. The barrier must be
    # (a) REFERENCED by the predicate, or column pruning deletes it and
    # pushdown proceeds, and (b) inside a single non-splittable OR, or
    # the conjuncts push individually. `mono_id < 0` is always false,
    # so semantics are unchanged; the projection containing mono_id is
    # nondeterministic, so the filter stays above it and the features
    # compute ONCE. Nothing is lost at scale: the predicate needs the
    # computed features, so it could never prune the scan anyway.
    featured = featured.withColumn("__barrier", F.monotonically_increasing_id())
    keep = (
        (F.col("n_tokens") >= min_tokens)
        & (F.col("quality") >= min_quality)
        & (F.col("pred_lang") != "und")
    ) | (F.col("__barrier") < F.lit(0))
    kept = featured.filter(keep).drop("__barrier")
    # exact dedup INSIDE the pipeline: min-id-per-digest via a window
    # (one exchange on the 16-byte digest), keeping the survivor's
    # feature columns — the grouped exact_dedup form returns only
    # (digest, keep_id) and would need a join back.
    digest_w = Window.partitionBy(F.md5(F.col("cleaned")))
    dedup = (
        kept.withColumn("__keep", F.min(id_col).over(digest_w))
        .filter(F.col(id_col) == F.col("__keep"))
        .drop("__keep")
    )
    return train_val_test_split(dedup, id_col, val_frac=val_frac, test_frac=test_frac).select(
        id_col, "pred_lang", "n_tokens", "quality", "split"
    )
