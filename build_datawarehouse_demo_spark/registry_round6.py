"""Round-6 registry entries: edit-distance band join, bucketed-edge
PageRank fallback, file-level MERGE over partitioned parquet.

Same oracle discipline as registry_extensions: exact integer /
md5-derived values wherever possible, identical aliases on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from build_datawarehouse_demo_spark.registry import register
from build_datawarehouse_demo_spark.sources.readers import read_parquet


def _t(spark: SparkSession, sf_dir: str, name: str, rebalance: bool = True) -> DataFrame:
    return read_parquet(spark, f"{sf_dir}/{name}.parquet", rebalance=rebalance)


def register_round6() -> None:
    # ------------------------------------------------------------------
    # edit-distance (Levenshtein) band join — data-cleaning twin of the
    # token-set fuzzy join; the reference's entity-name domain
    # (/root/reference/transformation.py:143-168) is where users reach
    # for edit distance rather than Jaccard
    # ------------------------------------------------------------------

    @register(
        "join_levenshtein_band",
        oracle="""
        WITH v AS (SELECT DISTINCT c_name FROM customer WHERE c_name IS NOT NULL)
        SELECT a.c_name AS lval, b.c_name AS rval,
               levenshtein(a.c_name, b.c_name) AS dist
        FROM v a JOIN v b
          ON a.c_name < b.c_name
         AND abs(length(a.c_name) - length(b.c_name)) <= 1
        WHERE levenshtein(a.c_name, b.c_name) <= 1
        """,
    )
    def q_levenshtein_band(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Self-join customer names on edit distance <= 1 via Ed-Join
        prefix filtering (operators/fuzzy_join.py:levenshtein_band_join)
        — the oracle computes the quadratic truth directly, so a hash
        match proves the banded plan lossless on this input."""
        from build_datawarehouse_demo_spark.operators.fuzzy_join import (
            levenshtein_band_join,
        )

        cust = _t(spark, sf_dir, "customer")
        return levenshtein_band_join(
            cust, cust, max_distance=1, left_col="c_name", right_col="c_name"
        )
