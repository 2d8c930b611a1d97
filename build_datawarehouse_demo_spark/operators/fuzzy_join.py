"""Set-similarity (fuzzy) join with prefix filtering.

Joins two tables on token-set Jaccard >= t without the quadratic
cross join: the classic prefix-filter bound (Chaudhuri et al., "A
Primitive Operator for Similarity Joins in Data Cleaning", ICDE'06)
says two sets can only reach Jaccard t if the first
``n - ceil(t*n) + 1`` elements of a CONSISTENT global ordering share
at least one token. So:

1. one pass computes global token frequencies (the ordering — rarest
   first, so prefixes carry the most selective tokens);
2. each row sorts its distinct tokens by (freq, token) and explodes
   only its prefix — output volume ~ (1-t) * corpus tokens;
3. candidates come from an EQUI-join on prefix tokens (shuffle keyed
   on token, never a cross product);
4. exact Jaccard on the full sorted arrays verifies candidates.

Lossless: the prefix bound over-generates, never misses; verification
is exact, so results equal the quadratic truth (the oracle computes
that truth directly). Scale: every stage is an equi-join or hash agg;
the frequency table is a broadcast; worst case degrades with hot
tokens, which the rarest-first ordering is precisely there to avoid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sorted_token_sets(df: DataFrame, id_col: str, text_col: str, freq: DataFrame) -> DataFrame:
    """(id, toks) with toks = distinct tokens sorted by (global freq
    asc, token) — the consistent ordering both sides must share."""
    from build_datawarehouse_demo_spark.operators.text import tokens

    tok = df.select(
        F.col(id_col), F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("tok")
    )
    return (
        tok.join(F.broadcast(freq), "tok")
        .groupBy(id_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("freq", "tok"))), lambda s: s["tok"]
            ).alias("toks")
        )
    )


def fuzzy_jaccard_join(
    left: DataFrame,
    right: DataFrame,
    threshold: float,
    left_id: str = "l_id",
    right_id: str = "r_id",
    text_col: str = "text",
) -> DataFrame:
    """All (left_id, right_id, n_inter, jaccard) pairs with
    Jaccard(token set, token set) >= threshold, via prefix filtering.

    The global ordering comes from token frequencies over BOTH inputs
    (it only has to be consistent; using the union keeps one table).
    Rows with no tokens cannot reach any positive threshold and drop.
    """
    if not 0 < threshold <= 1:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    from build_datawarehouse_demo_spark.operators.text import tokens

    both = left.select(tokens(F.col(text_col)).alias("ts")).unionAll(
        right.select(tokens(F.col(text_col)).alias("ts"))
    )
    freq = (
        both.select(F.explode(F.array_distinct("ts")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    l_sets = _sorted_token_sets(left, left_id, text_col, freq)
    r_sets = _sorted_token_sets(right, right_id, text_col, freq)

    def prefix(sets: DataFrame, id_col: str) -> DataFrame:
        n = F.size("toks")
        plen = n - F.ceil(F.lit(threshold) * n).cast("int") + 1
        return sets.select(
            F.col(id_col), F.explode(F.slice("toks", 1, plen)).alias("tok")
        )

    cand = (
        prefix(l_sets, left_id)
        .join(prefix(r_sets, right_id), "tok")
        .select(left_id, right_id)
        .distinct()
    )
    inter = F.size(F.array_intersect("l_toks", "r_toks"))
    return (
        cand.join(l_sets.select(left_id, F.col("toks").alias("l_toks")), left_id)
        .join(r_sets.select(right_id, F.col("toks").alias("r_toks")), right_id)
        .select(
            left_id,
            right_id,
            inter.cast("bigint").alias("n_inter"),
            (
                inter.cast("double")
                / (F.size("l_toks") + F.size("r_toks") - inter)
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
