"""Vectorized Python UDF surface (SURVEY.md §2.10).

The reference's 'UDFs' are ad-hoc pandas row loops, all replaced by
built-in expressions (§2.7) — zero Python needed for parity. This
module is the engine's sanctioned escape hatch for logic that truly
needs Python: Arrow-batched pandas UDFs (scalar / grouped-agg) and
grouped-map applyInPandas. Row-at-a-time `F.udf` is deliberately NOT
exported: at 100 TB the serde tax per row is the difference between
hours and days.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


@F.pandas_udf(T.DoubleType())
def net_price(extended: pd.Series, discount: pd.Series) -> pd.Series:
    """Scalar pandas UDF: vectorized net price. Same IEEE ops per row
    as the SQL expression — bit-identical results, Arrow transfer."""
    return extended * (1.0 - discount)


def grouped_zscore(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Grouped-map applyInPandas: z-score within each group.

    The group's rows arrive as one pandas DataFrame (Arrow batch); the
    output schema is declared up front. At scale each group must fit in
    executor memory — use Window mean/stddev instead when groups are
    huge; this is the per-group-model-fit shape (the thing windows
    can't express), demonstrated on a computable statistic.

    Zero-variance convention: singleton and constant groups emit
    zscore 0.0 (deviation from the mean IS zero), where plain SQL
    ``(x-avg)/stddev_samp`` would yield NULL. The registered oracle
    mirrors this with COALESCE(.../nullif(std,0), 0.0) — the
    convention is deliberate, not drift.
    """
    out_schema = f"{group_col} string, id bigint, {value_col} double, zscore double"

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        mean = pdf[value_col].mean()
        std = pdf[value_col].std(ddof=1)
        z = (pdf[value_col] - mean) / std if std and std > 0 else pdf[value_col] * 0.0
        return pd.DataFrame(
            {
                group_col: pdf[group_col],
                "id": pdf["id"],
                value_col: pdf[value_col],
                "zscore": z,
            }
        )

    return df.groupBy(group_col).applyInPandas(per_group, schema=out_schema)


@F.pandas_udf(T.DoubleType())
def weighted_mean(value: pd.Series, weight: pd.Series) -> float:
    """Grouped-aggregate pandas UDF: Σwx / Σw per group."""
    return float((value * weight).sum() / weight.sum())


def make_tokenize_positions_udtf():
    """Python UDTF (Spark 4 table-function surface): one row per
    token with its position and length.

    Registered as a lateral table function — ``FROM documents d,
    LATERAL tokenize_positions(d.text) t`` — the SQL-native way to
    express one-to-many Python logic (vs applyInPandas, which forces a
    groupBy). Tokenization matches operators/text.py:tokens: split on
    runs of whitespace, drop empties. Row-at-a-time by nature; flip
    spark.sql.execution.pythonUDTF.arrow.enabled for Arrow transfer of
    the emitted rows. Built lazily (factory) so importing this module
    never requires an active session.
    """
    import re

    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, token string, n_chars int")
    class TokenizePositions:
        def eval(self, text: str):
            if text is None:
                return
            pos = 0
            # re.ASCII pins \s to ASCII whitespace — Python's default is
            # Unicode-aware (NBSP etc.) while Spark's Java split and the
            # DuckDB oracle's RE2 \s are ASCII-only
            for tok in re.split(r"\s+", text, flags=re.ASCII):
                if tok:
                    yield pos, tok, len(tok)
                    pos += 1

    return TokenizePositions


def embedding_norms_arrow(df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """mapInArrow: per-row L2 norm of an embedding column, computed on
    the raw Arrow buffers — no pandas materialization, no per-row
    Python.

    The Arrow-native lane of the UDF surface (vs pandas_udf's
    Series-per-batch): list offsets + flat values go straight into
    numpy, squares are segment-summed with ``np.add.reduceat`` (a
    SEQUENTIAL left-to-right fold per segment, matching the oracle's
    list_sum over a double-cast list bit-for-bit), and one RecordBatch
    comes back per input batch. At 100 TB this is the decode path for
    any fixed-width tensor column: zero-copy in, vectorized kernel,
    zero-copy out.
    """
    import numpy as np
    import pyarrow as pa

    def kernel(batches):
        for b in batches:
            ids = b.column(0)
            lists = b.column(1)
            # combine_chunks not needed: mapInArrow yields RecordBatch
            # (single chunk per column) by contract.
            offsets = np.asarray(lists.offsets)
            flat = np.asarray(lists.values, dtype=np.float64)
            sq = flat * flat
            dims = np.diff(offsets)
            # reduceat needs non-empty segments; empty lists get 0.0.
            starts = offsets[:-1].astype(np.int64)
            sums = np.zeros(len(dims), dtype=np.float64)
            nonempty = dims > 0
            if nonempty.any():
                sums[nonempty] = np.add.reduceat(sq, starts[nonempty])
            norms = np.sqrt(sums)
            yield pa.record_batch(
                [
                    ids,
                    pa.array(dims.astype(np.int32)),
                    pa.array(np.round(norms, 6)),
                ],
                names=[id_col, "dim", "l2_norm"],
            )

    return df.select(id_col, vec_col).mapInArrow(
        kernel, schema=f"{id_col} long, dim int, l2_norm double"
    )
