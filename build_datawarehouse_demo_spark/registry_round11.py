"""Round-11 registry entries.

Theme (VERDICT r10): close the last unverified surface —
`gopher_repetition_rules` gets its full-rule oracle (the composed
cleaning-stack pipeline it feeds lands in registry_round12).
Same oracle discipline as rounds 7-10: every ratio an exact integer
division rounded at 6dp, every boolean restated, pinned constants
derived from the driver fixture through the SAME functions the
implementation calls.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from build_datawarehouse_demo_spark.registry import register
from build_datawarehouse_demo_spark.registry_round7 import _t


def register_round11_gopher_repetition() -> None:
    # ------------------------------------------------------------------
    # the Gopher repetitious-text battery (Rae et al. 2021, Appendix
    # A1.1.2) — dup line/para count+char fractions and top-2/3/4-gram
    # char fractions, all from ONE codegen'd scan (run-length fold over
    # the sorted gram array, no explode). The oracle restates the mode
    # with a group-by + ORDER BY count DESC, gram ASC tie-break — the
    # exact tie the fold's strict-> update keeps (VERDICT r10 item 1).
    # ------------------------------------------------------------------
    from build_datawarehouse_demo_spark.registry_extensions import _TOK

    @register(
        "text_gopher_repetition",
        oracle=rf"""
        WITH d AS (
          SELECT doc_id, {_TOK} AS w,
                 list_filter(string_split(text, chr(10)),
                             l -> trim(l) <> '') AS lines,
                 list_filter(regexp_split_to_array(text, '\n{{2,}}'),
                             p -> trim(p) <> '') AS paras
          FROM documents
        ),
        dup AS (
          SELECT doc_id,
                 CAST(len(array_to_string(w, ' ')) AS BIGINT) AS norm_len,
                 len(lines) AS nl,
                 len(lines) - len(list_distinct(lines)) AS nl_dup,
                 coalesce(list_sum(list_transform(lines, x -> len(x))), 0)
                   AS lc,
                 coalesce(list_sum(list_transform(list_distinct(lines),
                                                  x -> len(x))), 0) AS lc1,
                 len(paras) AS np,
                 len(paras) - len(list_distinct(paras)) AS np_dup,
                 coalesce(list_sum(list_transform(paras, x -> len(x))), 0)
                   AS pc,
                 coalesce(list_sum(list_transform(list_distinct(paras),
                                                  x -> len(x))), 0) AS pc1
          FROM d
        ),
        grams AS (
          SELECT doc_id, n.n AS n,
                 array_to_string(w[i.i : i.i + n.n - 1], ' ') AS gram
          FROM d,
               unnest([2, 3, 4]) AS n(n),
               unnest(generate_series(1, len(w) - n.n + 1)) AS i(i)
          WHERE len(w) >= n.n
        ),
        counted AS (
          SELECT doc_id, n, gram, count(*) AS c
          FROM grams GROUP BY doc_id, n, gram
        ),
        best AS (
          SELECT doc_id, n, gram, c,
                 row_number() OVER (PARTITION BY doc_id, n
                                    ORDER BY c DESC, gram ASC) AS rk
          FROM counted
        ),
        tg AS (
          SELECT doc_id,
                 max(CASE WHEN n = 2 THEN c * len(gram) END) AS t2,
                 max(CASE WHEN n = 3 THEN c * len(gram) END) AS t3,
                 max(CASE WHEN n = 4 THEN c * len(gram) END) AS t4
          FROM best WHERE rk = 1 GROUP BY doc_id
        ),
        m AS (
          SELECT dup.doc_id,
                 CASE WHEN nl > 0
                      THEN round(CAST(nl_dup AS DOUBLE) / nl, 6) END
                   AS dup_line_frac,
                 CASE WHEN nl > 0
                      THEN round(CAST(lc - lc1 AS DOUBLE) / lc, 6) END
                   AS dup_line_char_frac,
                 CASE WHEN np > 0
                      THEN round(CAST(np_dup AS DOUBLE) / np, 6) END
                   AS dup_para_frac,
                 CASE WHEN np > 0
                      THEN round(CAST(pc - pc1 AS DOUBLE) / pc, 6) END
                   AS dup_para_char_frac,
                 round(CAST(t2 AS DOUBLE) / norm_len, 6)
                   AS top_2gram_char_frac,
                 round(CAST(t3 AS DOUBLE) / norm_len, 6)
                   AS top_3gram_char_frac,
                 round(CAST(t4 AS DOUBLE) / norm_len, 6)
                   AS top_4gram_char_frac
          FROM dup LEFT JOIN tg USING (doc_id)
        )
        SELECT doc_id, dup_line_frac, dup_line_char_frac, dup_para_frac,
               dup_para_char_frac, top_2gram_char_frac, top_3gram_char_frac,
               top_4gram_char_frac,
               coalesce(dup_line_frac <= 0.30, TRUE) AS rule_dup_line_frac,
               coalesce(dup_line_char_frac <= 0.20, TRUE)
                 AS rule_dup_line_char_frac,
               coalesce(dup_para_frac <= 0.30, TRUE) AS rule_dup_para_frac,
               coalesce(dup_para_char_frac <= 0.20, TRUE)
                 AS rule_dup_para_char_frac,
               coalesce(top_2gram_char_frac <= 0.20, TRUE)
                 AS rule_top_2gram_char_frac,
               coalesce(top_3gram_char_frac <= 0.18, TRUE)
                 AS rule_top_3gram_char_frac,
               coalesce(top_4gram_char_frac <= 0.16, TRUE)
                 AS rule_top_4gram_char_frac,
               (coalesce(dup_line_frac <= 0.30, TRUE)
                AND coalesce(dup_line_char_frac <= 0.20, TRUE)
                AND coalesce(dup_para_frac <= 0.30, TRUE)
                AND coalesce(dup_para_char_frac <= 0.20, TRUE)
                AND coalesce(top_2gram_char_frac <= 0.20, TRUE)
                AND coalesce(top_3gram_char_frac <= 0.18, TRUE)
                AND coalesce(top_4gram_char_frac <= 0.16, TRUE)) AS kept
        FROM m
        """,
    )
    def q_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
        """The Gopher repetitious-text battery
        (operators/text.py:gopher_repetition_rules — Rae et al. 2021
        Appendix A1.1.2 thresholds): duplicate line / paragraph count
        and character fractions plus top word-2/3/4-gram character
        fractions, per-rule booleans and the conjunction verdict —
        one codegen'd scan (sorted-array run-length fold for the
        per-document mode, no explode/groupBy), with the oracle
        restating the mode as GROUP BY + ORDER BY count DESC, gram
        ASC and every fraction as the same exact integer division."""
        from build_datawarehouse_demo_spark.operators.text import (
            gopher_repetition_rules,
        )

        return gopher_repetition_rules(_t(spark, sf_dir, "documents"))
