"""Text-analysis operator semantics."""

from __future__ import annotations

from build_datawarehouse_demo_spark.operators.text import (
    fingerprint,
    lang_id,
    quality_score,
    token_count,
)


def test_token_count_ws_and_regex(spark):
    df = spark.createDataFrame([(1, "  Hello,  world 42!  ")], "doc_id long, text string")
    r = token_count(df).collect()[0]
    assert r.n_ws_tokens == 3  # hello, / world / 42!
    # regex: hello , world 42 ! -> 5
    assert r.n_re_tokens == 5


def test_quality_score_bounds_and_empty(spark):
    df = spark.createDataFrame(
        [(1, "the cat sat on the mat and slept"), (2, ""), (3, "!!! ??? ...")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in quality_score(df).collect()}
    assert 0.0 <= rows[1].quality <= 1.0 and rows[1].quality > 0.5
    assert rows[2].n_tokens == 0 and rows[2].quality >= 0.0
    assert rows[3].punct_ratio > 0.5


def test_lang_id_markers_and_tiebreak(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog of a house"),
            (2, "der Hund und die Katze ist das"),
            (3, "xyzzy plugh"),  # no markers anywhere -> tie -> 'de' (lex-first)
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r.pred_lang for r in lang_id(df).collect()}
    assert rows[1] == "en" and rows[2] == "de" and rows[3] == "de"


def test_fingerprint_order_insensitive(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma alpha beta beta"), (3, "alpha beta delta")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r.fingerprint for r in fingerprint(df).collect()}
    assert rows[1] == rows[2] != rows[3]
