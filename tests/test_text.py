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
            (3, "xyzzy plugh"),  # no markers anywhere -> 'und', never a language
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r.pred_lang for r in lang_id(df).collect()}
    assert rows[1] == "en" and rows[2] == "de" and rows[3] == "und"


def test_fingerprint_order_insensitive(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma alpha beta beta"), (3, "alpha beta delta")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r.fingerprint for r in fingerprint(df).collect()}
    assert rows[1] == rows[2] != rows[3]


def test_clean_normalize(spark):
    from build_datawarehouse_demo_spark.operators.text import clean_normalize

    df = spark.createDataFrame(
        [(1, "  Hello\x00\x07 World\t\t MIXED  Case \x1f!  "), (2, "")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.cleaned for r in clean_normalize(df).collect()}
    assert got[1] == "hello world mixed case !"
    assert got[2] == ""


def test_vocabulary_top_n_rank_and_docfreq(spark):
    from build_datawarehouse_demo_spark.operators.text import vocabulary

    df = spark.createDataFrame(
        [(1, "a b a c"), (2, "a B b"), (3, "c")], "doc_id long, text string"
    )
    rows = vocabulary(df, top_n=2).collect()
    got = [(r.token, r.n_occurrences, r.n_docs, r.rank) for r in sorted(rows, key=lambda r: r.rank)]
    # a: 3 occ in 2 docs; b: 3 occ (case-folded) in 2 docs -> tie broken by token
    assert got == [("a", 3, 2, 1), ("b", 3, 2, 2)]


def test_repetition_score_values(spark):
    from build_datawarehouse_demo_spark.operators.text import repetition_score

    df = spark.createDataFrame(
        [(1, "x y x y x y"), (2, "a b c d"), (3, "solo")], "doc_id long, text string"
    )
    got = {r.doc_id: (r.n_ngrams, r.n_distinct_ngrams, r.dup_ngram_ratio) for r in repetition_score(df).collect()}
    assert got[1] == (5, 2, 0.6)  # x y,y x,x y,y x,x y -> 2 distinct of 5
    assert got[2] == (3, 3, 0.0)
    assert got[3] == (0, 0, 0.0)  # below n -> empty, not descending-sequence garbage


def test_scrub_pii_replaces_and_counts(spark):
    from build_datawarehouse_demo_spark.operators.text import scrub_pii

    df = spark.createDataFrame(
        [(1, "mail a.b+c@d-e.org or 10.0.0.1 ssn 123-45-6789 end")],
        "doc_id long, text string",
    )
    r = scrub_pii(df).collect()[0]
    assert (r.n_email, r.n_ssn, r.n_ipv4) == (1, 1, 1)
    assert r.scrubbed == "mail <EMAIL> or <IP> ssn <SSN> end"


def test_scrub_pii_counts_match_replacements_on_overlap(spark):
    """Counts are taken after earlier scrubs: the host part of an
    email must not double-count as an IP."""
    from build_datawarehouse_demo_spark.operators.text import scrub_pii

    df = spark.createDataFrame(
        [(1, "contact bob@1.2.3.4.example.com now")], "doc_id long, text string"
    )
    r = scrub_pii(df).collect()[0]
    assert r.n_email == 1 and r.n_ipv4 == 0 and r.n_ssn == 0
    assert r.scrubbed == "contact <EMAIL> now"


def test_tfidf_idf_zero_for_ubiquitous_and_topk(spark):
    from build_datawarehouse_demo_spark.operators.text import tf_idf

    df = spark.createDataFrame(
        [(1, "apple banana banana"), (2, "apple cherry"), (3, "")],
        "doc_id long, text string",
    )
    rows = {(r.doc_id, r.token): r for r in tf_idf(df, top_k=2).collect()}
    # 'apple' appears in 2 of 3 docs: idf = ln(3/2); 'banana' in 1: ln(3)
    import math

    assert rows[(1, "banana")].tf == 2
    assert abs(rows[(1, "banana")].tfidf - round(2 * math.log(3), 6)) < 1e-9
    assert abs(rows[(2, "apple")].idf - round(math.log(1.5), 6)) < 1e-9
    # empty doc contributes no rows; ranks are 1..k per doc
    assert not any(d == 3 for d, _ in rows)
    assert {r.rank for r in rows.values()} <= {1, 2}


def test_bm25_orders_by_relevance_and_breaks_ties(spark):
    from build_datawarehouse_demo_spark.operators.text import bm25_topk

    df = spark.createDataFrame(
        [
            (1, "spark spark spark filler filler"),
            (2, "spark filler filler filler filler"),
            (3, "filler filler"),
            (4, "spark filler filler filler filler"),
        ],
        "doc_id long, text string",
    )
    out = bm25_topk(df, ["spark"], k=3).collect()
    # doc 1 (highest tf) first; docs 2 and 4 identical -> doc_id tiebreak;
    # doc 3 has no query term and is absent entirely
    assert [r.doc_id for r in out] == [1, 2, 4]
    assert out[1].bm25 == out[2].bm25
    assert out[0].bm25 > out[1].bm25


def test_lm_bigram_logprob_hand_computed(spark):
    from build_datawarehouse_demo_spark.operators.text import lm_bigram_logprob
    import math

    # corpus bigrams: doc1 = [a b, b a, a b]; doc2 = [a b, b b]
    # C(a b)=3, C(b a)=1, C(b b)=1; C(a·)=3, C(b·)=2
    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b b"), (3, "solo")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in lm_bigram_logprob(df).collect()}
    # doc1: avg(ln(3/3), ln(1/2), ln(3/3)) = ln(0.5)/3
    assert rows[1].n_bigrams == 3
    assert abs(rows[1].avg_logprob - round(math.log(0.5) / 3, 6)) < 1e-9
    # doc2: avg(ln(3/3), ln(1/2)) = ln(0.5)/2
    assert abs(rows[2].avg_logprob - round(math.log(0.5) / 2, 6)) < 1e-9
    # single-token doc has no bigrams -> absent
    assert 3 not in rows
