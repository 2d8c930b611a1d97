"""Dedup operator semantics on crafted near/exact duplicates."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from build_datawarehouse_demo_spark.operators.dedup import (
    exact_dedup,
    hash32,
    minhash_dedup_pairs,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_pairs,
    word_shingles,
)

DOC = "the quick brown fox jumps over the lazy dog again and again today"


def test_hash32_matches_python_md5(spark):
    df = spark.createDataFrame([("abc",)], "s string")
    got = df.select(hash32(F.col("s"), seed=7).alias("h")).collect()[0].h
    expect = int(hashlib.md5(b"7:abc").hexdigest()[:8], 16)
    assert got == expect


def test_exact_dedup_groups_identical_texts(spark):
    df = spark.createDataFrame(
        [(1, DOC), (2, DOC), (3, "something else entirely here")], "doc_id long, text string"
    )
    out = {(r.keep_id, r.n_copies) for r in exact_dedup(df).collect()}
    assert out == {(1, 2), (3, 1)}


def test_word_shingles_short_doc_empty(spark):
    df = spark.createDataFrame([(1, "only two")], "doc_id long, text string")
    assert word_shingles(df, k=3).count() == 0


def test_minhash_finds_near_duplicate(spark):
    near = DOC.replace("today", "tomorrow")  # one-token edit
    far = "completely different words about spark partitions and shuffles everywhere"
    df = spark.createDataFrame(
        [(1, DOC), (2, near), (3, far)], "doc_id long, text string"
    )
    pairs = {(r.id_a, r.id_b) for r in minhash_dedup_pairs(df, threshold=0.5).collect()}
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)


def test_simhash_identical_docs_equal_and_near_pairs(spark):
    df = spark.createDataFrame([(1, DOC), (2, DOC)], "doc_id long, text string")
    sigs = simhash(df)
    vals = {r.doc_id: r.simhash for r in sigs.collect()}
    assert vals[1] == vals[2]
    pairs = simhash_near_pairs(sigs).collect()
    assert [(p.id_a, p.id_b, p.hamming) for p in pairs] == [(1, 2, 0)]


def test_ngram_jaccard_blocked(spark):
    df = spark.createDataFrame(
        [
            (1, DOC, "en", "s1"),
            (2, DOC + " extra", "en", "s1"),
            (3, DOC, "de", "s1"),  # other block: never compared
        ],
        "doc_id long, text string, lang string, source string",
    )
    pairs = ngram_jaccard_pairs(df, block_cols=("lang", "source"), threshold=0.5).collect()
    assert {(p.id_a, p.id_b) for p in pairs} == {(1, 2)}
