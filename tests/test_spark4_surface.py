from __future__ import annotations

import math

from pyspark.sql import functions as F

from build_datawarehouse_demo_spark.operators.udfs import (
    embedding_norms_arrow,
    make_tokenize_positions_udtf,
)


def test_udtf_tokenize_positions_lateral(spark):
    spark.udtf.register("tok_pos_t", make_tokenize_positions_udtf())
    spark.createDataFrame(
        [(1, "  a  bb\tccc "), (2, ""), (3, None)], "doc_id long, text string"
    ).createOrReplaceTempView("tok_docs_t")
    rows = spark.sql(
        "SELECT d.doc_id, t.pos, t.token, t.n_chars "
        "FROM tok_docs_t d, LATERAL tok_pos_t(d.text) t"
    ).collect()
    got = {(r["doc_id"], r["pos"]): (r["token"], r["n_chars"]) for r in rows}
    # doc 2 (empty) and doc 3 (null) emit nothing; whitespace runs and
    # edges never produce empty tokens.
    assert got == {(1, 0): ("a", 1), (1, 1): ("bb", 2), (1, 2): ("ccc", 3)}


def test_embedding_norms_arrow_matches_builtin(spark):
    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0]), (3, []), (4, [1.0] * 64)],
        "vec_id long, embedding array<float>",
    )
    got = {r["vec_id"]: (r["dim"], r["l2_norm"]) for r in embedding_norms_arrow(df).collect()}
    assert got[1] == (2, 5.0)
    assert got[2] == (2, 0.0)
    assert got[3] == (0, 0.0)
    assert got[4] == (64, 8.0)
    # cross-check against the JVM-side fold on real testdata
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    jvm = {
        r["vec_id"]: r["n"]
        for r in emb.select(
            "vec_id",
            F.round(
                F.sqrt(
                    F.aggregate(
                        "embedding",
                        F.lit(0.0),
                        lambda acc, x: acc + x.cast("double") * x.cast("double"),
                    )
                ),
                6,
            ).alias("n"),
        ).collect()
    }
    arrow = {r["vec_id"]: r["l2_norm"] for r in embedding_norms_arrow(emb).collect()}
    assert set(jvm) == set(arrow)
    for k in jvm:
        assert math.isclose(jvm[k], arrow[k], abs_tol=1e-6), (k, jvm[k], arrow[k])


def test_hll_union_estimate_within_bounds(spark):
    # 3 daily sketches over overlapping user sets; merged estimate must
    # sit within 3*rsd of the exact distinct count (documented bound).
    rows = [(u % 7, f"2024-01-0{1 + (u % 3)}", u % 200) for u in range(2000)]
    df = spark.createDataFrame(rows, "g int, d string, user_id long")
    daily = df.groupBy("g", "d").agg(F.hll_sketch_agg("user_id", F.lit(12)).alias("sk"))
    merged = daily.groupBy("g").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx")
    )
    exact = df.groupBy("g").agg(F.count_distinct("user_id").alias("exact"))
    eps = 3 * 1.04 / (2**12) ** 0.5
    for r in exact.join(merged, "g").collect():
        assert abs(r["approx"] - r["exact"]) / r["exact"] <= eps


def test_variant_get_typed_extraction(spark):
    df = spark.createDataFrame(
        [(1, '{"k": 5}'), (2, '{"k": null}'), (3, '{"other": 1}'), (4, None)],
        "id long, props string",
    )
    got = {
        r["id"]: r["k"]
        for r in df.select(
            "id", F.try_variant_get(F.parse_json("props"), "$.k", "bigint").alias("k")
        ).collect()
    }
    assert got == {1: 5, 2: None, 3: None, 4: None}
