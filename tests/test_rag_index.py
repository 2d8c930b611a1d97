"""RAG index pipeline (plans/rag_index.py): chunk -> hash-embed ->
trained IVF -> search."""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import functions as F

from build_datawarehouse_demo_spark.plans.rag_index import (
    CHUNK_UID_STRIDE,
    hash_embed_chunks,
    rag_index_append_search,
    rag_index_search,
)


def _h32(s: str) -> int:
    return int(hashlib.md5(f"0:{s}".encode()).hexdigest()[:8], 16)


def test_hash_embed_chunks_matches_reference(spark):
    """Chunk uids and dense hash-count vectors equal a brute Python
    replay of the chunk windows + bucket counts."""
    rows = [
        (0, "a b c d e f g h i j k l m"),  # 13 tokens -> 2 chunks at step 8
        (1, "x y"),
        (2, "   "),  # zero tokens -> no chunks
        (3, "a a a a a a a a a a"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    dim, chunk, ovl = 4, 8, 0
    got = {
        r.vec_id: r.embedding
        for r in hash_embed_chunks(
            df, chunk_size=chunk, overlap=ovl, dim=dim
        ).collect()
    }
    expect = {}
    for doc_id, text in rows:
        toks = [w for w in re.split(r"\s+", text.strip(), flags=re.ASCII) if w]
        for ci, s in enumerate(range(0, len(toks), chunk - ovl)):
            window = toks[s : s + chunk]
            vec = [0.0] * dim
            for t in window:
                vec[_h32(t) % dim] += 1.0
            expect[doc_id * CHUNK_UID_STRIDE + ci] = vec
    assert got == expect
    assert len(expect) == 2 + 1 + 0 + 2


def test_rag_index_search_end_to_end(spark):
    """The composed pipeline returns ranked neighbors for every probe,
    never the probe itself, with a planted near-duplicate document
    ranking first for its probe."""
    base = "spark shuffles partition data across executors for joins"
    rows = [(0, base)] + [
        (i, f"doc {i} " + " ".join(f"w{i}_{j}" for j in range(10)))
        for i in range(1, 30)
    ]
    # doc 30 is a near-duplicate of doc 0's text (same tokens, one added)
    rows.append((30, base + " extra"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = rag_index_search(
        df, n_probe_docs=2, k=3, nprobe=4, chunk_size=16, overlap=0, dim=8
    ).collect()
    assert out, "search returned nothing"
    by_probe = {}
    for r in out:
        assert r.vec_id != r.probe_id
        assert 1 <= r.rank <= 3
        by_probe.setdefault(r.probe_id, []).append(r)
    # probe = doc 0's first chunk; its top hit must be doc 30's chunk
    p0 = sorted(by_probe[0], key=lambda r: r.rank)
    assert p0[0].vec_id == 30 * CHUNK_UID_STRIDE
    assert p0[0].cosine > 0.9


def test_rag_index_append_search_finds_new_batch(spark, tmp_path):
    """Incremental refresh: the near-duplicate lives in the NEW batch,
    so finding it proves appended chunks are (a) routed by the frozen
    stored quantizer, (b) persisted into the bucketed lists, and
    (c) searchable at the right rank. Redelivering the batch must not
    duplicate lists (idempotent append)."""
    base = "spark shuffles partition data across executors for joins"
    old_rows = [(0, base)] + [
        (i, f"doc {i} " + " ".join(f"w{i}_{j}" for j in range(10)))
        for i in range(1, 30)
    ]
    new_rows = [
        (30, base + " extra"),  # near-dup of OLD doc 0, arrives in the new batch
        (31, "completely unrelated fresh content tokens here now"),
    ]
    old = spark.createDataFrame(old_rows, "doc_id long, text string")
    new = spark.createDataFrame(new_rows, "doc_id long, text string")
    spark.sql("DROP TABLE IF EXISTS rag_app_test_idx")
    spark.sql("DROP TABLE IF EXISTS rag_app_test_idx_centroids")
    out = rag_index_append_search(
        old,
        new,
        "rag_app_test_idx",
        n_probe_docs=2,
        k=3,
        nprobe=4,
        chunk_size=16,
        overlap=0,
        dim=8,
        path=str(tmp_path / "rag_app_test_idx"),
    ).collect()
    by_probe = {}
    for r in out:
        assert r.vec_id != r.probe_id
        by_probe.setdefault(r.probe_id, []).append(r)
    p0 = sorted(by_probe[0], key=lambda r: r.rank)
    assert p0[0].vec_id == 30 * CHUNK_UID_STRIDE, (
        "appended near-duplicate chunk must be the probe's top hit"
    )
    assert p0[0].cosine > 0.9

    # the lists table holds every chunk of old ∪ new exactly once, and
    # a redelivered batch is a no-op (id anti-join idempotence)
    n_lists = spark.table("rag_app_test_idx").count()
    n_chunks = hash_embed_chunks(
        old.unionAll(new), chunk_size=16, overlap=0, dim=8
    ).count()
    assert n_lists == n_chunks
    from build_datawarehouse_demo_spark.operators.similarity import ivf_index_append

    ivf_index_append(
        hash_embed_chunks(new, chunk_size=16, overlap=0, dim=8),
        "rag_app_test_idx",
    )
    assert spark.table("rag_app_test_idx").count() == n_lists


def test_stream_rag_index_append_equals_batch(spark, tmp_path):
    """Streaming RAG-index maintenance: new documents arriving across
    micro-batches — one of them REDELIVERED in a later batch — leave
    the persisted index in exactly the state one batch append of the
    distinct documents produces (the effectively-exactly-once
    contract: checkpointed batch ids + the append's id anti-join)."""
    from build_datawarehouse_demo_spark.operators.similarity import (
        ivf_index_append,
    )
    from build_datawarehouse_demo_spark.plans.rag_index import (
        rag_index_build_persisted,
    )
    from build_datawarehouse_demo_spark.streaming.sinks import (
        stream_rag_index_append,
    )

    base = "spark shuffles partition data across executors for joins"
    old_rows = [(0, base)] + [
        (i, f"doc {i} " + " ".join(f"w{i}_{j}" for j in range(10)))
        for i in range(1, 30)
    ]
    batch1 = [(30, base + " extra"), (31, "fresh content alpha beta gamma")]
    # doc 31 redelivered verbatim in the SECOND micro-batch
    batch2 = [(31, "fresh content alpha beta gamma"), (32, "more new tokens here")]
    schema = "doc_id long, text string"
    old = spark.createDataFrame(old_rows, schema)

    for t in (
        "rag_stream_idx", "rag_stream_idx_centroids",
        "rag_stream_tw", "rag_stream_tw_centroids",
    ):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    kw = dict(chunk_size=16, overlap=0, dim=8)
    rag_index_build_persisted(
        old, "rag_stream_idx", path=str(tmp_path / "idx"), **kw
    )
    rag_index_build_persisted(
        old, "rag_stream_tw", path=str(tmp_path / "tw"), **kw
    )

    stream_dir = str(tmp_path / "feed")
    spark.createDataFrame(batch1, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(stream_dir)
    spark.createDataFrame(batch2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(stream_dir)
    import pyspark.sql.types as T

    sch = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    q = stream_rag_index_append(
        spark.readStream.format("parquet")
        .schema(sch)
        .option("maxFilesPerTrigger", "1")
        .load(stream_dir),
        "rag_stream_idx",
        checkpoint_dir=str(tmp_path / "ckpt"),
        **kw,
    )
    q.awaitTermination(120)

    # batch twin: ONE append of the distinct new documents
    distinct_new = spark.createDataFrame(
        batch1 + [batch2[1]], schema
    )
    from build_datawarehouse_demo_spark.plans.rag_index import hash_embed_chunks

    ivf_index_append(hash_embed_chunks(distinct_new, **kw), "rag_stream_tw")

    got = {
        (r.vec_id, r.centroid_id)
        for r in spark.table("rag_stream_idx").select("vec_id", "centroid_id").collect()
    }
    want = {
        (r.vec_id, r.centroid_id)
        for r in spark.table("rag_stream_tw").select("vec_id", "centroid_id").collect()
    }
    assert got == want
    # the redelivered doc appears exactly once
    assert sum(1 for v, _ in got if v // 1000 == 31) == 1


def test_hash_embed_chunks_enforces_stride(spark):
    """The vec_id stride contract is a runtime check, not a comment
    (r11 ADVICE): a document chunking to >= stride windows fails the
    job with a precise message instead of silently aliasing another
    document's uid space through the append anti-join."""
    import pytest
    from pyspark.errors import SparkRuntimeException

    # 20 tokens at step 4 -> 5 chunks; stride 4 -> chunk_id 4 violates
    df = spark.createDataFrame(
        [(7, " ".join(f"t{i}" for i in range(20)))], "doc_id long, text string"
    )
    bad = hash_embed_chunks(df, chunk_size=4, overlap=0, dim=2, stride=4)
    with pytest.raises(SparkRuntimeException, match="stride"):
        bad.collect()
    # the same shape under a sufficient stride is untouched
    ok = hash_embed_chunks(df, chunk_size=4, overlap=0, dim=2, stride=5)
    assert sorted(r.vec_id for r in ok.collect()) == [35, 36, 37, 38, 39]


def test_rag_index_injected_encoder(spark):
    """Real-encoder injection (VERDICT r10 item 7): the RAG index's
    embedder seam is the (vec_id, embedding) contract — replace the
    deterministic hash embedder with an injected 'trained encoder'
    (a committed 4x8 linear map + tanh over the hash features, run as
    an Arrow pandas_udf exactly like a real model would be) and drive
    the SAME build_rag_index + ivf_topk_assigned chain over its
    output. The index plumbing must neither know nor care which
    encoder produced the vectors."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from build_datawarehouse_demo_spark.plans.rag_index import (
        build_rag_index,
        hash_embed_chunks,
    )
    from build_datawarehouse_demo_spark.operators.similarity import (
        ivf_topk_assigned,
    )

    rows = [(0, "spark shuffles partition data across executors for joins")] + [
        (i, f"doc {i} " + " ".join(f"w{i}_{j}" for j in range(12)))
        for i in range(1, 25)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # materialize the feature stage before the encoder UDF — the
    # boundary a real pipeline has anyway (features persisted, model
    # applied on top); inlining the HOF feature expression as the
    # UDF's argument is unevaluable in Spark's Arrow extraction
    feats = hash_embed_chunks(docs, chunk_size=8, overlap=0, dim=8).localCheckpoint()

    # the committed "model": W in R^{4x8}, v = tanh(W @ counts)
    W = np.arange(32, dtype=np.float64).reshape(4, 8) / 16.0 - 1.0

    # lambda form: this test module uses `from __future__ import
    # annotations`, which stringifies type hints and breaks
    # pandas_udf's hint-based dispatch
    encode = pandas_udf(
        lambda batch: pd.Series(
            list(np.tanh(np.stack(batch.to_numpy()) @ W.T))
        ),
        "array<double>",
    )

    vecs = feats.select("vec_id", encode("embedding").alias("embedding"))
    n = vecs.count()
    lists, cents = build_rag_index(vecs.localCheckpoint(), n)
    probes = vecs.filter(F.col("vec_id") % 1000 == 0).limit(3).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    got = ivf_topk_assigned(lists, cents, probes, k=3, nprobe=2).collect()
    by_probe = {}
    for r in got:
        by_probe.setdefault(r.probe_id, []).append(r)
    assert len(by_probe) == 3
    for pid, neighbors in by_probe.items():
        assert all(r.vec_id != pid for r in neighbors)
        ranks = sorted(r.rank for r in neighbors)
        assert ranks == list(range(1, len(ranks) + 1))
