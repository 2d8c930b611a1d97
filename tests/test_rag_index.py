"""RAG index pipeline (plans/rag_index.py): chunk -> hash-embed ->
trained IVF -> search."""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import functions as F

from build_datawarehouse_demo_spark.plans.rag_index import (
    CHUNK_UID_STRIDE,
    hash_embed_chunks,
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
