"""In-engine quality-classifier training (r14): the distributed
gradient steps must match a pure-Python replay bit-for-bit at the
round_to boundaries, and the trained vector must plug into
quality_classifier_score's weights seam."""

from __future__ import annotations

import hashlib
import math


def _h32(s: str) -> int:
    return int(hashlib.md5(f"0:{s}".encode()).hexdigest()[:8], 16)


def _reference_train(rows, dim, lr, n_iter):
    """The operator's exact contract in plain Python: hashed bucket
    counts, z = feat·w/n, full-batch gradient, round(…, 6) at every
    iteration boundary."""
    feats = []
    for _, text, y in rows:
        toks = [t for t in text.split() if t]
        if not toks:
            continue
        f = [0.0] * dim
        for t in toks:
            f[_h32(t) % dim] += 1.0
        feats.append((f, float(len(toks)), float(y)))
    n_docs = len(feats)
    w = [0.0] * dim
    for _ in range(n_iter):
        g = [0.0] * dim
        for f, n, y in feats:
            z = 0.0
            for i in range(dim):
                z = z + f[i] * w[i]
            p = 1.0 / (1.0 + math.exp(-(z / n)))
            r = p - y
            for i in range(dim):
                if f[i]:
                    g[i] += f[i] / n * r
        w = [round(w[i] - lr * g[i] / n_docs, 6) for i in range(dim)]
    return w


def test_matches_python_reference_and_feeds_inference(spark):
    from build_datawarehouse_demo_spark.operators.text import (
        quality_classifier_score,
        quality_classifier_train,
    )

    dim, lr, n_iter = 16, 0.2, 3
    rows = [
        (0, "the quick brown fox jumps over the lazy dog", 1.0),
        (1, "der schnelle braune fuchs springt", 0.0),
        (2, "a stitch in time saves nine every time", 1.0),
        (3, "el rapido zorro marron salta", 0.0),
        (4, "all work and no play makes analysis dull", 1.0),
        (5, "", 0.0),  # zero tokens: excluded, like inference's NULL
        (6, "und der alte hund schlaeft unter dem baum", 0.0),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, label double")
    got = {
        r["dim"]: r["weight"]
        for r in quality_classifier_train(
            df, dim=dim, lr=lr, n_iter=n_iter
        ).collect()
    }
    want = _reference_train(rows, dim, lr, n_iter)
    assert sorted(got) == list(range(dim))
    assert [got[i] for i in range(dim)] == want
    assert any(x != 0.0 for x in want)  # training actually moved

    # the trained vector plugs straight into the inference seam
    scored = quality_classifier_score(
        df, dim=dim, weights=[got[i] for i in range(dim)]
    )
    out = {r["doc_id"]: r["clf_score"] for r in scored.collect()}
    assert out[5] is None  # zero-token doc stays unscored
    assert all(0.0 <= v <= 1.0 for k, v in out.items() if v is not None)


def test_rejects_empty_corpus(spark):
    import pytest

    from build_datawarehouse_demo_spark.operators.text import (
        quality_classifier_train,
    )

    df = spark.createDataFrame(
        [(0, "", 1.0)], "doc_id long, text string, label double"
    )
    with pytest.raises(ValueError, match="no documents with tokens"):
        quality_classifier_train(df, dim=8)
