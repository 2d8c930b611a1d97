"""Streaming incremental cleaning stack (r14): micro-batches folded
into clean_filter_dedup_state through the checkpointed sink must leave
the output identical to the full batch pipeline over the union —
including a same-id redelivery (dropped by the survivor anti-join) and
out-of-order ids across batches (a later batch carrying a smaller id
that takes over a component rep slot)."""

from __future__ import annotations

import pyspark.sql.types as T
from pyspark.sql import functions as F

LOOSE = dict(
    min_words_per_line=1,
    min_sentences=1,
    min_words=1,
    min_stopword_hits=0,
    max_top_gram_char_frac=(1.0, 1.0, 1.0),
    clf_threshold=-1.0,
)

SCHEMA = T.StructType(
    [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
)


def _run_stream(spark, tmp_path, old_rows, batches, **sink_opts):
    from build_datawarehouse_demo_spark.plans.training_data import (
        clean_filter_dedup_state,
    )
    from build_datawarehouse_demo_spark.streaming.sinks import (
        stream_clean_filter_state_append,
    )

    old = spark.createDataFrame(old_rows, "doc_id long, text string")
    holder = {"state": clean_filter_dedup_state(old, corpus_n=len(old_rows), **LOOSE)}
    feed = str(tmp_path / "feed")
    for i, b in enumerate(batches):
        mode = "overwrite" if i == 0 else "append"
        spark.createDataFrame(b, "doc_id long, text string").coalesce(1).write.mode(
            mode
        ).parquet(feed)
    q = stream_clean_filter_state_append(
        spark.readStream.format("parquet")
        .schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .load(feed),
        holder,
        checkpoint_dir=str(tmp_path / "ckpt"),
        **sink_opts,
        **LOOSE,
    )
    assert q.awaitTermination(180)
    return holder["state"]


def test_stream_equals_batch_with_redelivery_and_id_interleave(spark, tmp_path):
    from build_datawarehouse_demo_spark.plans.training_data import (
        prepare_clean_filter_dedup,
    )

    base = [f"btok{i}" for i in range(50)]
    near = base[:46] + [f"n{i}" for i in range(4)]  # near-dup of base
    old_rows = [(i, " ".join(f"o{i}_{j}" for j in range(25)) + ".") for i in range(5)]
    old_rows += [(5, " ".join(base) + ".")]
    # batch 1: large ids, one survivor to redeliver, one near-dup of a
    # stored doc; batch 2: a SMALLER id near-dup that takes over the
    # component rep slot, plus the batch-1 doc redelivered verbatim
    b1 = [
        (200, " ".join(near) + "."),
        (201, " ".join(f"f1_{j}" for j in range(20)) + "."),
    ]
    b2 = [
        (100, " ".join(base[:48] + ["q1", "q2"]) + "."),  # near-dup, id < 200
        (201, " ".join(f"f1_{j}" for j in range(20)) + "."),  # same-id redelivery
        (202, " ".join(f"f2_{j}" for j in range(20)) + "."),
    ]
    state = _run_stream(spark, tmp_path, old_rows, [b1, b2])

    distinct_new = b1 + [b2[0], b2[2]]
    full = prepare_clean_filter_dedup(
        spark.createDataFrame(old_rows + distinct_new, "doc_id long, text string"),
        corpus_n=len(old_rows),
        **LOOSE,
    )
    got = sorted(tuple(r) for r in state["output"].collect())
    want = sorted(tuple(r) for r in full.collect())
    assert got == want and len(got) > 0
    ids = {r[0] for r in got}
    # the redelivered doc appears exactly once; the near-dup family
    # (5, 100, 200) collapsed to its min id 5
    assert 201 in ids and 202 in ids
    assert 5 in ids and 100 not in ids and 200 not in ids


def test_stream_fold_of_fully_redelivered_batch_is_noop(spark, tmp_path):
    """A micro-batch consisting ONLY of already-folded documents (the
    pure at-least-once replay) must leave the state output unchanged —
    the survivor anti-join empties the fold."""
    from build_datawarehouse_demo_spark.plans.training_data import (
        clean_filter_dedup_state,
    )

    old_rows = [(i, " ".join(f"r{i}_{j}" for j in range(22)) + ".") for i in range(4)]
    b1 = [(50, " ".join(f"nn_{j}" for j in range(20)) + ".")]
    state = _run_stream(spark, tmp_path, old_rows, [b1, b1])
    spark_old = spark.createDataFrame(old_rows + b1, "doc_id long, text string")
    want = clean_filter_dedup_state(spark_old, corpus_n=len(old_rows), **LOOSE)
    assert sorted(tuple(r) for r in state["output"].collect()) == sorted(
        tuple(r) for r in want["output"].collect()
    )
    assert state["survivors"].count() == len(old_rows) + 1


def test_stream_compaction_hook_keeps_state_flat_and_correct(spark, tmp_path):
    """compact_every=1 (r15 ADVICE): every fold compacts the refreshed
    state to bucketed tables and retires the superseded blocks, so
    after the stream drains the state frames are ZERO-union table
    scans (no per-fold plan growth) and the output still equals the
    full batch rebuild over the union."""
    from build_datawarehouse_demo_spark.plans.training_data import (
        prepare_clean_filter_dedup,
    )

    old_rows = [(i, " ".join(f"c{i}_{j}" for j in range(22)) + ".") for i in range(4)]
    b1 = [(50, " ".join(f"s1_{j}" for j in range(20)) + ".")]
    b2 = [(60, " ".join(f"s2_{j}" for j in range(20)) + ".")]
    state = _run_stream(
        spark,
        tmp_path,
        old_rows,
        [b1, b2],
        compact_every=1,
        compact_to="strm_cmp_test",
        compact_path=str(tmp_path / "cmp"),
    )
    for key in ("survivors", "band_keys", "dg_members", "rep_digests", "pairs", "output"):
        p = state[key]._jdf.queryExecution().analyzed().toString()
        assert "Union" not in p and "LogicalRDD" not in p, key
    full = prepare_clean_filter_dedup(
        spark.createDataFrame(old_rows + b1 + b2, "doc_id long, text string"),
        corpus_n=len(old_rows),
        **LOOSE,
    )
    assert sorted(tuple(r) for r in state["output"].collect()) == sorted(
        tuple(r) for r in full.collect()
    )


def test_stream_compact_every_requires_prefix(spark):
    import pytest

    from build_datawarehouse_demo_spark.streaming.sinks import (
        stream_clean_filter_state_append,
    )

    with pytest.raises(ValueError, match="compact_to"):
        stream_clean_filter_state_append(
            spark.readStream.format("rate").load(),
            {"state": {}},
            checkpoint_dir="/tmp/never",
            compact_every=2,
        )
