"""Round-17 registry entries.

Theme (VERDICT r16 item 7): oracle-pin the STREAMING banding-migration
contract. r16's `migrate_banding=True` sink hook was pytest-pinned
only; this key runs the real checkpointed stream whose survivor count
crosses the minhash_auto_params boundary MID-STREAM, so the hook's
incremental survivor counter, the rep-level re-sign, the
retire-superseded step, and the post-migration fold are all under the
DuckDB-oracle hash, end-to-end.

Fixture geometry (no survivor-count pin needed — the plateau trick):
the state is built on the first n/5 documents at their RAW count
(~100 at the driver fixture → banding (3, 2)); the remaining 4n/5
stream in TWO micro-batches. The filter front's survivor count is not
statically knowable, but it only has to LAND IN A PLATEAU of the auto
params step function — measured at the driver fixture: 28 survivors
after the build, 82 after batch 1 (still (3, 2) — the hook no-ops),
136 after batch 2 (→ (4, 3), the hook fires on the last fold). Any
count in (100, 2000] yields (4, 3), so the oracle pins the MIGRATED
params through the same plateau witness the r15 batch key uses
(minhash_auto_params at the 3n/4 raw subset), and the in-key assert
hard-fails if the fixture ever drifts out of the plateau — honest
failure, never a silent param mismatch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from build_datawarehouse_demo_spark.registry import register
from build_datawarehouse_demo_spark.registry_round7 import _driver_rows, _t
from build_datawarehouse_demo_spark.registry_round10 import _driver_old_subset_count


def register_round17_streaming_migration() -> None:
    from build_datawarehouse_demo_spark.operators.dedup import minhash_auto_params
    from build_datawarehouse_demo_spark.operators.text import (
        default_classifier_weights,
    )
    from build_datawarehouse_demo_spark.registry_round12 import (
        _CLF_T,
        _GQ_MINW,
        _GQ_STOP,
        _QC_DIM,
        _TOPG,
        _clean_filter_dedup_sql,
        pageify,
    )

    _N_DOCS = _driver_rows("documents", 500)
    _BUILD_AT = _N_DOCS // 5
    # plateau witness (see module docstring): the final SURVIVOR count
    # lands in the same auto-params plateau as the 3n/4 raw subset
    # (driver fixture: survivors 136, witness 375 — both (4, 3))
    _N_MIG_WITNESS = _driver_old_subset_count((3 * _N_DOCS) // 4)
    _MB1, _MR1 = minhash_auto_params(_N_MIG_WITNESS)
    _W_SQL = "[" + ", ".join(repr(x) for x in default_classifier_weights(_QC_DIM)) + "]"

    @register(
        "streaming_clean_filter_migrated",
        oracle=_clean_filter_dedup_sql(_MB1, _MR1, _W_SQL),
    )
    def q_streaming_clean_filter_migrated(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Streaming banding migration end-to-end
        (streaming/sinks.stream_clean_filter_state_append with
        ``migrate_banding=True``): build clean_filter_dedup_state on
        the first n/5 of the pageified corpus (banding auto-sized at
        the RAW build count), stream the remaining 4n/5 through a
        checkpointed availableNow parquet stream in TWO micro-batches,
        and return the final state's output rows. The sink's per-fold
        hook — fed by the incremental survivor counter it seeds at
        wiring — re-bands the state when the survivor count crosses
        the auto-params boundary mid-stream (measured: on the driver
        fixture the crossing happens on batch 2) and retires the
        superseded frames. The oracle is the full batch chain over ALL
        documents at the MIGRATED params, so the hash match proves
        stream folds + in-stream migration ≡ rebuild-at-new-params —
        the oracle-level twin of the r16 pytest
        test_stream_migration_hook_rebands_at_boundary. The in-key
        asserts keep the key honest: the final banding must equal the
        pinned migrated params (a fixture drift out of the plateau
        fails loudly) and must differ from the build banding (a
        vacuous no-op migration fails loudly too)."""
        import shutil
        import uuid

        import pyspark.sql.types as T

        from build_datawarehouse_demo_spark.plans.training_data import (
            clean_filter_dedup_state,
        )
        from build_datawarehouse_demo_spark.registry_extensions import (
            _bucketed_scratch_dir,
        )
        from build_datawarehouse_demo_spark.streaming.sinks import (
            stream_clean_filter_state_append,
        )

        docs = pageify(_t(spark, sf_dir, "documents").select("doc_id", "text"))
        n = docs.count()
        build_at = n // 5
        mid = (build_at + n) // 2
        old = docs.filter(F.col("doc_id") < build_at)
        b1 = docs.filter((F.col("doc_id") >= build_at) & (F.col("doc_id") < mid))
        b2 = docs.filter(F.col("doc_id") >= mid)
        knobs = dict(
            min_words=_GQ_MINW,
            min_stopword_hits=_GQ_STOP,
            max_top_gram_char_frac=_TOPG,
            clf_dim=_QC_DIM,
            clf_threshold=_CLF_T,
        )
        state0 = clean_filter_dedup_state(old, corpus_n=old.count(), **knobs)
        p_build = (state0["bands"], state0["rows"])
        holder = {"state": state0}

        tag = uuid.uuid4().hex[:8]
        scratch = _bucketed_scratch_dir()
        feed = f"{scratch}/clean_mig_stream_{tag}_feed"
        ckpt = f"{scratch}/clean_mig_stream_{tag}_ckpt"
        try:
            b1.coalesce(1).write.mode("overwrite").parquet(feed)
            b2.coalesce(1).write.mode("append").parquet(feed)
            sch = T.StructType(
                [
                    T.StructField("doc_id", T.LongType()),
                    T.StructField("text", T.StringType()),
                ]
            )
            q = stream_clean_filter_state_append(
                spark.readStream.format("parquet")
                .schema(sch)
                .option("maxFilesPerTrigger", "1")
                .load(feed),
                holder,
                checkpoint_dir=ckpt,
                migrate_banding=True,
                **knobs,
            )
            if not q.awaitTermination(300):
                q.stop()
                raise RuntimeError(
                    "streaming_clean_filter_migrated: the availableNow "
                    "stream did not finish within 300s — failing loudly "
                    "rather than returning a stale (pre-fold) state"
                )
            st = holder["state"]
            if n == _N_DOCS:
                # driver-fixture honesty checks (see docstring)
                assert (st["bands"], st["rows"]) == (_MB1, _MR1), (
                    "survivor count left the pinned auto-params plateau: "
                    f"got {(st['bands'], st['rows'])}, oracle pinned {(_MB1, _MR1)}"
                )
                assert (st["bands"], st["rows"]) != p_build, (
                    "migration never fired — the fixture no longer crosses "
                    "an auto-params boundary mid-stream"
                )
            assert st["n_survivors"] == st["survivors"].count()
            return (
                st["output"]
                .select("doc_id", "n_ws_tokens", "clf_score", "component_id", "split")
                .localCheckpoint()
            )
        finally:
            shutil.rmtree(feed, ignore_errors=True)
            shutil.rmtree(ckpt, ignore_errors=True)


def register_round17_keep_best() -> None:
    # ------------------------------------------------------------------
    # quality-aware dedup keep (r17): the Dolma/FineWeb "keep the
    # preferred copy" policy — the component survivor is the member
    # maximizing (n_chars, then smallest id), not the min id. Same
    # simhash pair graph as dedup_cluster_components, so the two keys
    # differ ONLY in the keep rule and the oracle pins exactly that.
    # ------------------------------------------------------------------
    from build_datawarehouse_demo_spark.registry_extensions import _HASH32, _TOK

    pair_ctes = f"""
        tok AS (
          SELECT DISTINCT doc_id, tok
          FROM documents, unnest({_TOK}) AS t(tok)
        ),
        hashed AS (
          SELECT doc_id, {_HASH32.format(expr="'0:' || tok")} AS h FROM tok
        ),
        votes AS (
          SELECT doc_id, i AS bit,
                 sum(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) AS v
          FROM hashed, unnest(generate_series(0, 31)) AS g(i)
          GROUP BY doc_id, i
        ),
        sigs AS (
          SELECT doc_id,
                 CAST(sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS simhash
          FROM votes GROUP BY doc_id
        ),
        blocked AS (
          SELECT doc_id, simhash, blk, (simhash >> (blk * 8)) & 255 AS blk_val
          FROM sigs, unnest(generate_series(0, 3)) AS g(blk)
        ),
        pairs AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM blocked a
          JOIN blocked b ON a.blk = b.blk AND a.blk_val = b.blk_val AND a.doc_id < b.doc_id
          WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
        )"""

    @register(
        "dedup_cluster_keep_best",
        oracle=f"""
        WITH RECURSIVE {pair_ctes},
        edges AS MATERIALIZED (
          SELECT id_a AS s, id_b AS d FROM pairs
          UNION SELECT id_b, id_a FROM pairs
        ),
        reach(s, d) AS (
          SELECT s, d FROM edges
          UNION SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s
        ),
        comp AS (SELECT s AS node, least(s, min(d)) AS component FROM reach GROUP BY s),
        memb AS (
          SELECT doc.doc_id, doc.n_chars,
                 COALESCE(c.component, doc.doc_id) AS component_id
          FROM documents doc LEFT JOIN comp c ON c.node = doc.doc_id
        ),
        keep AS (
          SELECT component_id, doc_id AS keep_id FROM (
            SELECT component_id, doc_id,
                   row_number() OVER (PARTITION BY component_id
                                      ORDER BY n_chars DESC, doc_id) AS rn
            FROM memb) WHERE rn = 1
        )
        SELECT m.doc_id, m.component_id, m.doc_id = k.keep_id AS is_kept
        FROM memb m JOIN keep k ON k.component_id = m.component_id
        """,
    )
    def q_dedup_cluster_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Near-dup clustering with a QUALITY-AWARE keep rule
        (operators/dedup.dedup_keep_best): same simhash pair graph and
        star components as dedup_cluster_components, but each cluster
        keeps its LONGEST member (n_chars, id tiebreak) — the
        Dolma/FineWeb keep-the-preferred-copy policy (longest copy,
        highest source priority, best quality score all plug into the
        same rank_col seam). The argmax is one map-side max_by over
        slim (component, rank, id) rows; documents never shuffle. The
        oracle restates the keep rule as a row_number window over the
        recursive-CTE components."""
        from build_datawarehouse_demo_spark.operators.dedup import (
            connected_components_star,
            dedup_keep_best,
            simhash,
            simhash_near_pairs,
        )

        docs = _t(spark, sf_dir, "documents")
        pairs = simhash_near_pairs(simhash(docs), max_hamming=3, blocks=4)
        comp = connected_components_star(pairs)
        return dedup_keep_best(docs, comp, rank_col="n_chars").select(
            "doc_id", "component_id", "is_kept"
        )


def register_round17_streaming_neardup_state() -> None:
    # ------------------------------------------------------------------
    # streaming NEARDUP-pipeline maintenance (r17): the span-bearing
    # twin of streaming_clean_filter_incremental — the entry RUNS the
    # real checkpointed stream through the new
    # stream_training_data_state_append sink; the oracle is the r10
    # batch-incremental proof (full DuckDB chain over the union at the
    # OLD-subset frozen banding), so a hash match = stream folds ≡
    # rebuild, exact dedup / LSH / components / span removal included.
    # ------------------------------------------------------------------
    from build_datawarehouse_demo_spark.operators.dedup import minhash_auto_params
    from build_datawarehouse_demo_spark.registry_round9 import neardup_full_chain_sql

    _N_DOCS = _driver_rows("documents", 500)
    _SPLIT_AT = (3 * _N_DOCS) // 4
    _N_OLD = _driver_old_subset_count(_SPLIT_AT)
    _MB, _MR = minhash_auto_params(_N_OLD)

    @register(
        "streaming_training_data_incremental",
        oracle=neardup_full_chain_sql(_MB, _MR),
    )
    def q_streaming_training_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Streaming neardup-pipeline maintenance end-to-end
        (streaming/sinks.stream_training_data_state_append): build
        training_data_neardup_state on the first 3/4 of the corpus,
        feed the last 1/4 through a checkpointed availableNow parquet
        stream in TWO micro-batches (maxFilesPerTrigger=1) with the
        first even-id new document REDELIVERED in batch 2, and return
        the final state's output rows. The oracle runs the full batch
        chain over the union at the frozen banding — a hash match
        proves two chained streamed folds + the redelivery anti-join
        reproduce the rebuild exactly, span stage included (batch-2
        ids interleave below batch-1 ids by parity, exercising the
        smaller-new-id rep-takeover path)."""
        import shutil
        import uuid

        import pyspark.sql.types as T

        from build_datawarehouse_demo_spark.plans.training_data import (
            training_data_neardup_state,
        )
        from build_datawarehouse_demo_spark.registry_extensions import (
            _bucketed_scratch_dir,
        )
        from build_datawarehouse_demo_spark.streaming.sinks import (
            stream_training_data_state_append,
        )

        docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
        n = docs.count()
        split_at = (3 * n) // 4
        old = docs.filter(F.col("doc_id") < split_at)
        new = docs.filter(F.col("doc_id") >= split_at)
        holder = {
            "state": training_data_neardup_state(old, corpus_n=old.count())
        }

        tag = uuid.uuid4().hex[:8]
        scratch = _bucketed_scratch_dir()
        feed = f"{scratch}/nd_stream_{tag}_feed"
        ckpt = f"{scratch}/nd_stream_{tag}_ckpt"
        try:
            redeliver = split_at if split_at % 2 == 0 else split_at + 1
            b1 = new.filter(F.col("doc_id") % 2 == 0)
            b2 = new.filter(F.col("doc_id") % 2 == 1).unionByName(
                new.filter(F.col("doc_id") == redeliver)
            )
            b1.coalesce(1).write.mode("overwrite").parquet(feed)
            b2.coalesce(1).write.mode("append").parquet(feed)
            sch = T.StructType(
                [
                    T.StructField("doc_id", T.LongType()),
                    T.StructField("text", T.StringType()),
                ]
            )
            q = stream_training_data_state_append(
                spark.readStream.format("parquet")
                .schema(sch)
                .option("maxFilesPerTrigger", "1")
                .load(feed),
                holder,
                checkpoint_dir=ckpt,
            )
            if not q.awaitTermination(300):
                q.stop()
                raise RuntimeError(
                    "streaming_training_data_incremental: the availableNow "
                    "stream did not finish within 300s — failing loudly "
                    "rather than returning a stale (pre-fold) state"
                )
            return holder["state"]["output"].localCheckpoint()
        finally:
            shutil.rmtree(feed, ignore_errors=True)
            shutil.rmtree(ckpt, ignore_errors=True)


def register_round17_soft_dedup() -> None:
    # ------------------------------------------------------------------
    # soft dedup (r17): the drop-free dedup policy — keep every
    # near-duplicate, weight each row 1/|component| so a duplicate
    # CLASS contributes one unit of loss mass (SoftDeDup-style
    # reweighting). Same simhash pair graph as the cluster keys.
    # ------------------------------------------------------------------
    from build_datawarehouse_demo_spark.registry_extensions import _HASH32, _TOK

    pair_ctes = f"""
        tok AS (
          SELECT DISTINCT doc_id, tok
          FROM documents, unnest({_TOK}) AS t(tok)
        ),
        hashed AS (
          SELECT doc_id, {_HASH32.format(expr="'0:' || tok")} AS h FROM tok
        ),
        votes AS (
          SELECT doc_id, i AS bit,
                 sum(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) AS v
          FROM hashed, unnest(generate_series(0, 31)) AS g(i)
          GROUP BY doc_id, i
        ),
        sigs AS (
          SELECT doc_id,
                 CAST(sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS simhash
          FROM votes GROUP BY doc_id
        ),
        blocked AS (
          SELECT doc_id, simhash, blk, (simhash >> (blk * 8)) & 255 AS blk_val
          FROM sigs, unnest(generate_series(0, 3)) AS g(blk)
        ),
        pairs AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM blocked a
          JOIN blocked b ON a.blk = b.blk AND a.blk_val = b.blk_val AND a.doc_id < b.doc_id
          WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
        )"""

    @register(
        "dedup_soft_weights",
        oracle=f"""
        WITH RECURSIVE {pair_ctes},
        edges AS MATERIALIZED (
          SELECT id_a AS s, id_b AS d FROM pairs
          UNION SELECT id_b, id_a FROM pairs
        ),
        reach(s, d) AS (
          SELECT s, d FROM edges
          UNION SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s
        ),
        comp AS (SELECT s AS node, least(s, min(d)) AS component FROM reach GROUP BY s),
        memb AS (
          SELECT doc.doc_id,
                 COALESCE(c.component, doc.doc_id) AS component_id
          FROM documents doc LEFT JOIN comp c ON c.node = doc.doc_id
        ),
        sizes AS (
          SELECT component_id, CAST(count(*) AS BIGINT) AS n_members
          FROM memb GROUP BY component_id
        )
        SELECT m.doc_id, m.component_id, s.n_members,
               round(1.0 / s.n_members, 6) AS weight
        FROM memb m JOIN sizes s ON s.component_id = m.component_id
        """,
    )
    def q_dedup_soft_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Drop-free near-dup handling
        (operators/dedup.dedup_soft_weights): every document keeps a
        training weight of 1/|near-dup component| — each duplicate
        class contributes one unit of loss mass while its intra-class
        variants stay in the corpus (the SoftDeDup reweighting policy;
        hard dedup is the weight ∈ {0,1} special case). One slim
        (component, count) aggregate joined back; documents never
        shuffle on content."""
        from build_datawarehouse_demo_spark.operators.dedup import (
            connected_components_star,
            dedup_soft_weights,
            simhash,
            simhash_near_pairs,
        )

        docs = _t(spark, sf_dir, "documents")
        pairs = simhash_near_pairs(simhash(docs), max_hamming=3, blocks=4)
        comp = connected_components_star(pairs)
        return dedup_soft_weights(docs, comp).select(
            "doc_id", "component_id", "n_members", "weight"
        )
