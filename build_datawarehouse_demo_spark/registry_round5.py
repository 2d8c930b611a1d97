"""Round-5 registry entries: graph analytics, Spark 4 API surface
(UDTF, VARIANT, HLL sketches, mapInArrow), runtime-filter joins,
deterministic per-group sampling, and multi-dim clustering.

Same oracle discipline as registry_extensions: exact integer /
md5-derived values wherever possible, 6-decimal rounding over exact
double math where summation order may drift between engines, identical
aliases on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from build_datawarehouse_demo_spark.registry import register
from build_datawarehouse_demo_spark.sources.readers import read_parquet


def _t(spark: SparkSession, sf_dir: str, name: str, rebalance: bool = True) -> DataFrame:
    return read_parquet(spark, f"{sf_dir}/{name}.parquet", rebalance=rebalance)


def _pagerank_oracle(damping: float = 0.85, iterations: int = 5) -> str:
    """Unrolled fixed-iteration PageRank in portable SQL.

    Mirrors operators/graph.py:pagerank exactly: same edge derivation,
    same share = w/out_w staging, same (1-d)/N + d*sum(rank*share)
    update, decimal literals CAST to DOUBLE so both engines do the
    identical IEEE ops (a bare 0.85 is DECIMAL in DuckDB).
    """
    d = f"CAST({damping} AS DOUBLE)"
    parts = [
        f"""
        WITH seq AS (
          SELECT event_type,
                 lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS prev_type
          FROM events WHERE event_type IS NOT NULL
        ),
        edges AS (
          SELECT prev_type AS src, event_type AS dst, count(*) AS w
          FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2
        ),
        nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
        nn AS (SELECT count(*) AS n FROM nodes),
        outw AS (SELECT src, sum(w) AS out_w FROM edges GROUP BY src),
        sh AS (
          SELECT e.src, e.dst, CAST(e.w AS DOUBLE) / o.out_w AS share
          FROM edges e JOIN outw o ON o.src = e.src
        ),
        pr0 AS (SELECT node, CAST(1 AS DOUBLE) / (SELECT n FROM nn) AS rank FROM nodes)"""
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f""",
        c{i} AS (
          SELECT s.dst AS node, sum(p.rank * s.share) AS c
          FROM pr{i - 1} p JOIN sh s ON s.src = p.node GROUP BY s.dst
        ),
        pr{i} AS (
          SELECT nd.node,
                 (CAST(1 AS DOUBLE) - {d}) / (SELECT n FROM nn)
                 + {d} * coalesce(c.c, CAST(0 AS DOUBLE)) AS rank
          FROM nodes nd LEFT JOIN c{i} c ON c.node = nd.node
        )"""
        )
    parts.append(
        f"""
        SELECT node, round(rank, 6) AS rank FROM pr{iterations}"""
    )
    return "".join(parts)


def register_round5() -> None:
    # ------------------------------------------------------------------
    # graph analytics
    # ------------------------------------------------------------------

    @register("graph_pagerank", oracle=_pagerank_oracle())
    def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Weighted PageRank over the event-type transition graph.

        The iterative join+agg fixed-point pattern (Pregel without
        RDDs); see operators/graph.py for the 100 TB plan shape.
        """
        from build_datawarehouse_demo_spark.operators.graph import (
            pagerank,
            transition_edges,
        )

        edges = transition_edges(_t(spark, sf_dir, "events"))
        return pagerank(edges).select("node", F.round("rank", 6).alias("rank"))

    # ------------------------------------------------------------------
    # Spark 4 API surface: UDTF, VARIANT, HLL sketches, mapInArrow
    # ------------------------------------------------------------------

    @register(
        "udtf_tokenize_positions",
        oracle=r"""
        WITH tok AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS w
          FROM documents WHERE text IS NOT NULL
        )
        SELECT doc_id, i - 1 AS pos, w[i] AS token, length(w[i]) AS n_chars
        FROM tok, unnest(generate_series(1, len(w))) AS t(i)
        """,
    )
    def q_udtf_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Python UDTF via LATERAL join — the Spark 4 table-function
        escape hatch for one-to-many Python logic."""
        from build_datawarehouse_demo_spark.operators.udfs import (
            make_tokenize_positions_udtf,
        )

        spark.udtf.register("tokenize_positions", make_tokenize_positions_udtf())
        _t(spark, sf_dir, "documents", rebalance=False).createOrReplaceTempView(
            "udtf_docs"
        )
        return spark.sql(
            """
            SELECT d.doc_id, t.pos, t.token, t.n_chars
            FROM udtf_docs d, LATERAL tokenize_positions(d.text) t
            WHERE d.text IS NOT NULL
            """
        )

    @register(
        "sql_variant_extract",
        oracle="""
        SELECT event_type,
               count(*) AS n_events,
               CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
               min(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
               max(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
        FROM events
        GROUP BY event_type
        """,
    )
    def q_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
        """VARIANT ingestion (Spark 4): parse_json once at scan time,
        then typed variant_get extraction — the open-schema semi-
        structured path that replaces repeated string JSON parsing.
        At 100 TB the parse happens once per row in the scan project,
        and the binary variant encoding is far cheaper to re-read than
        re-parsing JSON text per access."""
        ev = _t(spark, sf_dir, "events", rebalance=False)
        # try_parse_json: malformed rows become NULL instead of failing
        # the scan (the oracle's input is well-formed, so parity holds).
        k = F.try_variant_get(F.try_parse_json("props"), "$.k", "bigint").alias("k")
        return (
            ev.select("event_type", k)
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum("k").alias("sum_k"),
                F.min("k").alias("min_k"),
                F.max("k").alias("max_k"),
            )
        )

    @register(
        "agg_hll_sketch_merge",
        oracle="""
        SELECT event_type,
               count(DISTINCT user_id) AS exact_users,
               TRUE AS within_bounds
        FROM events
        GROUP BY event_type
        """,
    )
    def q_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Mergeable HLL sketches (Spark 4 hll_* functions): build one
        sketch per (event_type, day), union the days, estimate — the
        incremental-stats pattern where a 100 TB history keeps only
        per-partition sketch bytes and distinct counts stay queryable
        without rescanning raw data.

        Bounds-invariant oracle (same discipline as agg_approx_stats):
        both engines emit the exact count and a boolean asserting the
        merged estimate sits within 3x the documented rsd for
        lgConfigK=12 (1.04/sqrt(2^12) ~ 1.6%) — a guarantee, not a
        flake; a sketch out of bounds hash-mismatches."""
        ev = _t(spark, sf_dir, "events", rebalance=False)
        lg_k = 12
        eps = 3 * 1.04 / (2**lg_k) ** 0.5
        daily = ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(
            F.hll_sketch_agg("user_id", F.lit(lg_k)).alias("sk")
        )
        merged = daily.groupBy("event_type").agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users")
        )
        exact = ev.groupBy("event_type").agg(
            F.count_distinct("user_id").alias("exact_users")
        )
        return exact.join(merged, "event_type").select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                / F.col("exact_users")
                <= F.lit(eps)
            ).alias("within_bounds"),
        )

    @register(
        "udf_arrow_map",
        oracle="""
        SELECT vec_id,
               len(embedding) AS dim,
               round(sqrt(list_sum(list_transform(embedding,
                     x -> CAST(x AS DOUBLE) * x))), 6) AS l2_norm
        FROM embeddings
        """,
    )
    def q_arrow_map(spark: SparkSession, sf_dir: str) -> DataFrame:
        """mapInArrow kernel over raw Arrow buffers (see
        operators/udfs.py:embedding_norms_arrow)."""
        from build_datawarehouse_demo_spark.operators.udfs import (
            embedding_norms_arrow,
        )

        return embedding_norms_arrow(_t(spark, sf_dir, "embeddings"))

    # ------------------------------------------------------------------
    # scalar kits: higher-order array functions, date truncation
    # ------------------------------------------------------------------

    @register(
        "fn_array_kit",
        oracle="""
        SELECT vec_id,
               len(embedding) AS dim,
               len(list_filter(embedding, x -> x > 0)) AS n_pos,
               round(list_reduce(list_transform(embedding,
                     x -> CAST(x AS DOUBLE)), (a, b) -> a + b), 6) AS sum_all,
               round(CAST(list_max(embedding) AS DOUBLE), 6) AS max_val
        FROM embeddings
        """,
    )
    def q_array_kit(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Higher-order array functions (transform/filter/aggregate/
        array_max) — the expression-level surface the dedup/similarity
        operators build on, exercised directly. list_reduce in DuckDB
        folds left like F.aggregate, so the sums match bit-for-bit
        before the 6dp rounding."""
        emb = _t(spark, sf_dir, "embeddings", rebalance=False)
        return emb.select(
            "vec_id",
            F.size("embedding").alias("dim"),
            F.size(F.filter("embedding", lambda x: x > 0)).alias("n_pos"),
            F.round(
                F.aggregate(
                    F.transform("embedding", lambda x: x.cast("double")),
                    F.lit(0.0),
                    lambda a, b: a + b,
                ),
                6,
            ).alias("sum_all"),
            F.round(F.array_max("embedding").cast("double"), 6).alias("max_val"),
        )

    @register(
        "sql_window_navigation_kit",
        oracle="""
        SELECT s_suppkey,
               cume_dist() OVER w AS cdist,
               first_value(s_suppkey) OVER w AS first_k,
               last_value(s_suppkey) OVER (
                 ORDER BY s_acctbal DESC, s_suppkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
               ) AS last_k,
               nth_value(s_suppkey, 3) OVER w AS third_k
        FROM supplier
        WINDOW w AS (ORDER BY s_acctbal DESC, s_suppkey)
        """,
    )
    def q_window_nav(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Navigation-window completeness: cume_dist, first/last/nth
        value (last_value over the full frame — the default running
        frame is the classic footgun both engines share). Identical
        SQL text runs on Catalyst and DuckDB."""
        from build_datawarehouse_demo_spark.sources.readers import register_star_views

        register_star_views(spark, sf_dir)
        return spark.sql(
            """
            SELECT s_suppkey,
                   cume_dist() OVER w AS cdist,
                   first_value(s_suppkey) OVER w AS first_k,
                   last_value(s_suppkey) OVER (
                     ORDER BY s_acctbal DESC, s_suppkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
                   ) AS last_k,
                   nth_value(s_suppkey, 3) OVER w AS third_k
            FROM supplier
            WINDOW w AS (ORDER BY s_acctbal DESC, s_suppkey)
            """
        )

    @register(
        "agg_corr_regression",
        oracle="""
        SELECT l_returnflag,
               round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
               round(covar_samp(l_quantity, l_extendedprice), 6) AS covar_qp,
               round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
               round(regr_intercept(l_extendedprice, l_quantity), 6) AS intercept
        FROM lineitem GROUP BY l_returnflag
        """,
    )
    def q_corr_regr(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Bivariate statistics: correlation, sample covariance, and
        OLS slope/intercept per group — both engines use one-pass
        co-moment updates whose drift sits far below 6dp at this
        scale (parity probed before registration)."""
        li = _t(spark, sf_dir, "lineitem", rebalance=False)
        return li.groupBy("l_returnflag").agg(
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qp"),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 6).alias("covar_qp"),
            F.round(F.regr_slope("l_extendedprice", "l_quantity"), 6).alias("slope"),
            F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 6).alias(
                "intercept"
            ),
        )

    @register(
        "fn_date_trunc_kit",
        oracle="""
        SELECT event_id,
               date_trunc('hour', ts) AS ts_hour,
               date_trunc('day', ts) AS ts_day,
               date_trunc('week', ts) AS ts_week,
               date_trunc('month', ts) AS ts_month,
               date_trunc('quarter', ts) AS ts_quarter
        FROM events
        """,
    )
    def q_date_trunc(spark: SparkSession, sf_dir: str) -> DataFrame:
        """date_trunc across the grains a rollup hierarchy uses;
        identical semantics both engines (Monday weeks, calendar
        quarters), emitted as timestamps (never DATE — the known
        cross-engine pandas conversion trap)."""
        ev = _t(spark, sf_dir, "events", rebalance=False)
        return ev.select(
            "event_id",
            *[
                F.date_trunc(g, "ts").alias(f"ts_{g}")
                for g in ("hour", "day", "week", "month", "quarter")
            ],
        )

    # ------------------------------------------------------------------
    # set-similarity join with prefix filtering
    # ------------------------------------------------------------------

    @register(
        "join_fuzzy_jaccard_prefix",
        oracle=r"""
        WITH lt AS (
          SELECT doc_id AS l_id,
                 list_distinct(list_filter(regexp_split_to_array(trim(text), '\s+'),
                                           x -> x <> '')) AS ts
          FROM documents
        ),
        rt AS (
          SELECT doc_id AS r_id,
                 list_distinct(list_filter(regexp_split_to_array(trim(text), '\s+'),
                                           x -> x <> '')) AS ts
          FROM documents WHERE doc_id % 7 = 0
        ),
        pairs AS (
          SELECT l_id, r_id,
                 len(list_intersect(lt.ts, rt.ts)) AS n_inter,
                 len(lt.ts) AS nl, len(rt.ts) AS nr
          FROM lt, rt
          WHERE len(lt.ts) > 0 AND len(rt.ts) > 0
        )
        SELECT l_id, r_id, CAST(n_inter AS BIGINT) AS n_inter,
               CAST(n_inter AS DOUBLE) / (nl + nr - n_inter) AS jaccard
        FROM pairs
        WHERE CAST(n_inter AS DOUBLE) / (nl + nr - n_inter) >= 0.9
        """,
    )
    def q_fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Two-table token-set Jaccard join at t=0.9 via prefix
        filtering (operators/fuzzy_join.py): equi-joins on rare-first
        prefix tokens replace the cross product; the oracle computes
        the quadratic truth directly, so lossless-ness is what the
        hash-match proves."""
        from build_datawarehouse_demo_spark.operators.fuzzy_join import (
            fuzzy_jaccard_join,
        )

        docs = _t(spark, sf_dir, "documents")
        left = docs.select(F.col("doc_id").alias("l_id"), "text")
        right = docs.where(F.col("doc_id") % 7 == 0).select(
            F.col("doc_id").alias("r_id"), "text"
        )
        return fuzzy_jaccard_join(left, right, threshold=0.9)

    # ------------------------------------------------------------------
    # forward as-of join (next-reading lookup)
    # ------------------------------------------------------------------

    @register(
        "join_asof_forward",
        oracle="""
        WITH b AS (
          SELECT o_custkey, o_orderdate, max(o_orderkey) AS next_orderkey
          FROM orders GROUP BY o_custkey, o_orderdate
        )
        SELECT e.event_id, e.user_id, b.next_orderkey,
               b.o_orderdate AS asof_time
        FROM events e
        ASOF LEFT JOIN b ON e.user_id = b.o_custkey AND e.ts <= b.o_orderdate
        """,
    )
    def q_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Forward as-of join (operators/asof.py, direction=
        "forward"): each event annotated with the EARLIEST order at or
        after it — the next-reading/next-version lookup, checked
        against DuckDB's native forward ASOF JOIN. Same one-shuffle
        union+carry shape as the backward form, with first() looking
        down an unbounded-following frame instead of last() up a
        preceding one."""
        from build_datawarehouse_demo_spark.operators.asof import asof_join

        events = _t(spark, sf_dir, "events", rebalance=False).select(
            "event_id", F.col("user_id"), "ts"
        )
        orders = _t(spark, sf_dir, "orders", rebalance=False).select(
            F.col("o_custkey").alias("user_id"),
            "o_orderdate",
            F.col("o_orderkey").alias("next_orderkey"),
        )
        return asof_join(
            events,
            orders,
            key="user_id",
            probe_time="ts",
            build_time="o_orderdate",
            build_cols=("next_orderkey",),
            build_order=("next_orderkey",),
            direction="forward",
        ).select("event_id", "user_id", "next_orderkey", "asof_time")

    # ------------------------------------------------------------------
    # statistics family, windowed distinct, incremental-ingest dedup
    # ------------------------------------------------------------------

    @register(
        "sql_agg_stats_family",
        oracle="""
        SELECT l_returnflag,
               count(*) AS n,
               round(median(l_quantity), 6) AS med_qty,
               round(stddev_samp(l_quantity), 6) AS sd_qty,
               round(var_samp(l_quantity), 6) AS var_qty
        FROM lineitem GROUP BY l_returnflag
        """,
    )
    def q_stats_family(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Exact median + sample stddev/variance per group. Both
        engines compute incremental moments in doubles; at these
        magnitudes the cross-engine drift sits orders below the 6dp
        rounding (probed before registration)."""
        li = _t(spark, sf_dir, "lineitem", rebalance=False)
        return li.groupBy("l_returnflag").agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.median("l_quantity"), 6).alias("med_qty"),
            F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
            F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
        )

    @register(
        "sql_window_distinct_running",
        oracle="""
        SELECT o_custkey, o_orderkey,
               count(DISTINCT o_orderpriority) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ) AS n_priorities
        FROM orders
        """,
    )
    def q_window_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Running DISTINCT count over a window. Spark has no
        count(DISTINCT) OVER — size(collect_set() OVER) is the
        idiomatic equivalent (set state is per distinct value, fine
        for low-cardinality payloads like priorities; for high-card
        columns use the HLL sketch entry instead)."""
        from pyspark.sql import Window

        w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        return _t(spark, sf_dir, "orders", rebalance=False).select(
            "o_custkey",
            "o_orderkey",
            F.size(F.collect_set("o_orderpriority").over(w))
            .cast("bigint")
            .alias("n_priorities"),
        )

    @register(
        "dedup_incremental_new_docs",
        oracle="""
        WITH seen AS (
          SELECT DISTINCT md5(text) AS digest FROM documents
          WHERE doc_id % 3 <> 0
        ),
        batch AS (
          SELECT doc_id, md5(text) AS digest FROM documents
          WHERE doc_id % 3 = 0
        )
        SELECT b.doc_id, b.digest FROM batch b
        WHERE NOT EXISTS (SELECT 1 FROM seen s WHERE s.digest = b.digest)
        """,
    )
    def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Incremental-ingest dedup: a new batch keeps only docs whose
        content digest is unseen in the corpus — LEFT ANTI join on the
        16-byte digest, never the payload. The per-batch form of
        dedup_exact that a continuous pipeline actually runs (at
        100 TB the seen-set is a bucketed digest table; the anti join
        stays digest-only either way)."""
        docs = _t(spark, sf_dir, "documents", rebalance=False)
        seen = (
            docs.where(F.col("doc_id") % 3 != 0)
            .select(F.md5("text").alias("digest"))
            .distinct()
        )
        batch = docs.where(F.col("doc_id") % 3 == 0).select(
            "doc_id", F.md5("text").alias("digest")
        )
        return batch.join(seen, "digest", "left_anti").select("doc_id", "digest")

    # ------------------------------------------------------------------
    # CDC: collapse a change feed to current state
    # ------------------------------------------------------------------

    @register(
        "cdc_apply_changes",
        oracle="""
        WITH feed AS (
          SELECT o_custkey AS cust_id,
                 CASE WHEN o_orderkey % 5 = 0 THEN 'D' ELSE 'U' END AS op,
                 o_orderdate AS change_ts, o_orderkey AS seq,
                 o_totalprice AS price
          FROM orders
        ),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY cust_id
                     ORDER BY change_ts DESC, seq DESC) AS rn
          FROM feed
        )
        SELECT cust_id, change_ts, seq, price
        FROM ranked WHERE rn = 1 AND op <> 'D'
        """,
    )
    def q_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
        """CDC apply (operators/scd.py:apply_cdc_changes): a synthetic
        change feed derived from orders (every 5th change a tombstone),
        collapsed to last-change-wins current state."""
        from build_datawarehouse_demo_spark.operators.scd import apply_cdc_changes

        feed = _t(spark, sf_dir, "orders", rebalance=False).select(
            F.col("o_custkey").alias("cust_id"),
            F.when(F.col("o_orderkey") % 5 == 0, "D").otherwise("U").alias("op"),
            F.col("o_orderdate").alias("change_ts"),
            F.col("o_orderkey").alias("seq"),
            F.col("o_totalprice").alias("price"),
        )
        return apply_cdc_changes(
            feed, key_cols=["cust_id"], order_cols=["change_ts", "seq"]
        ).select("cust_id", "change_ts", "seq", "price")

    # ------------------------------------------------------------------
    # ML featurization: feature hashing (HashingTF shape)
    # ------------------------------------------------------------------

    @register(
        "ml_feature_hashing",
        oracle=r"""
        WITH tok AS (
          SELECT doc_id,
                 unnest(list_filter(regexp_split_to_array(trim(text), '\s+'),
                                    x -> x <> '')) AS tok
          FROM documents
        )
        SELECT doc_id,
               CAST(CAST(('0x' || substr(md5('0:' || tok), 1, 8)) AS BIGINT) % 64
                    AS BIGINT) AS bucket,
               count(*) AS n
        FROM tok GROUP BY 1, 2
        """,
    )
    def q_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Feature hashing (HashingTF): tokens -> md5-derived bucket in
        [0, 64) -> per-doc bucket counts. Scalarized (doc_id, bucket,
        n) rows instead of a packed vector so the result stays
        hashable by the driver; assembling the dense vector is a
        groupBy collect_list away. Engine-portable hash = the same
        featurization in any serving stack."""
        from build_datawarehouse_demo_spark.operators.dedup import hash32
        from build_datawarehouse_demo_spark.operators.text import tokens

        docs = _t(spark, sf_dir, "documents")
        return (
            docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
            .select("doc_id", (hash32(F.col("tok")) % 64).alias("bucket"))
            .groupBy("doc_id", "bucket")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    # ------------------------------------------------------------------
    # streaming: transformWithState running counts (batch twin)
    # ------------------------------------------------------------------

    @register(
        "streaming_transform_with_state",
        oracle="""
        SELECT user_id, event_type, count(*) AS n_events
        FROM events GROUP BY user_id, event_type
        """,
    )
    def q_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Batch twin of the transformWithState MapState counter
        (streaming/stateful.py:user_event_type_counts); stream ≡ batch
        asserted in tests/test_streaming.py."""
        from build_datawarehouse_demo_spark.streaming.stateful import (
            user_event_type_counts,
        )

        return user_event_type_counts(_t(spark, sf_dir, "events", rebalance=False))

    # ------------------------------------------------------------------
    # AQE skew-join: runtime hot-partition splitting
    # ------------------------------------------------------------------

    @register(
        "join_skew_aqe",
        oracle="""
        WITH fact AS (
          SELECT CASE WHEN l_orderkey % 10 < 8 THEN 1 ELSE l_orderkey END AS k,
                 l_quantity
          FROM lineitem
        ),
        dim AS (
          SELECT o_orderkey AS k FROM orders WHERE o_orderkey % 10 >= 8
          UNION ALL SELECT 1
        )
        SELECT (f.k = 1) AS hot,
               count(*) AS n_items,
               CAST(sum(CAST(f.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM fact f JOIN dim d ON d.k = f.k
        GROUP BY (f.k = 1)
        """,
    )
    def q_skew_aqe(spark: SparkSession, sf_dir: str) -> DataFrame:
        """AQE skew-join split: 80% of lineitem collapses onto one hot
        key, and Spark splits that reduce partition at RUNTIME from the
        real shuffle sizes (SortMergeJoin(skew=true), asserted in
        tests/test_skew_keys.py) — the engine-native complement to the
        manual salting ops (operators/skew.py). Thresholds are tuned
        down to fire at test scale inside a newSession clone; at real
        scale the defaults (256 MB / factor 5) do the same job.

        Pattern constraint worth knowing: the join children must reach
        the SMJ as PLAIN shuffle stages — an aggregate (e.g. distinct)
        between shuffle and join breaks AQE's skew pattern-match, so
        the dim side is built as filter+union instead (measured: the
        distinct form never splits).
        """
        s2 = spark.newSession()
        for key, val in {
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "2KB",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1KB",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.5",
        }.items():
            s2.conf.set(key, val)
        fact = _t(s2, sf_dir, "lineitem").select(
            F.when((F.col("l_orderkey") % 10) < 8, F.lit(1))
            .otherwise(F.col("l_orderkey"))
            .alias("k"),
            "l_quantity",
        )
        dim = (
            _t(s2, sf_dir, "orders", rebalance=False)
            .where((F.col("o_orderkey") % 10) >= 8)
            .select(F.col("o_orderkey").alias("k"))
            .union(s2.range(1, 2).select(F.col("id").alias("k")))
        )
        return (
            fact.join(dim, "k")
            .groupBy((F.col("k") == 1).alias("hot"))
            .agg(
                F.count(F.lit(1)).alias("n_items"),
                F.sum(F.col("l_quantity").cast("decimal(18,2)"))
                .cast("double")
                .alias("sum_qty"),
            )
        )

    # ------------------------------------------------------------------
    # custom Python Data Source (Spark 4 DataSource API)
    # ------------------------------------------------------------------

    @register(
        "src_python_datasource",
        oracle="""
        SELECT i AS id, CAST(i % 10 AS INTEGER) AS bucket,
               md5(CAST(i AS VARCHAR)) AS payload
        FROM generate_series(0, 999) AS t(i)
        WHERE i % 10 < 3
        """,
    )
    def q_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Partition-parallel custom Python source (sources/
        python_datasource.py) — rows are pure functions of id, so the
        oracle regenerates them; the filter runs Spark-side on the
        source output."""
        from build_datawarehouse_demo_spark.sources.python_datasource import (
            SyntheticDocsDataSource,
        )

        try:
            spark.dataSource.register(SyntheticDocsDataSource)
        except Exception as exc:
            # tolerate only the same-session re-register collision; a
            # missing DataSource API or a broken source class must
            # propagate here, not as an opaque .load() failure later
            if "already" not in str(exc).lower():
                raise
        return (
            spark.read.format("synthetic_docs")
            .option("rows", "1000")
            .option("partitions", "8")
            .load()
            .where(F.col("bucket") < 3)
        )

    # ------------------------------------------------------------------
    # scale layout: Z-order clustered write + 2-D box scan
    # ------------------------------------------------------------------

    @register(
        "sink_zorder_scan",
        oracle="""
        SELECT l_orderkey, l_partkey, l_quantity
        FROM lineitem
        WHERE l_orderkey <= 3000 AND l_partkey <= 400
        """,
    )
    def q_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Z-order layout (sources/writers.py:write_zordered): one
        Morton sort keeps files compact in BOTH l_orderkey and
        l_partkey, so the 2-D box filter skips most files via parquet
        min/max — what no single-column clustering can give both dims
        at once."""
        from build_datawarehouse_demo_spark.registry_parity import SCRATCH
        from build_datawarehouse_demo_spark.sources.writers import write_zordered

        path = f"{SCRATCH}/lineitem_zorder"
        li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey", "l_quantity")
        write_zordered(li, path, "l_orderkey", "l_partkey", n_files=16)
        return spark.read.parquet(path).where(
            (F.col("l_orderkey") <= 3000) & (F.col("l_partkey") <= 400)
        )

    # ------------------------------------------------------------------
    # multimodal: batched nearest-neighbor payload resize
    # ------------------------------------------------------------------

    @register(
        "multimodal_resize_nearest",
        oracle="""
        WITH src AS (
          SELECT doc_id, text, length(text) AS n
          FROM documents WHERE text IS NOT NULL AND length(text) > 0
        ),
        px AS (
          SELECT doc_id, n, j,
                 substr(text, CAST((j * n) // 64 AS INTEGER) + 1, 1) AS ch
          FROM src, unnest(generate_series(0, 63)) AS t(j)
        )
        SELECT doc_id AS id, CAST(n AS BIGINT) AS src_bytes, 64 AS dst_bytes,
               md5(string_agg(ch, '' ORDER BY j)) AS resized_md5
        FROM px GROUP BY doc_id, n
        """,
    )
    def q_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Batched binary resize (operators/multimodal.py:
        resize_payload_nearest) over the UTF-8 payload stand-in. The
        oracle resamples characters — the testdata text is ASCII so
        byte j == char j; real image bytes would be compared by digest
        against the same kernel run offline."""
        from build_datawarehouse_demo_spark.operators.multimodal import (
            attach_binary,
            resize_payload_nearest,
        )

        docs = _t(spark, sf_dir, "documents")
        return resize_payload_nearest(attach_binary(docs))

    # ------------------------------------------------------------------
    # deterministic fixed-size per-group sampling
    # ------------------------------------------------------------------

    @register(
        "sample_reservoir_per_group",
        oracle="""
        WITH h AS (
          SELECT doc_id, lang,
                 CAST(('0x' || substr(md5('0:reservoir:' || CAST(doc_id AS VARCHAR)), 1, 8))
                      AS BIGINT) AS hv
          FROM documents WHERE doc_id IS NOT NULL
        ),
        r AS (
          SELECT doc_id, lang,
                 row_number() OVER (PARTITION BY lang ORDER BY hv, doc_id) AS rn
          FROM h
        )
        SELECT doc_id, lang FROM r WHERE rn <= 5
        """,
    )
    def q_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Exactly-k-per-group deterministic sample (reservoir
        semantics as a hash-rank window — see operators/sampling.py)."""
        from build_datawarehouse_demo_spark.operators.sampling import (
            reservoir_sample_per_group,
        )

        docs = _t(spark, sf_dir, "documents", rebalance=False)
        return reservoir_sample_per_group(docs, "lang", "doc_id", k=5).select(
            "doc_id", "lang"
        )

    # ------------------------------------------------------------------
    # streaming: stream-stream LEFT OUTER interval join (batch twin)
    # ------------------------------------------------------------------

    @register(
        "streaming_interval_join_outer",
        oracle="""
        SELECT a.event_id, b.event_id AS prior_event_id
        FROM events a LEFT JOIN events b
          ON a.user_id = b.user_id AND b.ts < a.ts
         AND b.ts >= a.ts - INTERVAL 1 HOUR
        """,
    )
    def q_interval_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Batch form of the watermarked stream-stream LEFT OUTER
        interval join (streaming/joins.py): match-less events surface
        with NULL prior_event_id once the watermark proves no match
        can still arrive. Stream ≡ batch asserted in
        tests/test_streaming.py with watermark flush events."""
        from build_datawarehouse_demo_spark.streaming.joins import (
            prior_events_interval_join,
        )

        ev = _t(spark, sf_dir, "events")
        return prior_events_interval_join(ev, ev, how="left_outer")

    # ------------------------------------------------------------------
    # runtime row-level filtering (injected bloom filter)
    # ------------------------------------------------------------------

    @register(
        "join_bloom_runtime_filter",
        oracle="""
        SELECT o.o_orderpriority,
               count(*) AS n_items,
               CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderpriority = '1-URGENT'
        GROUP BY o.o_orderpriority
        """,
    )
    def q_bloom_join(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Shuffle join with an INJECTED runtime bloom filter: Spark
        builds a bloom filter from the selective (filtered) orders side
        and applies might_contain() on lineitem BEFORE its shuffle —
        at 100 TB this drops most fact rows pre-exchange, the same IO
        win dynamic partition pruning gives a partitioned layout, but
        for arbitrary (unpartitioned) join keys.

        Config scope: a ``newSession()`` clone shares the JVM/context
        but carries its own SQLConf, so the injection thresholds (tuned
        down to fire at test scale) and the broadcast opt-out never
        leak into the caller's session or the bench's other plans.
        tests/test_scale_layout.py asserts might_contain is really in
        this plan.
        """
        s2 = spark.newSession()
        s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        s2.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "64MB")
        # force the shuffle-join shape the filter exists for (a
        # broadcast build already reaches every executor; bloom
        # injection targets exchanges)
        s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li = _t(s2, sf_dir, "lineitem", rebalance=False)
        orders = _t(s2, sf_dir, "orders", rebalance=False).where(
            F.col("o_orderpriority") == "1-URGENT"
        )
        return (
            li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n_items"),
                F.sum(F.col("l_quantity").cast("decimal(18,2)"))
                .cast("double")
                .alias("sum_qty"),
            )
        )
