"""Training-data-pipeline extension operators (BASELINE.json north
star): dedup, similarity search, text analysis, multimodal plumbing,
streaming-equivalent windows.

Every op is oracle-checked: hashes are md5-derived so DuckDB reproduces
them bit-for-bit (operators/dedup.py:hash32), cosine scores are rounded
to 6dp after exact double math, ratios are exact integer divisions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from build_datawarehouse_demo_spark.registry import register
from build_datawarehouse_demo_spark.sources.readers import read_parquet

# shared DuckDB CTE fragments (tokenization identical to
# operators/text.py:tokens — trim, split on \s+, drop empties)
_TOK = r"list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '')"
_HASH32 = "CAST(('0x' || substr(md5({expr}), 1, 8)) AS BIGINT)"


def _t(
    spark: SparkSession, sf_dir: str, name: str, rebalance: bool = True
) -> DataFrame:
    # rebalance=True for compute-amplifying ops (explode/hash/cosine
    # per row), where a single-row-group source would pin the whole
    # computation to one task (measured: quality_score 4s -> 0.9s).
    # Per-op opt-OUT (VERDICT.md round 2 item 5): ops whose inputs feed
    # broadcast builds or a single narrow pass (scd2, sampling,
    # percentile) would pay a full shuffle that the plan immediately
    # collapses into a BroadcastExchange — gratuitous IO at 100 TB.
    return read_parquet(spark, f"{sf_dir}/{name}.parquet", rebalance=rebalance)


_BUCKETED_SCRATCH: str | None = None


def _bucketed_scratch_dir() -> str:
    # per-PROCESS scratch (lazy mkdtemp): a fixed shared path would let
    # two concurrent sessions overwrite each other's bucket files
    # mid-join; per-call mkdtemp would leak a table-sized dir on every
    # bench iteration. One dir per process, overwritten in place.
    global _BUCKETED_SCRATCH
    if _BUCKETED_SCRATCH is None:
        import tempfile

        _BUCKETED_SCRATCH = tempfile.mkdtemp(prefix="spark_graft_bucketed_")
    return _BUCKETED_SCRATCH


def _ensure_bucketed_join_tables(spark, sf_dir: str, force: bool = False) -> None:
    """Write the bucketed+sorted fact tables once per (session, sf_dir).

    The write-once half of the bucketed-join amortization story: the
    shuffle is paid at ingest (join_bucketed_build, always-write) and
    every later join is exchange-free (join_bucketed_shuffle_free,
    which skips the write when this session already built the same
    sf_dir). A different sf_dir invalidates and rebuilds — the memo is
    a single slot, mirroring register_star_views."""
    from build_datawarehouse_demo_spark.sources.writers import save_table

    if not force and getattr(spark, "_graft_bj_key", None) == sf_dir:
        return
    base = _bucketed_scratch_dir()
    li = _t(spark, sf_dir, "lineitem", rebalance=False).select(
        "l_orderkey", "l_linenumber"
    )
    orders = _t(spark, sf_dir, "orders", rebalance=False).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    save_table(li, "bj_lineitem", bucket_by=(8, ("l_orderkey",)), path=f"{base}/li")
    save_table(orders, "bj_orders", bucket_by=(8, ("o_orderkey",)), path=f"{base}/o")
    spark._graft_bj_key = sf_dir


def _ensure_dpp_events(spark, sf_dir: str) -> None:
    """Write events partitioned by event_date once per (session,
    sf_dir) — the layout half of the dynamic-partition-pruning story
    (join_partitioned_dpp), same single-slot memo contract as
    _ensure_bucketed_join_tables."""
    from build_datawarehouse_demo_spark.sources.writers import save_table

    if getattr(spark, "_graft_dpp_key", None) == sf_dir:
        return
    ev = _t(spark, sf_dir, "events", rebalance=False).withColumn(
        "event_date", F.to_date("ts")
    )
    save_table(
        ev,
        "dpp_events",
        partition_by=("event_date",),
        path=f"{_bucketed_scratch_dir()}/dpp_events",
    )
    spark._graft_dpp_key = sf_dir


def _ensure_ann_index(spark, sf_dir: str, force: bool = False):
    """Write the RP-signature ANN index once per (session, sf_dir) —
    same single-slot memo contract as _ensure_bucketed_join_tables:
    sim_index_build always writes (it times the ingest), the search
    entry reuses a current build."""
    from build_datawarehouse_demo_spark.operators.similarity import (
        build_rp_signature_index,
    )

    if not force and getattr(spark, "_graft_ann_idx_key", None) == sf_dir:
        return spark.table("ann_sig_index")
    idx = build_rp_signature_index(
        _t(spark, sf_dir, "embeddings"),
        "ann_sig_index",
        path=f"{_bucketed_scratch_dir()}/ann_idx",
    )
    spark._graft_ann_idx_key = sf_dir
    return idx


def register_extensions() -> None:
    # ------------------------------------------------------------------
    # deduplication
    # ------------------------------------------------------------------

    @register(
        "dedup_exact",
        oracle="""
        SELECT md5(text) AS digest, min(doc_id) AS keep_id, count(*) AS n_copies
        FROM documents GROUP BY md5(text)
        """,
    )
    def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
        from build_datawarehouse_demo_spark.operators.dedup import exact_dedup

        return exact_dedup(_t(spark, sf_dir, "documents"))

    @register(
        "dedup_minhash_lsh",
        oracle=f"""
        WITH tok AS (
          SELECT doc_id, {_TOK} AS w FROM documents
        ),
        sh AS (
          SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
          FROM tok, unnest(generate_series(1, len(w) - 2)) AS t(i)
          WHERE len(w) >= 3
        ),
        mh AS (
          SELECT doc_id, h,
                 min({_HASH32.format(expr="h || ':' || shingle")}) AS mhv
          FROM sh, unnest(generate_series(0, 15)) AS g(h)
          GROUP BY doc_id, h
        ),
        bands AS (
          SELECT doc_id, h // 4 AS band,
                 string_agg(CAST(mhv AS VARCHAR), '_' ORDER BY h) AS band_key
          FROM mh GROUP BY doc_id, h // 4
        ),
        cand AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM bands a
          JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
                      AND a.doc_id < b.doc_id
        ),
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        inter AS (
          SELECT c.id_a, c.id_b, count(*) AS n_inter
          FROM cand c
          JOIN sh sa ON sa.doc_id = c.id_a
          JOIN sh sb ON sb.doc_id = c.id_b AND sb.shingle = sa.shingle
          GROUP BY c.id_a, c.id_b
        )
        SELECT i.id_a, i.id_b,
               CAST(i.n_inter AS DOUBLE) / (na.n + nb.n - i.n_inter) AS jaccard
        FROM inter i
        JOIN sizes na ON na.doc_id = i.id_a
        JOIN sizes nb ON nb.doc_id = i.id_b
        WHERE CAST(i.n_inter AS DOUBLE) / (na.n + nb.n - i.n_inter) >= 0.8
        """,
    )
    def q_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
        from build_datawarehouse_demo_spark.operators.dedup import minhash_dedup_pairs

        return minhash_dedup_pairs(
            _t(spark, sf_dir, "documents"), k=3, num_hashes=16, bands=4, threshold=0.8
        )

    @register(
        "dedup_simhash",
        oracle=f"""
        WITH tok AS (
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
        )
        SELECT doc_id,
               CAST(sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS simhash
        FROM votes GROUP BY doc_id
        """,
    )
    def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
        from build_datawarehouse_demo_spark.operators.dedup import simhash

        return simhash(_t(spark, sf_dir, "documents"))

    # simhash signature + pigeonhole-blocked pair CTEs, shared by the
    # pair entry and the connected-components clustering entry.
    _simhash_pair_ctes = f"""
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
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                 CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
          FROM blocked a
          JOIN blocked b ON a.blk = b.blk AND a.blk_val = b.blk_val AND a.doc_id < b.doc_id
          WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
        )"""

    @register(
        "dedup_simhash_pairs",
        oracle=f"""
        WITH {_simhash_pair_ctes}
        SELECT id_a, id_b, hamming FROM pairs
        """,
    )
    def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
        from build_datawarehouse_demo_spark.operators.dedup import simhash, simhash_near_pairs

        sigs = simhash(_t(spark, sf_dir, "documents"))
        return simhash_near_pairs(sigs, max_hamming=3, blocks=4)

    @register(
        "dedup_cluster_components",
        oracle=f"""
        WITH RECURSIVE {_simhash_pair_ctes},
        edges AS MATERIALIZED (
          SELECT id_a AS s, id_b AS d FROM pairs
          UNION SELECT id_b, id_a FROM pairs
        ),
        reach(s, d) AS (
          SELECT s, d FROM edges
          UNION SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s
        ),
        comp AS (SELECT s AS node, least(s, min(d)) AS component FROM reach GROUP BY s)
        SELECT doc.doc_id,
               COALESCE(c.component, doc.doc_id) AS component_id,
               COALESCE(c.component, doc.doc_id) = doc.doc_id AS is_kept
        FROM documents doc LEFT JOIN comp c ON c.node = doc.doc_id
        """,
    )
    def q_dedup_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
        # pair graph -> connected components -> one kept representative
        # per near-dup cluster. Large-star/small-star contraction
        # (VERDICT round 2 item 8: O(log n) rounds vs min-label
        # propagation's graph-diameter rounds — measured 4 vs 8 rounds
        # and 2.9s vs 5.9s on this very pair graph at sf0.01, and a
        # 1000-node chain converges in 8 star rounds where propagation
        # exhausts 50; both variants tested equivalent in
        # tests/test_dedup.py). The oracle states the same labeling as
        # a recursive transitive closure. The step pairwise dedup
        # logic cannot do correctly: (a,b),(b,c) must keep exactly one
        # of {a,b,c}.
        from build_datawarehouse_demo_spark.operators.dedup import (
            connected_components_star,
            dedup_keep_representatives,
            simhash,
            simhash_near_pairs,
        )

        docs = _t(spark, sf_dir, "documents")
        pairs = simhash_near_pairs(simhash(docs), max_hamming=3, blocks=4)
        comp = connected_components_star(pairs)
        return dedup_keep_representatives(docs, comp).select(
            "doc_id", "component_id", "is_kept"
        )

    @register(
        "dedup_ngram_jaccard",
        oracle=f"""
        WITH tok AS (
          SELECT DISTINCT doc_id, lang, source, tok
          FROM documents, unnest({_TOK}) AS t(tok)
        ),
        sizes AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
          FROM tok a
          JOIN tok b ON a.lang = b.lang AND a.source = b.source AND a.tok = b.tok
                    AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT i.id_a, i.id_b,
               CAST(i.n_inter AS DOUBLE) / (na.n + nb.n - i.n_inter) AS jaccard
        FROM inter i
        JOIN sizes na ON na.doc_id = i.id_a
        JOIN sizes nb ON nb.doc_id = i.id_b
        WHERE CAST(i.n_inter AS DOUBLE) / (na.n + nb.n - i.n_inter) >= 0.9
        """,
    )
    def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
        from build_datawarehouse_demo_spark.operators.dedup import ngram_jaccard_pairs

        return ngram_jaccard_pairs(
            _t(spark, sf_dir, "documents"), block_cols=("lang", "source"), threshold=0.9
        )

    # banded RP-LSH near-dup: the oracle replicates the EXACT bucketing
    # (same md5-derived planes, same band slicing, same bit weights), so
    # Spark and DuckDB agree bit-for-bit on the approximate result —
    # candidate recall is a documented property of the operator, not
    # drift (operators/similarity.py:embedding_near_dup_pairs_bucketed;
    # recall vs the exact all-pairs verifier is asserted in
    # tests/test_similarity.py).
    from build_datawarehouse_demo_spark.operators.similarity import rp_planes as _rp_planes

    _ND_BANDS, _ND_R, _ND_DIM = 8, 8, 64
    _nd_planes = _rp_planes(_ND_BANDS * _ND_R, _ND_DIM)

    def _band_sig_sql(b: int) -> str:
        terms = " + ".join(
            f"(CASE WHEN list_dot_product(v, [{', '.join(str(x) for x in plane)}]) >= 0 "
            f"THEN {1 << i} ELSE 0 END)"
            for i, plane in enumerate(_nd_planes[b * _ND_R : (b + 1) * _ND_R])
        )
        return f"CAST({terms} AS INTEGER)"

    _nd_sigs_sql = ", ".join(_band_sig_sql(b) for b in range(_ND_BANDS))

    @register(
        "dedup_embedding_cosine",
        oracle=f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        sig AS (SELECT vec_id, v, [{_nd_sigs_sql}] AS sigs FROM e),
        bands AS (
          SELECT vec_id, i AS band, sigs[i + 1] AS sig
          FROM sig, unnest(generate_series(0, {_ND_BANDS - 1})) AS g(i)
        ),
        cand AS (
          SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
          FROM bands a
          JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.vec_id < b.vec_id
        )
        SELECT c.id_a, c.id_b,
               round((CASE WHEN list_dot_product(ea.v,ea.v) > 0 AND list_dot_product(eb.v,eb.v) > 0 THEN list_cosine_similarity(ea.v, eb.v) END), 6) AS cosine
        FROM cand c
        JOIN e ea ON ea.vec_id = c.id_a
        JOIN e eb ON eb.vec_id = c.id_b
        WHERE (CASE WHEN list_dot_product(ea.v,ea.v) > 0 AND list_dot_product(eb.v,eb.v) > 0 THEN list_cosine_similarity(ea.v, eb.v) END) >= 0.4
        """,
    )
    def q_embed_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
        """SMALL-CORPUS-ONLY (kept for oracle continuity, demoted from
        the bench HEADLINE in round 7): this entry pins a FIXED 8x8
        LSH signature, and fixed parameters are a measured
        scale-killer — once n >> 2^r * bucket_size every bucket
        saturates and candidates grow ~n^2 (measured exponent 2.09 at
        sf1→sf4, 227.8s at sf4; BENCH_SCALE_r06_sf1_sf4.json). Use
        `dedup_embedding_cosine_auto` (bands=None, rows_per_band=None →
        lsh_auto_params corpus-sized signatures, measured exponent
        ~0.9) for anything beyond a few thousand vectors."""
        from build_datawarehouse_demo_spark.operators.similarity import (
            embedding_near_dup_pairs_bucketed,
        )

        return embedding_near_dup_pairs_bucketed(
            _t(spark, sf_dir, "embeddings"),
            threshold=0.4,
            bands=_ND_BANDS,
            rows_per_band=_ND_R,
            dim=_ND_DIM,
        )

    # ------------------------------------------------------------------
    # similarity search
    # ------------------------------------------------------------------

    @register(
        "sim_cosine_topk",
        oracle="""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        p AS (SELECT vec_id AS probe_id, v AS pv FROM e WHERE vec_id < 10),
        scored AS (
          SELECT p.probe_id, e.vec_id, (CASE WHEN list_dot_product(p.pv,p.pv) > 0 AND list_dot_product(e.v,e.v) > 0 THEN list_cosine_similarity(p.pv, e.v) END) AS c
          FROM e, p WHERE e.vec_id <> p.probe_id
        ),
        ranked AS (
          SELECT probe_id, vec_id, c,
                 CAST(row_number() OVER (PARTITION BY probe_id ORDER BY c DESC, vec_id) AS INTEGER) AS rank
          FROM scored
        )
        SELECT probe_id, vec_id, round(c, 6) AS cosine, rank
        FROM ranked WHERE rank <= 5
        """,
    )
    def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
        from build_datawarehouse_demo_spark.operators.similarity import brute_force_topk

        emb = _t(spark, sf_dir, "embeddings")
        probes = emb.filter(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("probe_id"), "embedding"
        )
        return brute_force_topk(emb, probes, k=5)

    @register(
        "sim_ivf_topk",
        oracle="""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        cent AS (SELECT vec_id AS centroid_id, v AS cv FROM e WHERE vec_id < 8),
        assign_all AS (
          SELECT vec_id, centroid_id, v FROM (
            SELECT e.vec_id, c.centroid_id, e.v,
                   row_number() OVER (PARTITION BY e.vec_id
                       ORDER BY (CASE WHEN list_dot_product(e.v,e.v) > 0 AND list_dot_product(c.cv,c.cv) > 0 THEN list_cosine_similarity(e.v, c.cv) END) DESC, c.centroid_id) AS rn
            FROM e, cent c
          ) WHERE rn = 1
        ),
        probes AS (
          SELECT vec_id AS probe_id, centroid_id, v AS pv
          FROM assign_all WHERE vec_id < 10
        ),
        scored AS (
          SELECT p.probe_id, a.vec_id, (CASE WHEN list_dot_product(p.pv,p.pv) > 0 AND list_dot_product(a.v,a.v) > 0 THEN list_cosine_similarity(p.pv, a.v) END) AS c
          FROM assign_all a JOIN probes p ON a.centroid_id = p.centroid_id
          WHERE a.vec_id <> p.probe_id
        ),
        ranked AS (
          SELECT probe_id, vec_id, c,
                 CAST(row_number() OVER (PARTITION BY probe_id ORDER BY c DESC, vec_id) AS INTEGER) AS rank
          FROM scored
        )
        SELECT probe_id, vec_id, round(c, 6) AS cosine, rank
        FROM ranked WHERE rank <= 5
        """,
    )
    def q_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
        from build_datawarehouse_demo_spark.operators.similarity import ivf_topk

        emb = _t(spark, sf_dir, "embeddings")
        centroids = emb.filter(F.col("vec_id") < 8).select(
            F.col("vec_id").alias("centroid_id"), "embedding"
        )
        probes = emb.filter(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("probe_id"), "embedding"
        )
        return ivf_topk(emb, centroids, probes, k=5)

    from build_datawarehouse_demo_spark.operators.similarity import rp_planes

    _planes = rp_planes(8, 64)
    _plane_sql = " + ".join(
        f"(CASE WHEN list_dot_product(v, [{', '.join(str(x) for x in plane)}]) >= 0 "
        f"THEN {1 << i} ELSE 0 END)"
        for i, plane in enumerate(_planes)
    )

    @register(
        "sim_ann_rp_lsh",
        oracle=f"""
        WITH e AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        sig AS (
          SELECT vec_id, v, CAST({_plane_sql} AS INTEGER) AS s FROM e
        ),
        p AS (SELECT vec_id AS probe_id, v AS pv, s FROM sig WHERE vec_id < 10),
        scored AS (
          SELECT p.probe_id, c.vec_id, (CASE WHEN list_dot_product(p.pv,p.pv) > 0 AND list_dot_product(c.v,c.v) > 0 THEN list_cosine_similarity(p.pv, c.v) END) AS cos
          FROM sig c JOIN p ON c.s = p.s AND c.vec_id <> p.probe_id
        ),
        ranked AS (
          SELECT probe_id, vec_id, cos,
                 CAST(row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, vec_id) AS INTEGER) AS rank
          FROM scored
        )
        SELECT probe_id, vec_id, round(cos, 6) AS cosine, rank
        FROM ranked WHERE rank <= 5
        """,
    )
    def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
        # sign-random-projection LSH buckets (md5-derived ±1 planes,
        # ordered folds so the signature is engine-bit-stable); only
        # same-bucket vectors are scored.
        from build_datawarehouse_demo_spark.operators.similarity import ann_rp_lsh_topk

        emb = _t(spark, sf_dir, "embeddings")
        probes = emb.filter(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("probe_id"), "embedding"
        )
        return ann_rp_lsh_topk(emb, probes, k=5, n_planes=8, dim=64)

    @register(
        "sim_index_build",
        oracle=f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
        SELECT vec_id, CAST({_plane_sql} AS INTEGER) AS sig FROM e
        """,
    )
    def q_index_build(spark: SparkSession, sf_dir: str) -> DataFrame:
        # write-once ANN index: corpus signatures computed at INGEST
        # and persisted bucketed-by-sig; every later query computes
        # only its own signature (sim_index_search). The amortization
        # pattern that makes LSH viable at 100 TB — same planes and
        # folds as sim_ann_rp_lsh, so the oracle replicates them. The
        # (vec_id, sig) projection is returned (the stored vec column
        # is an array, which hash checkers cannot canonicalize).
        # Always-write (force=True): this entry IS the ingest cost.
        idx = _ensure_ann_index(spark, sf_dir, force=True)
        return idx.select("vec_id", "sig")

    @register(
        "sim_index_search",
        oracle=f"""
        WITH e AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        sig AS (
          SELECT vec_id, v, CAST({_plane_sql} AS INTEGER) AS s FROM e
        ),
        p AS (SELECT vec_id AS probe_id, v AS pv, s FROM sig WHERE vec_id < 10),
        scored AS (
          SELECT p.probe_id, c.vec_id, (CASE WHEN list_dot_product(p.pv,p.pv) > 0 AND list_dot_product(c.v,c.v) > 0 THEN list_cosine_similarity(p.pv, c.v) END) AS cos
          FROM sig c JOIN p ON c.s = p.s AND c.vec_id <> p.probe_id
        ),
        ranked AS (
          SELECT probe_id, vec_id, cos,
                 CAST(row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, vec_id) AS INTEGER) AS rank
          FROM scored
        )
        SELECT probe_id, vec_id, round(cos, 6) AS cosine, rank
        FROM ranked WHERE rank <= 5
        """,
    )
    def q_index_search(spark: SparkSession, sf_dir: str) -> DataFrame:
        # search against the persisted index (reusing a same-session
        # build when one exists, else building — self-contained either
        # way): probe-side signature only, corpus side is a plain
        # bucketed-table scan. Result-identical to sim_ann_rp_lsh —
        # same oracle text.
        from build_datawarehouse_demo_spark.operators.similarity import (
            ann_index_search_topk,
        )

        idx = _ensure_ann_index(spark, sf_dir)
        probes = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("probe_id"), "embedding"
        )
        return ann_index_search_topk(idx, probes, k=5, n_planes=8, dim=64)

    @register(
        "ml_kmeans_lloyd_step",
        oracle="""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        cent AS (SELECT vec_id AS centroid_id, v AS cv FROM e WHERE vec_id < 8),
        assigned AS (
          SELECT vec_id, centroid_id, v FROM (
            SELECT e.vec_id, c.centroid_id, e.v,
                   row_number() OVER (PARTITION BY e.vec_id
                       ORDER BY (CASE WHEN list_dot_product(e.v,e.v) > 0 AND list_dot_product(c.cv,c.cv) > 0 THEN list_cosine_similarity(e.v, c.cv) END) DESC, c.centroid_id) AS rn
            FROM e, cent c
          ) WHERE rn = 1
        )
        SELECT centroid_id, CAST(i - 1 AS INTEGER) AS dim,
               round(avg(v[i]), 6) AS m
        FROM assigned, unnest(generate_series(1, 64)) AS g(i)
        GROUP BY 1, 2
        """,
    )
    def q_kmeans_step(spark: SparkSession, sf_dir: str) -> DataFrame:
        # one Lloyd iteration — the iterative-ML primitive behind IVF
        # index builds; assignment reuses ivf_assign, means shuffle
        # (cluster, dim) partials, never vectors. Scalarized output
        # (centroid_id, dim, m): the driver canonicalizer cannot hash
        # array cells (VERDICT.md round 2 item 1); kmeans_train keeps
        # the packed-vector form.
        from build_datawarehouse_demo_spark.operators.similarity import kmeans_lloyd_step

        emb = _t(spark, sf_dir, "embeddings")
        centroids = emb.filter(F.col("vec_id") < 8).select(
            F.col("vec_id").alias("centroid_id"), "embedding"
        )
        return kmeans_lloyd_step(emb, centroids, as_dims=True)

    @register(
        "streaming_interval_join",
        oracle="""
        SELECT a.event_id, b.event_id AS prior_event_id
        FROM events a JOIN events b
          ON a.user_id = b.user_id AND b.ts < a.ts
         AND b.ts >= a.ts - INTERVAL 1 HOUR
        """,
    )
    def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
        # batch form of the stream-stream interval join (streaming/
        # joins.py): same condition runs under two readStreams with
        # watermarks, asserted equivalent in tests/test_streaming.py.
        from build_datawarehouse_demo_spark.streaming.joins import prior_events_interval_join

        ev = _t(spark, sf_dir, "events")
        return prior_events_interval_join(ev, ev)

    @register(
        "sim_ann_rp_lsh_multiprobe",
        oracle=f"""
        WITH e AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        sig AS (
          SELECT vec_id, v, CAST({_plane_sql} AS INTEGER) AS s FROM e
        ),
        p AS (SELECT vec_id AS probe_id, v AS pv, s FROM sig WHERE vec_id < 10),
        variants AS (
          SELECT probe_id, pv, s FROM p
          UNION ALL
          SELECT probe_id, pv, CAST(xor(s, 1 << i) AS INTEGER) FROM p,
                 unnest(generate_series(0, 7)) AS g(i)
        ),
        cand AS (
          SELECT DISTINCT v.probe_id, c.vec_id
          FROM sig c JOIN variants v ON c.s = v.s AND c.vec_id <> v.probe_id
        ),
        scored AS (
          SELECT cd.probe_id, cd.vec_id,
                 (CASE WHEN list_dot_product(pe.v,pe.v) > 0 AND list_dot_product(ce.v,ce.v) > 0 THEN list_cosine_similarity(pe.v, ce.v) END) AS cos
          FROM cand cd
          JOIN e pe ON pe.vec_id = cd.probe_id
          JOIN e ce ON ce.vec_id = cd.vec_id
        ),
        ranked AS (
          SELECT probe_id, vec_id, cos,
                 CAST(row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, vec_id) AS INTEGER) AS rank
          FROM scored
        )
        SELECT probe_id, vec_id, round(cos, 6) AS cosine, rank
        FROM ranked WHERE rank <= 5
        """,
    )
    def q_ann_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
        # Hamming-1 multi-probing: recovers neighbors that sit one
        # hyperplane away — probe side fans out ×9, corpus untouched.
        from build_datawarehouse_demo_spark.operators.similarity import ann_rp_lsh_topk

        emb = _t(spark, sf_dir, "embeddings")
        probes = emb.filter(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("probe_id"), "embedding"
        )
        return ann_rp_lsh_topk(emb, probes, k=5, n_planes=8, dim=64, multiprobe=True)

    @register(
        "multimodal_frame_sample",
        oracle="""
        SELECT doc_id AS id,
               CAST(g.k AS INTEGER) AS frame_idx,
               CAST(g.k * 32 AS INTEGER) AS frame_off,
               md5(substr(text, g.k * 32 + 1, 16)) AS frame_md5
        FROM documents,
             unnest(generate_series(0, (octet_length(encode(text)) - 16) // 32)) AS g(k)
        WHERE octet_length(encode(text)) >= 16
        """,
    )
    def q_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
        # frame sampling over binary payloads via mapInPandas (ASCII
        # text payloads make substr == byte slice, so SQL can mirror).
        from build_datawarehouse_demo_spark.operators.multimodal import (
            attach_binary,
            sample_frames,
        )

        return sample_frames(attach_binary(_t(spark, sf_dir, "documents")))

    # ------------------------------------------------------------------
    # text analysis
    # ------------------------------------------------------------------

    @register(
        "text_token_count",
        oracle=rf"""
        SELECT doc_id,
               CAST(len({_TOK}) AS BIGINT) AS n_ws_tokens,
               CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT) AS n_re_tokens
        FROM documents
        """,
    )
    def q_tok_count(spark: SparkSession, sf_dir: str) -> DataFrame:
        from build_datawarehouse_demo_spark.operators.text import token_count

        return token_count(_t(spark, sf_dir, "documents")).select(
            "doc_id", "n_ws_tokens", "n_re_tokens"
        )

    @register(
        "text_quality_score",
        oracle=rf"""
        WITH base AS (
          SELECT doc_id,
                 CAST(len({_TOK}) AS DOUBLE) AS n_tok,
                 CAST(length(text) AS DOUBLE) AS n_chars,
                 CAST(len(list_filter({_TOK},
                      x -> lower(x) IN ('the','a','and','of','to','is'))) AS DOUBLE) AS n_stop,
                 CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\s]')) AS DOUBLE) AS n_punct
          FROM documents
        ),
        derived AS (
          SELECT doc_id, n_tok,
                 CASE WHEN n_tok > 0 THEN (n_chars - (n_tok - 1)) / n_tok ELSE 0.0 END AS avg_token_len,
                 CASE WHEN n_tok > 0 THEN n_stop / n_tok ELSE 0.0 END AS stopword_ratio,
                 CASE WHEN n_chars > 0 THEN n_punct / n_chars ELSE 0.0 END AS punct_ratio
          FROM base
        )
        SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tokens, avg_token_len, stopword_ratio, punct_ratio,
               least(1.0, greatest(0.0,
                 0.4 * (CASE WHEN avg_token_len >= 3 AND avg_token_len <= 8 THEN 1.0 ELSE 0.0 END)
                 + 0.4 * stopword_ratio * 4
                 + 0.2 * (1 - punct_ratio))) AS quality
        FROM derived
        """,
    )
    def q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
        from build_datawarehouse_demo_spark.operators.text import quality_score

        return quality_score(_t(spark, sf_dir, "documents")).select(
            "doc_id", "n_tokens", "avg_token_len", "stopword_ratio", "punct_ratio", "quality"
        )

    @register(
        "text_lang_id",
        oracle=f"""
        WITH toks AS (SELECT doc_id, {_TOK} AS w FROM documents),
        hits AS (
          SELECT doc_id, 'de' AS lang, len(list_filter(w, x -> lower(x) IN ('der','die','das','und','ist','nicht'))) AS h FROM toks
          UNION ALL
          SELECT doc_id, 'en', len(list_filter(w, x -> lower(x) IN ('the','a','and','of','to','is'))) FROM toks
          UNION ALL
          SELECT doc_id, 'es', len(list_filter(w, x -> lower(x) IN ('el','la','y','es','los','que'))) FROM toks
          UNION ALL
          SELECT doc_id, 'fr', len(list_filter(w, x -> lower(x) IN ('le','la','et','est','les','des'))) FROM toks
          UNION ALL
          SELECT doc_id, 'zh', len(list_filter(w, x -> lower(x) IN ('de5','shi4','le5','zai4','he2','you3'))) FROM toks
        )
        SELECT doc_id,
               CASE WHEN h = 0 THEN 'und' ELSE lang END AS pred_lang,
               CAST(h AS BIGINT) AS marker_hits
        FROM hits
        QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY h DESC, lang) = 1
        """,
    )
    def q_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
        from build_datawarehouse_demo_spark.operators.text import lang_id

        return lang_id(_t(spark, sf_dir, "documents")).select("doc_id", "pred_lang", "marker_hits")

    @register(
        "text_clean_normalize",
        oracle=r"""
        SELECT doc_id,
               lower(trim(regexp_replace(
                 regexp_replace(text, '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g'),
                 '\s+', ' ', 'g'))) AS cleaned
        FROM documents
        """,
    )
    def q_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
        # control-strip + whitespace-collapse + trim + lowercase — the
        # standard pre-tokenization cleanup, identical regex subset in
        # both engines.
        from build_datawarehouse_demo_spark.operators.text import clean_normalize

        return clean_normalize(_t(spark, sf_dir, "documents")).select("doc_id", "cleaned")

    @register(
        "text_vocabulary",
        oracle=f"""
        WITH toks AS (
          SELECT doc_id, lower(tok) AS tok
          FROM documents, unnest({_TOK}) AS t(tok)
        ),
        counts AS (
          SELECT tok, count(*) AS n_occurrences, count(DISTINCT doc_id) AS n_docs
          FROM toks GROUP BY tok
        )
        SELECT tok AS token, n_occurrences, n_docs,
               CAST(row_number() OVER (ORDER BY n_occurrences DESC, tok) AS INTEGER) AS rank
        FROM counts
        QUALIFY rank <= 100
        """,
    )
    def q_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
        # top-N vocabulary with doc frequency: partial-agg token counts,
        # TakeOrdered top-N (no global window over the full vocab).
        from build_datawarehouse_demo_spark.operators.text import vocabulary

        return vocabulary(_t(spark, sf_dir, "documents"), top_n=100)

    @register(
        "text_fingerprint",
        oracle=f"""
        SELECT doc_id,
               md5(array_to_string(list_sort(list_distinct({_TOK})), chr(1))) AS fingerprint
        FROM documents
        """,
    )
    def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
        from build_datawarehouse_demo_spark.operators.text import fingerprint

        return fingerprint(_t(spark, sf_dir, "documents")).select("doc_id", "fingerprint")

    @register(
        "text_repetition_score",
        oracle=f"""
        WITH tok AS (SELECT doc_id, {_TOK} AS w FROM documents),
        g AS (
          SELECT doc_id,
                 [w[i] || ' ' || w[i + 1] FOR i IN generate_series(1, len(w) - 1)] AS grams
          FROM tok
        )
        SELECT doc_id,
               CAST(len(grams) AS BIGINT) AS n_ngrams,
               CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct_ngrams,
               CASE WHEN len(grams) > 0
                    THEN CAST(len(grams) - len(list_distinct(grams)) AS DOUBLE) / len(grams)
                    ELSE 0.0 END AS dup_ngram_ratio
        FROM g
        """,
    )
    def q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
        # Gopher-style repeated-bigram filter for LLM corpora.
        from build_datawarehouse_demo_spark.operators.text import repetition_score

        return repetition_score(_t(spark, sf_dir, "documents"), n=2).select(
            "doc_id", "n_ngrams", "n_distinct_ngrams", "dup_ngram_ratio"
        )

    from build_datawarehouse_demo_spark.operators.text import PII_PATTERNS as _PII

    # each pattern counted on the text AFTER earlier scrubs (mirrors
    # operators/text.py:scrub_pii — counts == placeholders written)
    _pii_count_exprs = []
    _pii_scrub_sql = "text"
    for _name, _pat, _repl in _PII:
        _pii_count_exprs.append(
            f"CAST(len(regexp_extract_all({_pii_scrub_sql}, '{_pat}')) AS BIGINT) AS n_{_name}"
        )
        _pii_scrub_sql = f"regexp_replace({_pii_scrub_sql}, '{_pat}', '{_repl}', 'g')"
    _pii_counts_sql = ", ".join(_pii_count_exprs)

    @register(
        "text_scrub_pii",
        oracle=f"""
        SELECT doc_id, {_pii_counts_sql}, {_pii_scrub_sql} AS scrubbed
        FROM documents
        """,
    )
    def q_scrub_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
        # PII scrub + per-kind audit counts; patterns restricted to the
        # Java-regex ∩ RE2 subset so both engines apply the same scrub.
        from build_datawarehouse_demo_spark.operators.text import scrub_pii

        return scrub_pii(_t(spark, sf_dir, "documents")).select(
            "doc_id", "n_email", "n_ssn", "n_ipv4", "scrubbed"
        )

    @register(
        "text_tfidf_topk",
        oracle=f"""
        WITH toks AS (
          SELECT doc_id, lower(tok) AS tok
          FROM documents, unnest({_TOK}) AS t(tok)
        ),
        tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
        dfreq AS (SELECT tok, count(*) AS doc_freq FROM tf GROUP BY 1),
        n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
        scored AS (
          SELECT tf.doc_id, tf.tok, tf.tf, dfreq.doc_freq,
                 ln(n.n_docs / dfreq.doc_freq) AS idf,
                 tf.tf * ln(n.n_docs / dfreq.doc_freq) AS tfidf
          FROM tf JOIN dfreq USING (tok) CROSS JOIN n
        ),
        ranked AS (
          SELECT doc_id, tok, tf, doc_freq, idf, tfidf,
                 CAST(row_number() OVER (PARTITION BY doc_id
                      ORDER BY tfidf DESC, tok) AS INTEGER) AS rank
          FROM scored
        )
        SELECT doc_id, tok AS token, tf, doc_freq,
               round(idf, 6) AS idf, round(tfidf, 6) AS tfidf, rank
        FROM ranked WHERE rank <= 5
        """,
    )
    def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
        # top-5 TF-IDF terms per document — one tokenization pass feeds
        # both the tf and the df aggregates (operators/text.py:tf_idf).
        from build_datawarehouse_demo_spark.operators.text import tf_idf

        return tf_idf(_t(spark, sf_dir, "documents"), top_k=5)

    @register(
        "text_bm25_topk",
        oracle=f"""
        WITH toks AS (
          SELECT doc_id, lower(tok) AS tok
          FROM documents, unnest({_TOK}) AS t(tok)
        ),
        dl AS (SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl FROM toks GROUP BY 1),
        tf AS (
          SELECT doc_id, tok, CAST(count(*) AS DOUBLE) AS tf FROM toks
          WHERE tok IN ('fast', 'join', 'query', 'spark', 'table')
          GROUP BY 1, 2
        ),
        dfreq AS (SELECT tok, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
        n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
        avgdl AS (SELECT avg(dl) AS avgdl FROM dl),
        scored AS (
          SELECT tf.doc_id,
                 sum(ln((n.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
                     * (tf.tf * 2.2)
                       / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / avgdl.avgdl))
                 ) AS score
          FROM tf JOIN dfreq USING (tok) JOIN dl USING (doc_id)
          CROSS JOIN n CROSS JOIN avgdl
          GROUP BY 1
        )
        SELECT doc_id, round(score, 6) AS bm25
        FROM scored ORDER BY score DESC, doc_id LIMIT 20
        """,
    )
    def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
        # BM25 top-20 against a literal query (operators/text.py:
        # bm25_topk — k1=1.2, b=0.75, so tf*(k1+1) is the 2.2 in the
        # oracle). Query-term filter precedes the tf aggregation.
        from build_datawarehouse_demo_spark.operators.text import bm25_topk

        return bm25_topk(
            _t(spark, sf_dir, "documents"),
            ["fast", "join", "query", "spark", "table"],
            k=20,
        )

    @register(
        "text_lm_bigram_logprob",
        oracle=f"""
        WITH tok AS (
          SELECT doc_id, list_transform({_TOK}, x -> lower(x)) AS w
          FROM documents
        ),
        g AS (
          SELECT doc_id,
                 [w[i] || ' ' || w[i + 1] FOR i IN generate_series(1, len(w) - 1)] AS grams
          FROM tok
        ),
        bi AS (SELECT doc_id, gram FROM g, unnest(grams) AS t(gram)),
        c2 AS (SELECT gram, CAST(count(*) AS DOUBLE) AS c2 FROM bi GROUP BY 1),
        c1 AS (
          SELECT split_part(gram, ' ', 1) AS w1, sum(c2) AS c1
          FROM c2 GROUP BY 1
        )
        SELECT bi.doc_id, count(*) AS n_bigrams,
               round(avg(ln(c2.c2 / c1.c1)), 6) AS avg_logprob
        FROM bi
        JOIN c2 USING (gram)
        JOIN c1 ON split_part(bi.gram, ' ', 1) = c1.w1
        GROUP BY bi.doc_id
        """,
    )
    def q_lm_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
        # perplexity-style corpus self-scoring: mean ln P(w2|w1) under
        # the corpus MLE bigram model (operators/text.py:
        # lm_bigram_logprob) — one bigram explode feeds both the doc
        # rows and the model tables.
        from build_datawarehouse_demo_spark.operators.text import lm_bigram_logprob

        return lm_bigram_logprob(_t(spark, sf_dir, "documents"))

    # chunking params shared by the op call and the oracle text
    _CHUNK, _OVERLAP = 32, 8
    _STEP = _CHUNK - _OVERLAP

    @register(
        "text_chunk_documents",
        oracle=f"""
        WITH toks AS (SELECT doc_id, {_TOK} AS w FROM documents),
        starts AS (
          SELECT doc_id, w, unnest(range(0, len(w), {_STEP})) AS s
          FROM toks WHERE len(w) > 0
        )
        SELECT doc_id,
               CAST(s // {_STEP} AS BIGINT) AS chunk_id,
               array_to_string(w[s + 1 : s + {_CHUNK}], ' ') AS chunk_text,
               CAST(least({_CHUNK}, len(w) - s) AS BIGINT) AS n_chunk_tokens
        FROM starts
        """,
    )
    def q_chunk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
        # sliding token-window chunking (context-window prep): tokenize
        # once, posexplode start offsets — no shuffle, chunks stay on
        # the parent document's partition.
        from build_datawarehouse_demo_spark.operators.text import chunk_documents

        return chunk_documents(
            _t(spark, sf_dir, "documents"), chunk_size=_CHUNK, overlap=_OVERLAP
        )

    _PACK_CTX, _PACK_SHARDS = 256, 8

    @register(
        "text_pack_sequences",
        oracle=f"""
        WITH base AS (
          SELECT doc_id,
                 CAST(doc_id % {_PACK_SHARDS} AS BIGINT) AS shard,
                 CAST(coalesce(len({_TOK}), 0) AS BIGINT) AS n_tokens
          FROM documents
        ),
        off AS (
          SELECT *,
                 CAST(coalesce(sum(n_tokens) OVER (
                     PARTITION BY shard ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                   AS start_offset,
                 CAST(coalesce(sum(n_tokens) OVER (
                     PARTITION BY shard ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                      + greatest(n_tokens, 1) - 1 AS BIGINT) AS last_off
          FROM base
        )
        SELECT doc_id, shard, n_tokens, start_offset,
               CAST(start_offset // {_PACK_CTX} AS BIGINT) AS start_seq,
               CAST(last_off // {_PACK_CTX} AS BIGINT) AS end_seq,
               CAST(last_off // {_PACK_CTX} - start_offset // {_PACK_CTX} + 1 AS BIGINT) AS n_seqs
        FROM off
        """,
    )
    def q_pack_seqs(spark: SparkSession, sf_dir: str) -> DataFrame:
        # concat-and-cut packing layout, sharded so each running sum is
        # an independent per-shard window (one shuffle on shard), not a
        # single-task global order.
        from build_datawarehouse_demo_spark.operators.text import pack_sequences

        return pack_sequences(
            _t(spark, sf_dir, "documents"), ctx=_PACK_CTX, shards=_PACK_SHARDS
        )

    @register(
        "pipeline_prepare_training_data",
        oracle=rf"""
        WITH base AS (
          SELECT doc_id,
                 lower(trim(regexp_replace(
                   regexp_replace(text, '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g'),
                   '\s+', ' ', 'g'))) AS cleaned,
                 {_TOK} AS w,
                 CAST(len({_TOK}) AS DOUBLE) AS n_tok,
                 CAST(length(text) AS DOUBLE) AS n_chars,
                 CAST(len(list_filter({_TOK},
                      x -> lower(x) IN ('the','a','and','of','to','is'))) AS DOUBLE) AS n_stop,
                 CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\s]')) AS DOUBLE) AS n_punct
          FROM documents
        ),
        qual AS (
          SELECT doc_id, cleaned, w, CAST(n_tok AS BIGINT) AS n_tokens,
                 least(1.0, greatest(0.0,
                   0.4 * (CASE WHEN (CASE WHEN n_tok > 0 THEN (n_chars - (n_tok - 1)) / n_tok ELSE 0.0 END) >= 3
                               AND (CASE WHEN n_tok > 0 THEN (n_chars - (n_tok - 1)) / n_tok ELSE 0.0 END) <= 8
                               THEN 1.0 ELSE 0.0 END)
                   + 0.4 * (CASE WHEN n_tok > 0 THEN n_stop / n_tok ELSE 0.0 END) * 4
                   + 0.2 * (1 - (CASE WHEN n_chars > 0 THEN n_punct / n_chars ELSE 0.0 END)))) AS quality
          FROM base
        ),
        hits AS (
          SELECT doc_id, 'de' AS lang, len(list_filter(w, x -> lower(x) IN ('der','die','das','und','ist','nicht'))) AS h FROM base
          UNION ALL
          SELECT doc_id, 'en', len(list_filter(w, x -> lower(x) IN ('the','a','and','of','to','is'))) FROM base
          UNION ALL
          SELECT doc_id, 'es', len(list_filter(w, x -> lower(x) IN ('el','la','y','es','los','que'))) FROM base
          UNION ALL
          SELECT doc_id, 'fr', len(list_filter(w, x -> lower(x) IN ('le','la','et','est','les','des'))) FROM base
          UNION ALL
          SELECT doc_id, 'zh', len(list_filter(w, x -> lower(x) IN ('de5','shi4','le5','zai4','he2','you3'))) FROM base
        ),
        lang AS (
          SELECT doc_id, CASE WHEN h = 0 THEN 'und' ELSE lang END AS pred_lang
          FROM hits
          QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY h DESC, lang) = 1
        ),
        kept AS (
          SELECT q.doc_id, q.cleaned, q.n_tokens, q.quality, l.pred_lang
          FROM qual q JOIN lang l ON q.doc_id = l.doc_id
          WHERE q.n_tokens >= 5 AND q.quality >= 0.3 AND l.pred_lang <> 'und'
        ),
        dedup AS (
          SELECT *, min(doc_id) OVER (PARTITION BY md5(cleaned)) AS keeper FROM kept
        )
        SELECT doc_id, pred_lang, n_tokens, quality,
               CASE WHEN doc_id IS NULL THEN NULL
                    WHEN {_HASH32.format(expr="'0:split:' || CAST(doc_id AS VARCHAR)")} % 1000 < 100 THEN 'val'
                    WHEN {_HASH32.format(expr="'0:split:' || CAST(doc_id AS VARCHAR)")} % 1000 < 200 THEN 'test'
                    ELSE 'train' END AS split
        FROM dedup WHERE doc_id = keeper
        """,
    )
    def q_prepare_training(spark: SparkSession, sf_dir: str) -> DataFrame:
        # the composed corpus-prep pipeline: clean -> langid -> quality
        # -> filter -> exact dedup -> split, each stage the same
        # operator that is registered individually. One scan, one
        # digest-keyed exchange, one narrow hash filter.
        from build_datawarehouse_demo_spark.plans.training_data import prepare_training_data

        return prepare_training_data(_t(spark, sf_dir, "documents"))

    @register(
        "sample_stratified",
        oracle=f"""
        SELECT doc_id, lang
        FROM documents
        WHERE {_HASH32.format(expr="'0:strat:' || CAST(doc_id AS VARCHAR)")} % 1000 <
              CASE lang WHEN 'en' THEN 500 WHEN 'de' THEN 1000 WHEN 'zh' THEN 250 ELSE 0 END
        """,
    )
    def q_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
        # per-stratum deterministic rates: keep all of a rare language,
        # downsample the head — the standard corpus-rebalancing shape.
        from build_datawarehouse_demo_spark.operators.sampling import stratified_sample_by_hash

        return stratified_sample_by_hash(
            _t(spark, sf_dir, "documents", rebalance=False),
            "doc_id",
            "lang",
            rates={"en": 0.5, "de": 1.0, "zh": 0.25},
        ).select("doc_id", "lang")

    # ------------------------------------------------------------------
    # multimodal plumbing
    # ------------------------------------------------------------------

    @register(
        "multimodal_metadata",
        oracle="""
        SELECT doc_id AS id,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               CAST(ascii(substr(text, 1, 1)) AS INTEGER) AS fake_width,
               CAST(ascii(substr(text, 2, 1)) AS INTEGER) AS fake_height,
               md5(text) AS content_md5
        FROM documents
        """,
    )
    def q_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
        # binary-column plumbing: UTF-8 payload through an Arrow-batched
        # mapInPandas "decode" (operators/multimodal.py) — the schema /
        # batch shape a real image decoder would use.
        from build_datawarehouse_demo_spark.operators.multimodal import (
            attach_binary,
            fake_decode_metadata,
        )

        return fake_decode_metadata(attach_binary(_t(spark, sf_dir, "documents")))

    # ------------------------------------------------------------------
    # deterministic sampling / dataset splits
    # ------------------------------------------------------------------

    @register(
        "sample_hash_deterministic",
        oracle=f"""
        SELECT doc_id, lang
        FROM documents
        WHERE {_HASH32.format(expr="'7:sample:' || CAST(doc_id AS VARCHAR)")} % 1000 < 200
        """,
    )
    def q_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
        # ~20% deterministic sample keyed on md5(doc_id) — reproducible
        # across engines/runs, unlike df.sample()'s partition RNG.
        from build_datawarehouse_demo_spark.operators.sampling import sample_by_hash

        return sample_by_hash(
            _t(spark, sf_dir, "documents", rebalance=False), "doc_id", rate=0.2, seed=7
        ).select(
            "doc_id", "lang"
        )

    @register(
        "sample_train_val_test_split",
        oracle=f"""
        SELECT doc_id,
               CASE WHEN doc_id IS NULL THEN NULL
                    WHEN {_HASH32.format(expr="'0:split:' || CAST(doc_id AS VARCHAR)")} % 1000 < 100 THEN 'val'
                    WHEN {_HASH32.format(expr="'0:split:' || CAST(doc_id AS VARCHAR)")} % 1000 < 200 THEN 'test'
                    ELSE 'train' END AS split
        FROM documents
        """,
    )
    def q_split(spark: SparkSession, sf_dir: str) -> DataFrame:
        # stable train/val/test assignment: a row's split is a pure
        # function of its id, so membership survives dataset growth.
        from build_datawarehouse_demo_spark.operators.sampling import train_val_test_split

        return train_val_test_split(
            _t(spark, sf_dir, "documents", rebalance=False),
            "doc_id",
            val_frac=0.1,
            test_frac=0.1,
        ).select("doc_id", "split")

    # ------------------------------------------------------------------
    # warehouse change management (SCD2)
    # ------------------------------------------------------------------

    @register(
        "scd2_apply_history",
        oracle="""
        WITH upd AS (
          SELECT c_custkey, c_acctbal + 1000.0 AS c_acctbal
          FROM customer WHERE c_acctbal > 5000
        )
        SELECT c.c_custkey, c.c_acctbal,
               TIMESTAMP '2020-01-01 00:00:00' AS valid_from,
               CASE WHEN u.c_custkey IS NOT NULL THEN TIMESTAMP '2021-06-01 00:00:00'
                    ELSE TIMESTAMP '2260-01-01 00:00:00' END AS valid_to,
               (u.c_custkey IS NULL) AS is_current
        FROM customer c LEFT JOIN upd u ON c.c_custkey = u.c_custkey
        UNION ALL
        SELECT c_custkey, c_acctbal,
               TIMESTAMP '2021-06-01 00:00:00',
               TIMESTAMP '2260-01-01 00:00:00', TRUE
        FROM upd
        """,
    )
    def q_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
        # type-2 dimension apply (operators/scd.py): close changed keys'
        # open rows, append new versions; the oracle states the same
        # history algebraically.
        from build_datawarehouse_demo_spark.operators.scd import scd2_apply, scd2_bootstrap

        cust = _t(spark, sf_dir, "customer", rebalance=False).select("c_custkey", "c_acctbal")
        cur = scd2_bootstrap(
            cust.withColumn("effective_ts", F.lit("2020-01-01 00:00:00").cast("timestamp"))
        )
        upd = (
            cust.filter(F.col("c_acctbal") > 5000)
            .withColumn("c_acctbal", F.col("c_acctbal") + 1000.0)
            .withColumn("effective_ts", F.lit("2021-06-01 00:00:00").cast("timestamp"))
        )
        return scd2_apply(cur, upd, key="c_custkey", tracked_cols=("c_acctbal",))

    # ------------------------------------------------------------------
    # skew mitigation (operators/skew.py) — result-identical to the
    # plain join/agg, only the physical distribution changes, so the
    # plain SQL IS the oracle.
    # ------------------------------------------------------------------

    @register(
        "skew_salted_join",
        oracle="""
        SELECT l.l_orderkey, l.l_linenumber, s.s_name
        FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        """,
    )
    def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
        from build_datawarehouse_demo_spark.operators.skew import salted_join

        li = _t(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_linenumber", F.col("l_suppkey").alias("suppkey")
        )
        sup = _t(spark, sf_dir, "supplier").select(
            F.col("s_suppkey").alias("suppkey"), "s_name"
        )
        return salted_join(li, sup, "suppkey").select("l_orderkey", "l_linenumber", "s_name")

    @register(
        "skew_salted_count",
        oracle="SELECT event_type, count(*) AS n FROM events GROUP BY event_type",
    )
    def q_salted_count(spark: SparkSession, sf_dir: str) -> DataFrame:
        from build_datawarehouse_demo_spark.operators.skew import salted_count_per_key

        return salted_count_per_key(_t(spark, sf_dir, "events"), "event_type").select(
            "event_type", "n"
        )

    # ------------------------------------------------------------------
    # exact + approximate distribution statistics
    # ------------------------------------------------------------------

    @register(
        "agg_percentile_exact",
        oracle="""
        SELECT o_orderstatus,
               round(quantile_cont(o_totalprice, 0.25), 6) AS p25,
               round(quantile_cont(o_totalprice, 0.50), 6) AS p50,
               round(quantile_cont(o_totalprice, 0.90), 6) AS p90,
               count(*) AS n
        FROM orders GROUP BY o_orderstatus
        """,
    )
    def q_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
        # exact interpolated percentiles: both engines implement the
        # standard (n-1)p linear interpolation — verified equal to
        # 1e-9 before registering; rounded to 6dp for safety.
        o = _t(spark, sf_dir, "orders", rebalance=False)
        return o.groupBy("o_orderstatus").agg(
            F.round(F.percentile("o_totalprice", F.lit(0.25)), 6).alias("p25"),
            F.round(F.percentile("o_totalprice", F.lit(0.50)), 6).alias("p50"),
            F.round(F.percentile("o_totalprice", F.lit(0.90)), 6).alias("p90"),
            F.count(F.lit(1)).alias("n"),
        )

    @register(
        "agg_approx_stats",
        # Bounds-invariant oracle (VERDICT.md round 2 item 1b): the
        # sketch VALUES are engine-specific, but their documented error
        # bounds are guarantees, not flakes — HLL++ at default
        # rsd=0.05 (bound checked at 3×rsd), KLL/GK percentile at
        # accuracy=10000 (rank error n/10000, checked against the
        # exact 0.49/0.51 quantile envelope). Spark emits the exact
        # counts plus in-bounds booleans; DuckDB emits ITS exact
        # counts and literal TRUEs. A sketch outside bounds
        # hash-mismatches, so accuracy is actually asserted — which
        # the old rows-only registration never did.
        oracle="""
        SELECT count(DISTINCT l_orderkey) AS exact_orders,
               count(DISTINCT l_partkey) AS exact_parts,
               TRUE AS orders_in_bounds,
               TRUE AS parts_in_bounds,
               TRUE AS median_in_bounds
        FROM lineitem
        """,
    )
    def q_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
        li = _t(spark, sf_dir, "lineitem")
        raw = li.agg(
            F.countDistinct("l_orderkey").alias("exact_orders"),
            F.countDistinct("l_partkey").alias("exact_parts"),
            F.approx_count_distinct("l_orderkey").alias("__approx_orders"),
            F.approx_count_distinct("l_partkey").alias("__approx_parts"),
            F.percentile_approx(
                "l_extendedprice", F.lit(0.5), F.lit(10000)
            ).alias("__approx_median"),
            F.percentile("l_extendedprice", F.lit(0.49)).alias("__q49"),
            F.percentile("l_extendedprice", F.lit(0.51)).alias("__q51"),
        )

        def in_bounds(approx, exact):
            return (
                F.abs(approx.cast("double") / exact.cast("double") - F.lit(1.0))
                <= F.lit(0.15)
            )

        return raw.select(
            "exact_orders",
            "exact_parts",
            in_bounds(F.col("__approx_orders"), F.col("exact_orders")).alias(
                "orders_in_bounds"
            ),
            in_bounds(F.col("__approx_parts"), F.col("exact_parts")).alias(
                "parts_in_bounds"
            ),
            (
                (F.col("__approx_median") >= F.col("__q49"))
                & (F.col("__approx_median") <= F.col("__q51"))
            ).alias("median_in_bounds"),
        )

    # ------------------------------------------------------------------
    # custom operators Spark lacks natively
    # ------------------------------------------------------------------

    @register(
        "join_asof",
        oracle="""
        WITH b AS (
          SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
          FROM orders GROUP BY o_custkey, o_orderdate
        )
        SELECT e.event_id, e.user_id, b.o_orderkey AS last_orderkey,
               b.o_orderdate AS asof_time
        FROM events e
        ASOF LEFT JOIN b ON e.user_id = b.o_custkey AND e.ts >= b.o_orderdate
        """,
    )
    def q_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
        # as-of join via union + carry-forward window (operators/
        # asof.py) — checked against DuckDB's native ASOF JOIN. The
        # build side is pre-aggregated to unique (key, time) so "latest
        # row" is well-defined in both engines.
        from build_datawarehouse_demo_spark.operators.asof import asof_join
        from build_datawarehouse_demo_spark.sources.readers import read_parquet

        # no rebalance, no pre-agg groupBy: the window's
        # hashpartitioning(user_id) is the operator's ONE shuffle;
        # duplicate (key, date) build rows resolve to max orderkey via
        # build_order instead of an aggregation exchange.
        events = read_parquet(spark, f"{sf_dir}/events.parquet").select(
            "event_id", F.col("user_id"), "ts"
        )
        orders = read_parquet(spark, f"{sf_dir}/orders.parquet").select(
            F.col("o_custkey").alias("user_id"),
            "o_orderdate",
            F.col("o_orderkey").alias("last_orderkey"),
        )
        out = asof_join(
            events,
            orders,
            key="user_id",
            probe_time="ts",
            build_time="o_orderdate",
            build_cols=("last_orderkey",),
            build_order=("last_orderkey",),
        )
        return out.select("event_id", "user_id", "last_orderkey", "asof_time")

    @register(
        "join_range_bucketed",
        oracle="""
        WITH bands AS (
          SELECT CAST(range AS INTEGER) AS band_id,
                 CAST(range * 60000 AS DOUBLE) AS lo,
                 CAST((range + 1) * 60000 AS DOUBLE) AS hi
          FROM range(12)
        )
        SELECT o.o_orderkey, b.band_id
        FROM orders o JOIN bands b
          ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
        """,
    )
    def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
        # interval-containment join rewritten as a grid-bucket
        # equi-join (operators/asof.py:range_join_bucketed); the oracle
        # states the naive inequality-join semantics.
        from build_datawarehouse_demo_spark.operators.asof import range_join_bucketed

        bands = spark.range(12).select(
            F.col("id").cast("int").alias("band_id"),
            (F.col("id") * 60000).cast("double").alias("lo"),
            ((F.col("id") + 1) * 60000).cast("double").alias("hi"),
        )
        orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
        out = range_join_bucketed(orders, bands, "o_totalprice", "lo", "hi", bucket_width=20000.0)
        return out.select("o_orderkey", "band_id")

    @register(
        "join_bucketed_build",
        oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        """,
    )
    def q_bucketed_build(spark: SparkSession, sf_dir: str) -> DataFrame:
        # the INGEST half of the bucketed fact-fact join: always
        # writes both bucketed+sorted tables (the one shuffle the
        # layout ever pays), then reads the orders side back through
        # the catalog so the oracle checks the persisted round-trip.
        # join_bucketed_shuffle_free is the amortized steady state.
        _ensure_bucketed_join_tables(spark, sf_dir, force=True)
        return spark.table("bj_orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )

    @register(
        "join_bucketed_shuffle_free",
        oracle="""
        SELECT l.l_orderkey, l.l_linenumber, o.o_custkey, o.o_totalprice
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        """,
    )
    def q_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
        # THE canonical 100 TB fact-fact join (VERDICT round 2 item 6):
        # write both sides bucketed+sorted on the join key, and the
        # sort-merge join needs NO exchange on either side — the
        # shuffle is paid once at write time and amortized over every
        # later join. tests/test_scale_layout.py plan-asserts zero
        # Exchange under this entry's join. The merge hint forces the
        # sort-merge path so bucketing, not a broadcast, is what
        # eliminates the exchanges. The build is memoized per
        # (session, sf_dir) — join_bucketed_build is the always-write
        # half — so repeated runs time the join alone, which is
        # exactly the amortized steady state the layout buys.
        _ensure_bucketed_join_tables(spark, sf_dir)
        return (
            spark.table("bj_lineitem")
            .hint("merge")
            .join(
                spark.table("bj_orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .select("l_orderkey", "l_linenumber", "o_custkey", "o_totalprice")
        )

    @register(
        "agg_histogram_fixed",
        oracle="""
        SELECT CAST(floor(value / 50.0) AS BIGINT) AS bin,
               count(*) AS n,
               CAST(min(value) AS DOUBLE) AS lo,
               CAST(max(value) AS DOUBLE) AS hi
        FROM events WHERE value IS NOT NULL
        GROUP BY 1
        """,
    )
    def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
        # fixed-width value histogram — only bin keys shuffle; the
        # floor(value/width) binning is the same IEEE double op on
        # both engines.
        from build_datawarehouse_demo_spark.operators.profiling import histogram_fixed

        return histogram_fixed(
            _t(spark, sf_dir, "events", rebalance=False), "value", bin_width=50.0
        )

    _PROFILE_COLS = [
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderpriority",
        "o_orderdate_str",
    ]

    @register(
        "profile_table_stats",
        oracle="\nUNION ALL\n".join(
            f"""
        SELECT '{c}' AS col_name, count(*) AS n_rows,
               count(*) FILTER ({c} IS NULL) AS n_nulls,
               count(DISTINCT {c}) AS n_distinct,
               CAST(min({c}) AS VARCHAR) AS min_value,
               CAST(max({c}) AS VARCHAR) AS max_value
        FROM (SELECT *, strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate_str
              FROM orders)
        """
            for c in _PROFILE_COLS
        ),
    )
    def q_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
        # the "what is in this table" pass: one agg row (multi-DISTINCT
        # via Expand — the exact-answer cost; profile_columns documents
        # the HLL escape hatch for 100 TB) exploded to a row per
        # column. The timestamp column is pre-formatted to a sortable
        # string so min/max stringification is engine-neutral.
        from build_datawarehouse_demo_spark.operators.profiling import profile_columns

        orders = _t(spark, sf_dir, "orders", rebalance=False).withColumn(
            "o_orderdate_str", F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss")
        )
        return profile_columns(orders, _PROFILE_COLS)

    @register(
        "join_partitioned_dpp",
        oracle="""
        SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS event_date,
               count(*) AS n_events,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events
        WHERE (CAST(ts AS DATE) - DATE '1970-01-01') % 7 = 2
          AND CAST(ts AS DATE) BETWEEN DATE '2024-01-01' AND DATE '2024-01-31'
        GROUP BY 1
        """,
    )
    def q_dpp_join(spark: SparkSession, sf_dir: str) -> DataFrame:
        # dynamic partition pruning: the fact is WRITTEN partitioned by
        # event_date (memoized, the same write-once amortization as the
        # bucketed join); the dim filter (day-of-week) is not knowable
        # at compile time, so Catalyst injects a dynamicpruning
        # subquery that reuses the dim broadcast to skip fact
        # partitions at RUNTIME — at 100 TB the scan reads ~1/7 of the
        # partitions instead of all of them. tests/test_scale_layout.py
        # plan-asserts the dynamicpruning expression under this entry.
        # Day-of-week is epoch-day % 7 (engine-neutral: Spark and
        # DuckDB weekday numbering conventions differ).
        _ensure_dpp_events(spark, sf_dir)
        dim = spark.sql(
            "SELECT d AS event_date, datediff(d, DATE'1970-01-01') % 7 AS dow "
            "FROM (SELECT explode(sequence(DATE'2024-01-01', DATE'2024-01-31')) AS d)"
        )
        return (
            spark.table("dpp_events")
            .join(dim.filter("dow = 2"), "event_date")
            .groupBy("event_date")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
            )
            .select(
                F.date_format("event_date", "yyyy-MM-dd").alias("event_date"),
                "n_events",
                "sum_value",
            )
        )

    # ------------------------------------------------------------------
    # vectorized UDF surface (SURVEY.md §2.10)
    # ------------------------------------------------------------------

    @register(
        "udf_pandas_scalar",
        oracle="""
        SELECT l_orderkey, l_linenumber,
               l_extendedprice * (1.0 - l_discount) AS net
        FROM lineitem WHERE l_suppkey <= 10
        """,
    )
    def q_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
        # Arrow-batched scalar pandas UDF; per-row IEEE arithmetic is
        # bit-identical to the SQL expression, so the oracle is exact.
        from build_datawarehouse_demo_spark.operators.udfs import net_price

        li = _t(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") <= 10)
        return li.select(
            "l_orderkey",
            "l_linenumber",
            net_price("l_extendedprice", "l_discount").alias("net"),
        )

    @register(
        "udf_grouped_zscore",
        oracle="""
        SELECT c_mktsegment, id, acctbal,
               round(COALESCE((acctbal - avg(acctbal) OVER w)
                              / nullif(stddev_samp(acctbal) OVER w, 0), 0.0), 6) AS zscore
        FROM (SELECT c_mktsegment, c_custkey AS id, c_acctbal AS acctbal FROM customer)
        WINDOW w AS (PARTITION BY c_mktsegment)
        """,
    )
    def q_udf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
        # grouped-map applyInPandas (per-group pandas frame in/out);
        # z-scores rounded to 6dp because pandas uses pairwise
        # summation for mean/std while SQL engines sum sequentially —
        # equal to ~1e-15, identical after rounding.
        from build_datawarehouse_demo_spark.operators.udfs import grouped_zscore

        cust = _t(spark, sf_dir, "customer").select(
            F.col("c_mktsegment"), F.col("c_custkey").alias("id"), F.col("c_acctbal").alias("acctbal")
        )
        out = grouped_zscore(cust, "c_mktsegment", "acctbal")
        return out.withColumn("zscore", F.round("zscore", 6))

    @register(
        "udf_grouped_agg_weighted_mean",
        oracle="""
        SELECT l_returnflag,
               round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 6) AS wmean
        FROM lineitem GROUP BY l_returnflag
        """,
    )
    def q_udf_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
        # grouped-aggregate pandas UDF (Σwx/Σw); rounded for the same
        # summation-order reason as above.
        from build_datawarehouse_demo_spark.operators.udfs import weighted_mean

        li = _t(spark, sf_dir, "lineitem")
        return li.groupBy("l_returnflag").agg(
            F.round(weighted_mean("l_extendedprice", "l_quantity"), 6).alias("wmean")
        )

    # ------------------------------------------------------------------
    # streaming-equivalent windows
    # ------------------------------------------------------------------

    @register(
        "streaming_sliding_window",
        oracle="""
        WITH ex AS (
          SELECT time_bucket(INTERVAL 15 MINUTE, ts) - k * (INTERVAL 15 MINUTE) AS window_start,
                 event_type
          FROM events, unnest(generate_series(0, 3)) AS g(k)
        )
        SELECT window_start, window_start + INTERVAL 1 HOUR AS window_end,
               event_type, count(*) AS n_events
        FROM ex GROUP BY 1, 2, 3
        """,
    )
    def q_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
        # sliding windows: each event lands in window/slide = 4
        # overlapping windows; the oracle expands them explicitly.
        from build_datawarehouse_demo_spark.streaming.windows import sliding_event_counts

        return sliding_event_counts(_t(spark, sf_dir, "events"))

    @register(
        "streaming_session_window",
        oracle="""
        WITH o AS (
          SELECT user_id, ts,
                 CASE WHEN lag(ts) OVER w IS NULL
                        OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                      THEN 1 ELSE 0 END AS is_new
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        s AS (
          SELECT user_id, ts,
                 sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS sess
          FROM o
        )
        SELECT user_id, min(ts) AS session_start,
               max(ts) + INTERVAL 30 MINUTE AS session_end,
               count(*) AS n_events
        FROM s GROUP BY user_id, sess
        """,
    )
    def q_session(spark: SparkSession, sf_dir: str) -> DataFrame:
        # native session_window vs the lag/cumsum islands construction.
        # Boundary note (corrected round 7, pinned empirically in
        # tests/test_streaming.py): Spark MERGES a successor arriving
        # exactly `gap` after the previous event (adjacent windows
        # coalesce), matching the oracle's strictly-greater break.
        from build_datawarehouse_demo_spark.streaming.windows import session_event_counts

        return session_event_counts(_t(spark, sf_dir, "events"))

    @register(
        "rollup_incremental_update",
        oracle="""
        SELECT date_trunc('hour', ts) AS window_start,
               date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
               event_type, count(*) AS n_events,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events GROUP BY 1, 2, 3
        """,
    )
    def q_rollup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
        # the continuous-aggregate maintenance path: build the rollup on
        # the first half of the stream, then apply the FULL set
        # incrementally with a deliberately bucket-unaligned lateness
        # tolerance (the ADVICE round-1 repro shape). The oracle is the
        # full rebuild — incremental maintenance must be exactly
        # equivalent to it.
        import datetime as dt

        from build_datawarehouse_demo_spark.plans.rollup import incremental_rollup_update

        ev = _t(spark, sf_dir, "events", rebalance=False)
        old = ev.filter(F.col("ts") < F.lit("2024-01-15 00:00:00").cast("timestamp"))
        first = incremental_rollup_update(None, old)
        return incremental_rollup_update(
            first, ev, late_tolerance=dt.timedelta(minutes=90)
        )

    @register(
        "streaming_stateful_user_totals",
        oracle="""
        SELECT user_id, count(*) AS n_events,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
               max(ts) AS last_ts
        FROM events GROUP BY user_id
        """,
    )
    def q_stateful_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
        # batch form of the applyInPandasWithState operator — the SAME
        # function dispatches to explicit keyed state under readStream
        # (streaming/stateful.py; final-state ≡ batch asserted in
        # tests/test_streaming.py).
        from build_datawarehouse_demo_spark.streaming.stateful import user_running_totals

        return user_running_totals(_t(spark, sf_dir, "events"))

    @register(
        "streaming_tumbling_window",
        oracle="""
        SELECT date_trunc('hour', ts) AS window_start,
               date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
               event_type, count(*) AS n_events,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events GROUP BY 1, 2, 3
        """,
    )
    def q_stream_window(spark: SparkSession, sf_dir: str) -> DataFrame:
        # batch execution of the streaming transform — the SAME function
        # runs under readStream with a watermark (streaming/windows.py;
        # exercised against this batch result in tests/test_streaming.py).
        from build_datawarehouse_demo_spark.streaming.windows import tumbling_event_counts

        return tumbling_event_counts(_t(spark, sf_dir, "events"))

    @register(
        "streaming_dedup_ids",
        oracle="""
        SELECT DISTINCT event_id, user_id, event_type, ts, value
        FROM (SELECT * FROM events UNION ALL SELECT * FROM events)
        """,
    )
    def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
        # at-least-once ingest dedup: the batch form of
        # dropDuplicatesWithinWatermark (streaming/dedup.py). The input
        # union simulates full redelivery — every event arrives twice,
        # exactly one copy survives. Stream ≡ batch (duplicates split
        # ACROSS micro-batches still collapse) is asserted in
        # tests/test_streaming_dedup.py. No rebalance: dropDuplicates
        # shuffles on the id anyway.
        from build_datawarehouse_demo_spark.streaming.dedup import dedup_event_stream

        ev = _t(spark, sf_dir, "events", rebalance=False).select(
            "event_id", "user_id", "event_type", "ts", "value"
        )
        return dedup_event_stream(ev.unionByName(ev))
