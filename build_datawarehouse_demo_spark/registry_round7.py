"""Round-7 registry entries: auto-sized ANN search, trained IVF
(k-means index build composed with nprobe search).

Same oracle discipline as registry_extensions: exact integer /
md5-derived values wherever possible, identical aliases on both sides.
Count-pinned constants (plane counts, nlist) derive from the DRIVER
fixture's parquet metadata at registration, never hard-coded row
counts (round-6 ADVICE: a literal 500 silently diverges impl vs
oracle if the fixture changes).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from build_datawarehouse_demo_spark.registry import register
from build_datawarehouse_demo_spark.sources.readers import read_parquet

#: the driver's correctness gate runs queries at this sf_dir — pinned
#: oracle constants must be derived from ITS tables
_DRIVER_SF_DIR = "/root/testdata/sf0.01"


def _t(spark: SparkSession, sf_dir: str, name: str, rebalance: bool = True) -> DataFrame:
    return read_parquet(spark, f"{sf_dir}/{name}.parquet", rebalance=rebalance)


def _driver_rows(table: str, default: int) -> int:
    """Row count of the driver fixture's table from parquet metadata
    (no Spark session needed at import time)."""
    try:
        import pyarrow.dataset as pds

        return pds.dataset(f"{_DRIVER_SF_DIR}/{table}.parquet").count_rows()
    except Exception:
        return default


def _cos_sql(a: str, b: str) -> str:
    """Null-guarded cosine, matching operators.similarity.cosine's
    zero-norm -> NULL contract."""
    return (
        f"(CASE WHEN list_dot_product({a},{a}) > 0 AND "
        f"list_dot_product({b},{b}) > 0 "
        f"THEN list_cosine_similarity({a}, {b}) END)"
    )


def register_round7_ann() -> None:
    # ------------------------------------------------------------------
    # auto-sized ANN search (VERDICT r6 item 2): the n_planes=None lane
    # of ann_rp_lsh_topk finally gets a correctness row — the exact gap
    # that let the dedup lane's fixed signature hide until sf4
    # ------------------------------------------------------------------
    from build_datawarehouse_demo_spark.operators.similarity import (
        ann_auto_planes,
        rp_planes,
    )

    _N_EMB = _driver_rows("embeddings", 500)
    # the SAME function the impl calls — no formula mirroring to drift
    _AUTO_PLANES = ann_auto_planes(_N_EMB)
    _ap = rp_planes(_AUTO_PLANES, 64)
    _ap_sql = " + ".join(
        f"(CASE WHEN list_dot_product(v, [{', '.join(str(x) for x in plane)}]) >= 0 "
        f"THEN {1 << i} ELSE 0 END)"
        for i, plane in enumerate(_ap)
    )

    @register(
        "sim_ann_rp_lsh_auto",
        oracle=f"""
        WITH e AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        sig AS (
          SELECT vec_id, v, CAST({_ap_sql} AS INTEGER) AS s FROM e
        ),
        p AS (SELECT vec_id AS probe_id, v AS pv, s FROM sig WHERE vec_id < 10),
        variants AS (
          SELECT probe_id, pv, s FROM p
          UNION ALL
          SELECT probe_id, pv, CAST(xor(s, 1 << i) AS INTEGER) FROM p,
                 unnest(generate_series(0, {_AUTO_PLANES - 1})) AS g(i)
        ),
        cand AS (
          SELECT DISTINCT v.probe_id, c.vec_id
          FROM sig c JOIN variants v ON c.s = v.s AND c.vec_id <> v.probe_id
        ),
        scored AS (
          SELECT cd.probe_id, cd.vec_id, {_cos_sql("pe.v", "ce.v")} AS cos
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
    def q_ann_lsh_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
        """ANN search with the CORPUS-SIZED signature (n_planes=None →
        ceil(log2(n/64)) in [8,24], one count() action) + Hamming-1
        multiprobe as the recall compensation — the scale-safe lane
        that mirrors dedup_embedding_cosine_auto's fix: a fixed
        signature's per-probe verify cost grows n/2^planes (linear per
        probe once n dwarfs the bucket space), auto-sizing keeps
        buckets ~64 deep. Oracle pins the plane count the formula
        picks at the driver fixture's corpus size."""
        from build_datawarehouse_demo_spark.operators.similarity import (
            ann_rp_lsh_topk,
        )

        emb = _t(spark, sf_dir, "embeddings")
        probes = emb.filter(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("probe_id"), "embedding"
        )
        return ann_rp_lsh_topk(
            emb, probes, k=5, n_planes=None, dim=64, multiprobe=True
        )

    # ------------------------------------------------------------------
    # trained IVF (VERDICT r6 item 4): the index BUILD becomes part of
    # the engine — nlist ≈ sqrt(n) centroids derived by 2 Lloyd
    # iterations from deterministic seeds, searched with nprobe > 1
    # ------------------------------------------------------------------
    _NLIST = max(2, math.ceil(math.sqrt(_N_EMB)))
    _NPROBE = 4
    _DIM = 64

    def _lloyd_sql(prev: str, out: str) -> str:
        """One Lloyd iteration in SQL: assign every vector to its
        max-cosine centroid of `prev`, re-pack per-dim 6dp-rounded
        means as the new centroid list `out`."""
        return f"""
        a_{out} AS (
          SELECT vec_id, cid, v FROM (
            SELECT e.vec_id, c.cid, e.v,
                   row_number() OVER (PARTITION BY e.vec_id
                       ORDER BY {_cos_sql("e.v", "c.cv")} DESC, c.cid) AS rn
            FROM e, {prev} c
          ) WHERE rn = 1
        ),
        {out} AS (
          SELECT cid, list(m ORDER BY dim) AS cv FROM (
            SELECT cid, i AS dim, round(avg(v[i]), 6) AS m
            FROM a_{out}, unnest(generate_series(1, {_DIM})) AS g(i)
            GROUP BY 1, 2
          ) GROUP BY cid
        )"""

    @register(
        "sim_ivf_trained",
        oracle=f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        c0 AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < {_NLIST}),
        {_lloyd_sql("c0", "c1")},
        {_lloyd_sql("c1", "c2")},
        lists AS (
          SELECT vec_id, cid, v FROM (
            SELECT e.vec_id, c.cid, e.v,
                   row_number() OVER (PARTITION BY e.vec_id
                       ORDER BY {_cos_sql("e.v", "c.cv")} DESC, c.cid) AS rn
            FROM e, c2 c
          ) WHERE rn = 1
        ),
        p AS (SELECT vec_id AS probe_id, v AS pv FROM e WHERE vec_id < 10),
        pa AS (
          SELECT probe_id, pv, cid FROM (
            SELECT p.probe_id, p.pv, c.cid,
                   row_number() OVER (PARTITION BY p.probe_id
                       ORDER BY {_cos_sql("p.pv", "c.cv")} DESC, c.cid) AS rn
            FROM p, c2 c
          ) WHERE rn <= {_NPROBE}
        ),
        scored AS (
          SELECT pa.probe_id, l.vec_id, {_cos_sql("pa.pv", "l.v")} AS cos
          FROM pa JOIN lists l ON l.cid = pa.cid AND l.vec_id <> pa.probe_id
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
    def q_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
        """IVF with a TRAINED index: nlist ≈ sqrt(n) centroids from 2
        Lloyd iterations (kmeans_train, round_to=6 so both engines
        feed identical centroids into each next step) over
        deterministic seeds (first nlist vectors), searched with
        nprobe=4. Completes the 100 TB ANN story: sim_ivf_topk's
        centroids were oracle-pinned INPUTS; here the build is part of
        the engine. Scale shape: training is n_iter broadcast
        assign + (cluster, dim) partial-agg passes; search scans
        ~nprobe/nlist of the corpus through one equi-join on the list
        id. Recall-vs-brute measured in tests/test_similarity.py
        (planted-cluster corpus ≥0.9 at nprobe=4; near-random
        embeddings need nprobe ≈ nlist/2 — the curse-of-dimensionality
        regime documented there)."""
        from build_datawarehouse_demo_spark.operators.similarity import (
            ivf_topk,
            kmeans_train,
        )

        emb = _t(spark, sf_dir, "embeddings")
        n = emb.count()
        nlist = max(2, math.ceil(math.sqrt(n)))
        seeds = emb.filter(F.col("vec_id") < nlist).select(
            F.col("vec_id").alias("centroid_id"), "embedding"
        )
        cents = kmeans_train(emb, seeds, n_iter=2, round_to=6)
        probes = emb.filter(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("probe_id"), "embedding"
        )
        return ivf_topk(emb, cents, probes, k=5, nprobe=_NPROBE)
