"""Round-8 registry entries.

Theme (VERDICT r7): close the remaining scale-posture gaps — the
query-directed multiprobe composition for the auto-sized ANN lane —
and keep widening oracle-checked surface.

Same oracle discipline as registry_round7: exact integer / md5-derived
values wherever possible, identical aliases on both sides, pinned
constants derived from the driver fixture through the SAME functions
the implementation calls.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from build_datawarehouse_demo_spark.registry import register
from build_datawarehouse_demo_spark.registry_round7 import (
    _cos_sql,
    _driver_rows,
    _t,
)


def register_round8_ann() -> None:
    # ------------------------------------------------------------------
    # query-directed multiprobe over the auto-sized signature (VERDICT
    # r7 item 4): the Hamming-1 lane probes EVERY 1-bit flip (fanout
    # n_planes+1, recovers only 1-bit misses); the directed lane probes
    # all subsets of the T least-confident bits — constant 2^T fanout
    # and multi-bit-miss recovery, which is what holds recall once
    # auto-sizing grows the signature past ~12 planes
    # ------------------------------------------------------------------
    from build_datawarehouse_demo_spark.operators.similarity import (
        ann_auto_planes,
        rp_planes,
    )

    _N_EMB = _driver_rows("embeddings", 500)
    _PLANES = ann_auto_planes(_N_EMB)
    _T_BITS = 3
    _ap = rp_planes(_PLANES, 64)
    _sig_sql = " + ".join(
        f"(CASE WHEN list_dot_product(v, [{', '.join(str(x) for x in plane)}]) >= 0 "
        f"THEN {1 << i} ELSE 0 END)"
        for i, plane in enumerate(_ap)
    )
    _proj_union = " UNION ALL ".join(
        f"SELECT probe_id, {i} AS i, "
        f"list_dot_product(pv, [{', '.join(str(x) for x in plane)}]) AS proj FROM p"
        for i, plane in enumerate(_ap)
    )
    _mask_sum = " + ".join(f"b.b{t + 1} * m.ms[{t + 1}]" for t in range(_T_BITS))
    _bit_sources = ", ".join(
        f"(SELECT unnest([0,1]) AS b{t + 1}) s{t + 1}" for t in range(_T_BITS)
    )
    _bit_cols = ", ".join(f"s{t + 1}.b{t + 1} AS b{t + 1}" for t in range(_T_BITS))

    @register(
        "sim_ann_rp_lsh_auto_directed",
        oracle=f"""
        WITH e AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        sig AS (
          SELECT vec_id, v, CAST({_sig_sql} AS INTEGER) AS s FROM e
        ),
        p AS (SELECT vec_id AS probe_id, v AS pv, s FROM sig WHERE vec_id < 10),
        proj AS ({_proj_union}),
        masks AS (
          SELECT probe_id,
                 list(CAST(1 AS INTEGER) << i ORDER BY abs(proj), i) AS ms
          FROM proj GROUP BY probe_id
        ),
        variants AS (
          SELECT p.probe_id, p.pv,
                 CAST(xor(p.s, {_mask_sum}) AS INTEGER) AS s
          FROM p JOIN masks m ON m.probe_id = p.probe_id,
               (SELECT {_bit_cols} FROM {_bit_sources}) b
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
    def q_ann_lsh_auto_directed(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Auto-sized ANN search with QUERY-DIRECTED multiprobe
        (Lv et al., Multi-Probe LSH, VLDB 2007): for each probe, the T=3
        hyperplanes whose projections sit closest to zero are the ones
        a true neighbor most plausibly lands across, so all 2^3 subsets
        of those bit-flips are probed. Versus the Hamming-1 lane
        (sim_ann_rp_lsh_auto): constant fanout 8 instead of
        n_planes+1 (25 at the 24-plane auto ceiling), and it recovers
        MULTI-bit misses — the failure mode that dominates at wide
        auto signatures (recall-vs-n pytest in tests/test_similarity.py
        shows directed holding recall at a plane count where
        single-probe drops). Oracle mirrors the per-probe plane
        confidence ranking (ORDER BY abs(proj), i) bit for bit."""
        from build_datawarehouse_demo_spark.operators.similarity import (
            ann_rp_lsh_topk,
        )

        emb = _t(spark, sf_dir, "embeddings")
        probes = emb.filter(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("probe_id"), "embedding"
        )
        return ann_rp_lsh_topk(
            emb, probes, k=5, n_planes=None, dim=64, directed_flips=_T_BITS
        )


def _ensure_ivf_index(spark: SparkSession, sf_dir: str, force: bool = False):
    """Write the trained-IVF index once per (session, sf_dir) — the
    same single-slot memo contract as registry_extensions'
    _ensure_ann_index: the build entry always writes (it times the
    ingest), the search entry reuses a current build."""
    import math

    from build_datawarehouse_demo_spark.operators.similarity import build_ivf_index
    from build_datawarehouse_demo_spark.registry_extensions import (
        _bucketed_scratch_dir,
    )

    if not force and getattr(spark, "_graft_ivf_idx_key", None) == sf_dir:
        return spark.table("ivf_idx"), spark.table("ivf_idx_centroids")
    emb = _t(spark, sf_dir, "embeddings")
    n = emb.count()
    nlist = max(2, math.ceil(math.sqrt(n)))
    # explicit seeds = the oracle's c0 (vec_id < nlist); the default
    # orderBy+limit would coincide only for contiguous-from-0 ids
    seeds = emb.filter(F.col("vec_id") < nlist).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    out = build_ivf_index(
        emb, "ivf_idx", seeds=seeds, path=f"{_bucketed_scratch_dir()}/ivf_idx", n=n
    )
    spark._graft_ivf_idx_key = sf_dir
    return out


def register_round8_ivf_index() -> None:
    from build_datawarehouse_demo_spark.registry_round7 import (
        IVF_NPROBE,
        ivf_trained_search_sql,
        ivf_trained_with_block,
    )

    # ------------------------------------------------------------------
    # persisted trained-IVF index: build-once/search-many for the
    # linearized build — the amortization sim_index_build provides for
    # RP-LSH, applied to the trained coarse quantizer
    # ------------------------------------------------------------------
    @register(
        "sim_ivf_index_build",
        oracle=f"""
        {ivf_trained_with_block()}
        SELECT vec_id, cid AS centroid_id FROM lists
        """,
    )
    def q_ivf_index_build(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Trained-IVF ingest: sampled quantizer training + two-level
        list assignment persisted as catalog tables bucketed on the
        list id (build_ivf_index). Returns the (vec_id, centroid_id)
        projection of the stored lists (the vec column is an array,
        which hash checkers cannot canonicalize). Always-write
        (force=True): this entry IS the ingest cost."""
        lists, _ = _ensure_ivf_index(spark, sf_dir, force=True)
        return lists.select("vec_id", "centroid_id")

    @register("sim_ivf_index_search", oracle=ivf_trained_search_sql())
    def q_ivf_index_search(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Search the persisted trained-IVF index: probes route against
        the STORED centroids, lists come off the bucketed table —
        every query pays nlist routing + ~nprobe/nlist of the corpus,
        never the build. Same oracle as sim_ivf_trained (persistence
        must not change a single value)."""
        from build_datawarehouse_demo_spark.operators.similarity import (
            ivf_index_search_topk,
        )

        lists, cents = _ensure_ivf_index(spark, sf_dir)
        emb = _t(spark, sf_dir, "embeddings")
        probes = emb.filter(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("probe_id"), "embedding"
        )
        return ivf_index_search_topk(lists, cents, probes, k=5, nprobe=IVF_NPROBE)


def register_round8_spans() -> None:
    # ------------------------------------------------------------------
    # exact substring-duplication spans (Lee et al. 2022): the
    # within-document dedup the whole-doc family can't see —
    # boilerplate/licence/quotation spans recurring across otherwise
    # unique documents, with token positions for span removal
    # ------------------------------------------------------------------
    _W = 5

    @register(
        "dedup_substring_spans",
        oracle=f"""
        WITH toks AS (
          SELECT doc_id, string_split(text, ' ') AS t FROM documents
        ),
        grams AS (
          SELECT doc_id, CAST(i AS INTEGER) AS pos,
                 md5(array_to_string(t[i:i+{_W - 1}], ' ')) AS gram_md5
          FROM toks, unnest(generate_series(1, len(t) - {_W - 1})) AS s(i)
          WHERE len(t) >= {_W}
        ),
        dup AS (
          SELECT gram_md5, count(DISTINCT doc_id) AS n_docs
          FROM grams GROUP BY gram_md5 HAVING count(DISTINCT doc_id) >= 2
        )
        SELECT g.doc_id, g.pos, g.gram_md5, dup.n_docs
        FROM grams g JOIN dup USING (gram_md5)
        """,
    )
    def q_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Every {_W}-token window recurring in >= 2 distinct docs,
        with its 1-based token position (duplicate_substring_spans).
        Tokenization is a verbatim single-space split on BOTH sides —
        positions are raw offsets, so no normalization may shift them.
        Scale: two digest-keyed exchanges; documents never shuffle."""
        from build_datawarehouse_demo_spark.operators.dedup import (
            duplicate_substring_spans,
        )

        return duplicate_substring_spans(
            _t(spark, sf_dir, "documents"), window=_W, min_docs=2
        )

    @register(
        "dedup_doc_duplication_rate",
        oracle=f"""
        WITH toks AS (
          SELECT doc_id, string_split(text, ' ') AS t FROM documents
        ),
        grams AS (
          SELECT doc_id,
                 md5(array_to_string(t[i:i+{_W - 1}], ' ')) AS gram_md5
          FROM toks, unnest(generate_series(1, len(t) - {_W - 1})) AS s(i)
          WHERE len(t) >= {_W}
        ),
        dup AS (
          SELECT gram_md5 FROM grams
          GROUP BY gram_md5 HAVING count(DISTINCT doc_id) >= 2
        )
        SELECT g.doc_id,
               CAST(count(*) AS BIGINT) AS n_windows,
               CAST(count(d.gram_md5) AS BIGINT) AS n_dup_windows,
               round(count(d.gram_md5) * 1.0 / count(*), 6) AS dup_rate
        FROM grams g LEFT JOIN dup d USING (gram_md5)
        GROUP BY g.doc_id
        """,
    )
    def q_doc_dup_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Doc-level duplication score (fraction of {_W}-token windows
        recurring in >= 2 docs) — the filtering lever built on the
        span op: documents past a duplication threshold get dropped
        or downweighted in corpus mixing."""
        from build_datawarehouse_demo_spark.operators.dedup import (
            document_duplication_rate,
        )

        return document_duplication_rate(
            _t(spark, sf_dir, "documents"), window=_W, min_docs=2
        )

    @register(
        "text_remove_duplicate_spans",
        oracle=f"""
        WITH toks AS (
          SELECT doc_id, string_split(text, ' ') AS t FROM documents
        ),
        grams AS (
          SELECT doc_id, CAST(i AS INTEGER) AS pos,
                 md5(array_to_string(t[i:i+{_W - 1}], ' ')) AS g
          FROM toks, unnest(generate_series(1, len(t) - {_W - 1})) AS s(i)
          WHERE len(t) >= {_W}
        ),
        owners AS (
          SELECT g, min(doc_id) AS owner FROM grams
          GROUP BY g HAVING count(DISTINCT doc_id) >= 2
        ),
        removals AS (
          -- foreign-owned cover MINUS self-owned cover: a span's owner
          -- keeps that span intact even where a foreign-owned span
          -- overlaps it (the protection clause of the operator contract)
          SELECT DISTINCT gr.doc_id, gr.pos + q.off AS idx
          FROM grams gr
          JOIN owners o ON o.g = gr.g AND gr.doc_id <> o.owner,
               unnest(generate_series(0, {_W - 1})) AS q(off)
          EXCEPT
          SELECT DISTINCT gr.doc_id, gr.pos + q.off AS idx
          FROM grams gr
          JOIN owners o ON o.g = gr.g AND gr.doc_id = o.owner,
               unnest(generate_series(0, {_W - 1})) AS q(off)
        ),
        stream AS (
          SELECT doc_id, CAST(i AS INTEGER) AS idx, t[i] AS tok
          FROM toks, unnest(generate_series(1, len(t))) AS s(i)
        ),
        kept AS (
          SELECT s.doc_id,
                 array_to_string(list(s.tok ORDER BY s.idx), ' ') AS cleaned_text,
                 count(*) AS kept
          FROM stream s
          LEFT JOIN removals r ON r.doc_id = s.doc_id AND r.idx = s.idx
          WHERE r.idx IS NULL
          GROUP BY s.doc_id
        )
        SELECT b.doc_id,
               COALESCE(k.cleaned_text, '') AS cleaned_text,
               CAST(len(b.t) AS BIGINT) AS n_tokens,
               CAST(len(b.t) - COALESCE(k.kept, 0) AS BIGINT) AS n_tokens_removed
        FROM toks b LEFT JOIN kept k USING (doc_id)
        """,
    )
    def q_remove_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Span REMOVAL — the acting half of the Lee-et-al pipeline:
        each doc rebuilt with duplicated {_W}-token spans cut out,
        except in the span's global owner (min doc_id) — and a doc's
        self-owned spans are PROTECTED from overlapping foreign-owned
        spans — so one intact copy of every duplicated passage
        survives corpus-wide."""
        from build_datawarehouse_demo_spark.operators.dedup import (
            remove_duplicate_spans,
        )

        return remove_duplicate_spans(
            _t(spark, sf_dir, "documents"), window=_W, min_docs=2
        )


def register_round8_simhash_scalable() -> None:
    # ------------------------------------------------------------------
    # the scale-gate catch of r8: the SimHash PAIRS shape is
    # output-bound — identical signatures (Hamming 0) make a duplicate
    # cluster of k docs emit k(k-1)/2 pairs, and on clustered corpora
    # the OUTPUT grows ~quadratically (sf1→sf4: top cluster 3.5k→13k
    # docs, measured exponent 1.785 with zero algorithmic waste). The
    # scalable shape is collapse + representative-level pairs.
    # ------------------------------------------------------------------
    _SIG_SQL = _simhash_sig_sql()

    @register(
        "dedup_simhash_collapse",
        oracle=f"""
        WITH {_SIG_SQL}
        SELECT doc_id,
               min(doc_id) OVER (PARTITION BY simhash) AS canonical_id,
               count(*) OVER (PARTITION BY simhash) AS cluster_size
        FROM sigs
        """,
    )
    def q_simhash_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Radius-0 SimHash dedup at the auto width: every doc mapped
        to its exact-signature cluster's min-id canonical + cluster
        size — LINEAR however clustered the corpus (one exchange on
        the signature). The pairs lane this replaces in the headline
        is output-quadratic on clustered data (see
        operators/dedup.py:simhash_collapse)."""
        from build_datawarehouse_demo_spark.operators.dedup import (
            simhash,
            simhash_auto_width,
            simhash_collapse,
        )

        docs = _t(spark, sf_dir, "documents")
        w = simhash_auto_width(docs.count())
        return simhash_collapse(simhash(docs, bits=4 * w))

    @register(
        "dedup_simhash_rep_pairs",
        oracle=f"""
        WITH {_SIG_SQL},
        reps AS (
          SELECT simhash, min(doc_id) AS doc_id FROM sigs GROUP BY simhash
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
        FROM reps a JOIN reps b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
        """,
    )
    def q_simhash_rep_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Near pairs (Hamming <= 3) between cluster REPRESENTATIVES —
        one per distinct signature — via pigeonhole blocking:
        candidates scale with distinct signatures, not docs. The
        oracle is the brute representative cross (EXACTLY equivalent:
        pigeonhole with blocks > max_hamming misses nothing, so
        blocked+filter == brute filter)."""
        from build_datawarehouse_demo_spark.operators.dedup import (
            simhash,
            simhash_auto_width,
            simhash_rep_pairs,
        )

        docs = _t(spark, sf_dir, "documents")
        w = simhash_auto_width(docs.count())
        return simhash_rep_pairs(
            simhash(docs, bits=4 * w), max_hamming=3, blocks=4, bits=4 * w
        )


def register_round8_sampling() -> None:
    # ------------------------------------------------------------------
    # temperature-based corpus mixing: per-source quotas ∝ n^(1/T),
    # filled by deterministic hash rank — the multilingual rebalancing
    # lever (T=2: sqrt weighting, the IEEE-exact case)
    # ------------------------------------------------------------------
    _BUDGET = 200
    from build_datawarehouse_demo_spark.registry_round9 import (
        _driver_source_counts,
        _quota_values_sql,
    )

    @register(
        "sample_temperature_mix",
        oracle=f"""
        WITH tgt(source, quota) AS (
          {_quota_values_sql(_driver_source_counts("source"), _BUDGET, 2.0)}
        ),
        ranked AS (
          SELECT doc_id, source,
                 CAST(row_number() OVER (PARTITION BY source
                     ORDER BY CAST(('0x' || substr(md5('0:temp:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT),
                              doc_id) AS INTEGER) AS rnk
          FROM documents WHERE doc_id IS NOT NULL
        )
        SELECT r.doc_id, r.source, r.rnk, g.quota
        FROM ranked r JOIN tgt g ON g.source = r.source
        WHERE r.rnk <= g.quota
        """,
    )
    def q_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Sample a {_BUDGET}-doc mix with per-source quotas ∝
        sqrt(n_source) (temperature 2): tail sources up-weighted
        relative to natural proportions without flattening the head;
        the draw within each source is the md5-hash rank, so both
        engines pick the identical docs. r9: quotas now come from the
        exact-integer temperature_quotas contract; the oracle pins
        them via the SAME function at the fixture counts (the r6
        pinned-constant discipline), and the T=1 sibling in
        registry_round9 keeps a fully-SQL-independent quota oracle."""
        from build_datawarehouse_demo_spark.operators.sampling import (
            sample_temperature_mix,
        )

        docs = _t(spark, sf_dir, "documents", rebalance=False).select(
            "doc_id", "source"
        )
        return sample_temperature_mix(
            docs, "source", "doc_id", budget=_BUDGET
        ).select("doc_id", "source", "rnk", "quota")


def _simhash_sig_sql() -> str:
    """The auto-width SimHash signature as a DuckDB CTE block
    (tok/hashed/votes/sigs, ending with ``sigs`` (doc_id, simhash)) at
    the driver fixture's pinned width — the ONE definition shared by
    every r8 simhash oracle (collapse, rep-pairs, components); a
    signature-contract change edited here reaches them all."""
    from build_datawarehouse_demo_spark.operators.dedup import simhash_auto_width
    from build_datawarehouse_demo_spark.registry_extensions import _HASH32, _TOK

    n_docs = _driver_rows("documents", 500)
    sbits = 4 * simhash_auto_width(n_docs)
    shash = (
        _HASH32
        if sbits <= 32
        else "CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"
    )
    return f"""
        tok AS (
          SELECT DISTINCT doc_id, tok
          FROM documents, unnest({_TOK}) AS t(tok)
        ),
        hashed AS (
          SELECT doc_id, {shash.format(expr="'0:' || tok")} AS h FROM tok
        ),
        votes AS (
          SELECT doc_id, i AS bit,
                 sum(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) AS v
          FROM hashed, unnest(generate_series(0, {sbits - 1})) AS g(i)
          GROUP BY doc_id, i
        ),
        sigs AS (
          SELECT doc_id,
                 CAST(sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS simhash
          FROM votes GROUP BY doc_id
        )"""


def register_round8_multimodal() -> None:
    # ------------------------------------------------------------------
    # overlapped audio-style framing — completes the multimodal
    # plumbing family (video frames r5, image resize r5, metadata r5)
    # ------------------------------------------------------------------
    @register(
        "multimodal_audio_windows",
        oracle="""
        SELECT doc_id AS id,
               CAST(k AS INTEGER) AS win_idx,
               CAST(k * 8 AS INTEGER) AS win_off,
               CAST(16 AS INTEGER) AS n_bytes,
               CAST((SELECT sum(ord(substr(text, k * 8 + j + 1, 1)))
                     FROM unnest(generate_series(0, 15)) AS u(j)) AS BIGINT) AS energy,
               md5(substr(text, k * 8 + 1, 16)) AS win_md5
        FROM documents,
             unnest(generate_series(0, (octet_length(encode(text)) - 16) // 8)) AS g(k)
        WHERE octet_length(encode(text)) >= 16
        """,
    )
    def q_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Overlapping 16-byte windows at hop 8 (50% overlap — the
        audio STFT-framing shape) over binary payloads via mapInPandas:
        offsets, a deterministic energy feature (byte-value sum), and
        window digests. ASCII text payloads make substr == byte slice
        and ord == byte value, so SQL mirrors the Arrow-batch lane
        exactly (same contract as multimodal_frame_sample). The
        ASCII-only fixture invariant is ASSERTED, not assumed (ADVICE
        r8): DuckDB cannot slice BLOBs, so the oracle is char-based and
        would silently diverge on multi-byte text —
        tests/test_gen_testdata.py::test_documents_text_is_ascii fails
        loudly if the fixture ever grows non-ASCII documents."""
        from build_datawarehouse_demo_spark.operators.multimodal import (
            attach_binary,
            audio_windows,
        )

        return audio_windows(
            attach_binary(_t(spark, sf_dir, "documents")),
            window_bytes=16,
            hop_bytes=8,
        )


def register_round8_simhash_components() -> None:
    # ------------------------------------------------------------------
    # the fully-scalable SimHash dedup composition: collapse (linear)
    # -> representative near-pairs -> connected components over the
    # REP graph -> every doc to its final canonical. The scalable twin
    # of dedup_cluster_components, whose pair graph is doc-level.
    # ------------------------------------------------------------------
    @register(
        "dedup_simhash_components_scalable",
        oracle=f"""
        WITH RECURSIVE {_simhash_sig_sql()},
        reps AS (
          SELECT simhash, min(doc_id) AS rep_id FROM sigs GROUP BY simhash
        ),
        rpairs AS (
          SELECT a.rep_id AS id_a, b.rep_id AS id_b
          FROM reps a JOIN reps b ON a.rep_id < b.rep_id
          WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
        ),
        edges AS MATERIALIZED (
          SELECT id_a AS s, id_b AS d FROM rpairs
          UNION SELECT id_b, id_a FROM rpairs
        ),
        reach(s, d) AS (
          SELECT s, d FROM edges
          UNION SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s
        ),
        comp AS (SELECT s AS node, least(s, min(d)) AS component FROM reach GROUP BY s)
        SELECT sg.doc_id,
               COALESCE(c.component, r.rep_id) AS canonical_id
        FROM sigs sg
        JOIN reps r ON r.simhash = sg.simhash
        LEFT JOIN comp c ON c.node = r.rep_id
        """,
    )
    def q_simhash_components_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
        """End-to-end scalable SimHash dedup: exact-signature collapse
        (linear), near-pairs between distinct-signature
        REPRESENTATIVES only, large-star/small-star components over
        the rep graph (O(log n) rounds, node count = distinct sigs),
        then every doc resolves through its signature's rep to the
        component canonical. Identical final clustering to the
        doc-level dedup_cluster_components on any corpus (two docs
        with the same signature are Hamming-0 neighbors, so
        collapsing them first never changes components) at a fraction
        of the pair volume on clustered corpora."""
        from build_datawarehouse_demo_spark.operators.dedup import (
            connected_components_star,
            simhash,
            simhash_auto_width,
            simhash_rep_pairs,
        )

        docs = _t(spark, sf_dir, "documents")
        w = simhash_auto_width(docs.count())
        sigs = simhash(docs, bits=4 * w)
        reps = sigs.groupBy("simhash").agg(F.min("doc_id").alias("rep_id"))
        pairs = simhash_rep_pairs(sigs, max_hamming=3, blocks=4, bits=4 * w)
        comp = connected_components_star(pairs)
        return (
            sigs.join(reps, "simhash")
            .join(comp, F.col("rep_id") == F.col("node"), "left")
            .select(
                "doc_id",
                F.coalesce(F.col("component"), F.col("rep_id")).alias("canonical_id"),
            )
        )


def register_round8_asof() -> None:
    # ------------------------------------------------------------------
    # as-of NEAREST — completes the asof family (backward r4, forward
    # r6, tolerance r7): pandas merge_asof(direction='nearest') parity
    # with the backward-wins-ties rule
    # ------------------------------------------------------------------
    @register(
        "join_asof_nearest",
        oracle="""
        WITH v AS (
          SELECT event_id, user_id, epoch_us(ts) AS pt
          FROM events WHERE event_type = 'view'
        ),
        c AS (
          SELECT event_id AS click_id, user_id, epoch_us(ts) AS bt
          FROM events WHERE event_type = 'click'
        ),
        j AS (
          SELECT v.event_id, v.user_id, v.pt, c.click_id, c.bt,
                 row_number() OVER (PARTITION BY v.event_id
                     ORDER BY abs(c.bt - v.pt), c.bt, c.click_id DESC) AS rn
          FROM v LEFT JOIN c ON c.user_id = v.user_id
        )
        SELECT event_id, user_id, CAST(pt AS BIGINT) AS ts_us,
               click_id AS nearest_click_id, CAST(bt AS BIGINT) AS nearest_ts_us
        FROM j WHERE rn = 1
        """,
    )
    def q_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Nearest click (either direction in time) per view event per
        user: asof_join(direction='nearest') — backward and forward
        carries off ONE exchange, closer |Δt| wins, backward wins
        exact-distance ties, max click_id wins same-instant ties
        (build_order). The oracle states the same choice as a
        row_number over the full per-key cross — quadratic there,
        one shuffle here."""
        from build_datawarehouse_demo_spark.operators.asof import asof_join

        ev = _t(spark, sf_dir, "events", rebalance=False)
        us = F.unix_micros(F.col("ts").cast("timestamp"))
        views = ev.where(F.col("event_type") == "view").select(
            "event_id", "user_id", us.alias("ts_us")
        )
        clicks = ev.where(F.col("event_type") == "click").select(
            F.col("user_id"),
            us.alias("click_us"),
            F.col("event_id").alias("nearest_click_id"),
        )
        out = asof_join(
            views,
            clicks,
            key="user_id",
            probe_time="ts_us",
            build_time="click_us",
            build_cols=("nearest_click_id",),
            build_order=("nearest_click_id",),
            direction="nearest",
        )
        return out.select(
            "event_id",
            "user_id",
            "ts_us",
            "nearest_click_id",
            F.col("asof_time").alias("nearest_ts_us"),
        )
