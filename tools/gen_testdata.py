"""Deterministic synthetic-data generator matching the driver tables'
schemas and distribution shapes (TESTDATA.md), parameterized by scale
factor — exists to measure SCALING TRENDS beyond the provided sf0.1
(VERDICT round 5, next-round item 1: "the 100 TB claims currently rest
on plan reading, not measurement").

Row counts scale linearly exactly like the driver data
(sf0.1 -> lineitem 600k, sf1 -> 6M, ...); value domains, key ranges,
category sets, token vocabulary, and uniqueness characteristics mirror
the profiled sf0.1 data (see ROUND_NOTES round 6) so per-query work
grows the way a true sf1 slice would — in DEFAULT mode documents stay
~unique (no artificial duplicate clusters that would quadratically
inflate dedup OUTPUTS the way naive 10x copy-upsampling does).

DUPLICATE-HEAVY MODE (r13, VERDICT r12 item 7): ``dup_fraction`` > 0
rewrites that fraction of documents AND embeddings into exact-duplicate
groups whose sizes follow a Zipf(a=1.5) distribution clipped to
[2, 10% of the dup budget] — the boilerplate regime a real crawl is in
(a few enormous groups, a long tail of small ones). This is the
fixture the LSH skew arms run on: the default ~unique corpora
deliberately cannot exercise the hot-duplicate-group pair blowup the
r13 pre-collapse defends against (VERDICT r12, the one `weak` mark).
Group membership is contiguous trailing rows per group source, so the
duplicate structure is deterministic in (sf, seed).

NOT the driver's generator and NOT byte-identical to its tables; used
only for relative sf0.1 vs sf1 timing, never for oracle correctness.

Usage: python tools/gen_testdata.py <sf> [outdir] [dup_fraction] [dup_max_group]
e.g.   python tools/gen_testdata.py 1 testdata_local/sf1
       python tools/gen_testdata.py 1 testdata_local/sf1dup 0.5
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = (
    "key agg row scan slow fast table value part hash merge batch spark a the "
    "line sort window plan join group order filter shuffle stage task node disk "
    "cache query"
).split()  # 31 tokens, same flavor/cardinality as the driver docs
EVENT_TYPES = ["view", "click", "signup", "purchase", "error"]
LANGS = ["en", "en", "en", "de", "es", "fr", "zh"]  # ~41% en like sf0.1
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["ECONOMY", "STANDARD", "LARGE", "MEDIUM", "SMALL", "PROMO"]
PNOUNS = "ring bolt screw washer nut gear shaft plate rod pin".split()
PADJ = "large hot small cold red blue green slick shiny matte".split()

DAY_US = 86_400_000_000


def _write(path: str, cols: dict) -> None:
    pq.write_table(pa.table(cols), path, compression="snappy")
    print(f"  {os.path.basename(path)}: {len(next(iter(cols.values())))} rows")


def _zipf_group_sizes(rng, budget: int, max_group: int | None = None) -> list[int]:
    """Duplicate-group sizes summing to ~budget: Zipf(a=1.5) clipped to
    [2, cap] — a few huge groups plus a long tail, the shape crawl
    boilerplate has. cap defaults to budget // 10 (groups grow with the
    corpus — the worst case for banding-stage skew); pass an absolute
    ``max_group`` for SCALE fixtures, where a corpus-proportional cap
    would make the quadratic within-group pair OUTPUT dominate the
    measurement (any pair-emitting operator is output-bound at
    exponent ~2 then, regardless of implementation — the r8
    simhash_near_pairs lesson). A fixed cap keeps pair output linear
    in n, so the curve measures the banding/verify stages."""
    cap = max(2, budget // 10) if max_group is None else max(2, max_group)
    sizes: list[int] = []
    left = budget
    while left >= 2:
        s = int(min(max(2, rng.zipf(1.5)), cap, left))
        sizes.append(s)
        left -= s
    return sizes


def generate(
    sf: float, out: str, dup_fraction: float = 0.0, dup_max_group: int | None = None
) -> None:
    os.makedirs(out, exist_ok=True)
    n_c = int(150_000 * sf)
    n_s = int(10_000 * sf)
    n_p = int(200_000 * sf)
    n_o = int(1_500_000 * sf)
    n_e = int(1_000_000 * sf)
    n_u = int(15_000 * sf)
    n_d = int(50_000 * sf)
    n_v = int(20_000 * sf)

    rng = np.random.default_rng(42)

    _write(
        f"{out}/region.parquet",
        {
            "r_regionkey": np.arange(5, dtype=np.int32),
            "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
        },
    )
    _write(
        f"{out}/nation.parquet",
        {
            "n_nationkey": np.arange(25, dtype=np.int32),
            "n_name": [f"NATION_{i}" for i in range(25)],
            "n_regionkey": (np.arange(25) % 5).astype(np.int32),
        },
    )
    _write(
        f"{out}/customer.parquet",
        {
            "c_custkey": np.arange(n_c, dtype=np.int64),
            "c_name": [f"Customer#{i:09d}" for i in range(n_c)],
            "c_nationkey": rng.integers(0, 25, n_c).astype(np.int32),
            "c_acctbal": np.round(rng.uniform(-999, 9999, n_c), 2),
            "c_mktsegment": np.array(SEGMENTS)[rng.integers(0, 5, n_c)],
        },
    )
    _write(
        f"{out}/supplier.parquet",
        {
            "s_suppkey": np.arange(n_s, dtype=np.int64),
            "s_name": [f"Supplier#{i:09d}" for i in range(n_s)],
            "s_nationkey": rng.integers(0, 25, n_s).astype(np.int32),
            "s_acctbal": np.round(rng.uniform(-999, 9999, n_s), 2),
        },
    )
    _write(
        f"{out}/part.parquet",
        {
            "p_partkey": np.arange(n_p, dtype=np.int64),
            "p_name": [
                f"{PADJ[a]} {PNOUNS[b]}"
                for a, b in zip(rng.integers(0, 10, n_p), rng.integers(0, 10, n_p))
            ],
            "p_brand": [f"Brand#{i}" for i in rng.integers(1, 26, n_p)],
            "p_type": np.array(PTYPES)[rng.integers(0, 6, n_p)],
            "p_size": rng.integers(1, 51, n_p).astype(np.int32),
            "p_retailprice": np.round(900 + np.arange(n_p) % 1000 * 0.1, 2),
        },
    )

    # orders: dates uniform 1995-01-01 .. 2001-08-01 (driver range)
    d0 = np.datetime64("1995-01-01", "us").astype(np.int64)
    d1 = np.datetime64("2001-08-01", "us").astype(np.int64)
    odate = (d0 + (rng.integers(0, (d1 - d0) // DAY_US + 1, n_o)) * DAY_US).astype(
        "datetime64[us]"
    )
    _write(
        f"{out}/orders.parquet",
        {
            "o_orderkey": np.arange(n_o, dtype=np.int64),
            "o_custkey": rng.integers(0, n_c, n_o),
            "o_orderstatus": np.array(["O", "P", "F"])[rng.integers(0, 3, n_o)],
            "o_totalprice": np.round(rng.uniform(900, 450_000, n_o), 2),
            "o_orderdate": odate,
            "o_orderpriority": np.array(PRIORITIES)[rng.integers(0, 5, n_o)],
        },
    )

    # lineitem: 1 + Poisson(3.075) lines/order (matches avg 4.075,
    # max ~17 tail), shipdate uniform in the same range (profiled
    # independent of orderdate in the driver data)
    lpo = 1 + rng.poisson(3.075, n_o)
    lpo = np.minimum(lpo, 17)
    n_l = int(lpo.sum())
    l_orderkey = np.repeat(np.arange(n_o, dtype=np.int64), lpo)
    linenumber = (np.arange(n_l) - np.repeat(np.cumsum(lpo) - lpo, lpo) + 1).astype(
        np.int32
    )
    sdate = (d0 + (rng.integers(0, (d1 - d0) // DAY_US + 61, n_l)) * DAY_US).astype(
        "datetime64[us]"
    )
    _write(
        f"{out}/lineitem.parquet",
        {
            "l_orderkey": l_orderkey,
            "l_partkey": rng.integers(0, n_p, n_l),
            "l_suppkey": rng.integers(0, n_s, n_l),
            "l_linenumber": linenumber,
            "l_quantity": rng.integers(1, 51, n_l).astype(np.float64),
            "l_extendedprice": np.round(rng.uniform(900, 105_000, n_l), 2),
            "l_discount": np.round(rng.integers(0, 11, n_l) * 0.01, 2),
            "l_tax": np.round(rng.integers(0, 9, n_l) * 0.01, 2),
            "l_returnflag": np.array(["A", "N", "R"])[rng.integers(0, 3, n_l)],
            "l_linestatus": np.array(["F", "O"])[rng.integers(0, 2, n_l)],
            "l_shipdate": sdate,
        },
    )

    # events: 30 days of 2024-01, microsecond ts, sorted by ts
    t0 = np.datetime64("2024-01-01", "us").astype(np.int64)
    ts = np.sort(t0 + rng.integers(0, 30 * DAY_US, n_e))
    _write(
        f"{out}/events.parquet",
        {
            "event_id": np.arange(n_e, dtype=np.int64),
            "ts": ts.astype("datetime64[us]"),
            "user_id": rng.integers(0, n_u, n_e),
            "event_type": np.array(EVENT_TYPES)[rng.integers(0, 5, n_e)],
            "value": np.round(rng.uniform(0, 561, n_e), 2),
            "props": np.char.add(
                np.char.add('{"k": ', rng.integers(0, 100, n_e).astype(str)), "}"
            ),
        },
    )

    # documents: 10..100 tokens from the 31-word vocab, ~unique texts
    tok_counts = rng.integers(10, 101, n_d)
    flat = rng.integers(0, len(VOCAB), int(tok_counts.sum()))
    voc = np.array(VOCAB)
    offs = np.concatenate([[0], np.cumsum(tok_counts)])
    texts = [" ".join(voc[flat[offs[i] : offs[i + 1]]]) for i in range(n_d)]
    if dup_fraction > 0:
        sizes = _zipf_group_sizes(rng, int(n_d * dup_fraction), dup_max_group)
        pos = n_d - sum(sizes)
        print(
            f"  documents dup groups: {len(sizes)} groups, "
            f"{sum(sizes)} rows, max group {max(sizes)}"
        )
        for s in sizes:
            texts[pos : pos + s] = [texts[pos]] * s
            pos += s
    _write(
        f"{out}/documents.parquet",
        {
            "doc_id": np.arange(n_d, dtype=np.int64),
            "text": texts,
            "lang": np.array(LANGS)[rng.integers(0, len(LANGS), n_d)],
            "source": np.char.add("src", rng.integers(0, 20, n_d).astype(str)),
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        },
    )

    # embeddings: 64-d L2-normalized gaussians, float32
    vecs = rng.standard_normal((n_v, 64)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    if dup_fraction > 0:
        vsizes = _zipf_group_sizes(rng, int(n_v * dup_fraction), dup_max_group)
        vpos = n_v - sum(vsizes)
        print(
            f"  embeddings dup groups: {len(vsizes)} groups, "
            f"{sum(vsizes)} rows, max group {max(vsizes)}"
        )
        for s in vsizes:
            vecs[vpos : vpos + s] = vecs[vpos]
            vpos += s
    _write(
        f"{out}/embeddings.parquet",
        {
            "vec_id": np.arange(n_v, dtype=np.int64),
            "embedding": pa.array(
                list(vecs), type=pa.list_(pa.field("element", pa.float32()))
            ),
            "label": rng.integers(0, 10, n_v).astype(np.int32),
        },
    )


if __name__ == "__main__":
    sf = float(sys.argv[1])
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "testdata_local",
            f"sf{sys.argv[1]}",
        )
    )
    dup = float(sys.argv[3]) if len(sys.argv) > 3 else 0.0
    cap = int(sys.argv[4]) if len(sys.argv) > 4 else None
    print(f"generating sf={sf} into {out} (dup_fraction={dup}, dup_max_group={cap})")
    generate(sf, out, dup_fraction=dup, dup_max_group=cap)
