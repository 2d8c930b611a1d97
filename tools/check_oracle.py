"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark at a scale-factor dir, runs the
matching ``oracle_sql()`` in DuckDB over the same parquet, and compares
row count + column names + an order-insensitive value hash.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time
import traceback

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def _norm_cell(v) -> str:
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "<null>"
    if isinstance(v, float):
        if math.isinf(v):
            return "inf" if v > 0 else "-inf"
        # tolerate last-bit noise: queries are designed to be exact, this
        # guards the comparison itself
        return f"{v:.9g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_norm_cell(x)}" for k, x in sorted(v.items())) + "}"
    return str(v)


def _hash_frame(pdf) -> tuple[int, list[str], str]:
    cols = sorted(pdf.columns)
    rows = ["\x01".join(_norm_cell(v) for v in rec) for rec in pdf[cols].itertuples(index=False, name=None)]
    rows.sort()
    h = hashlib.md5("\x02".join(rows).encode()).hexdigest()
    return len(pdf), cols, h


def _dtype_kind(series) -> str:
    """Normalize a pandas column to a comparable type kind — catches
    pandas-level divergence (float64 vs Int64 nullable ints, date vs
    datetime objects) that an order-insensitive value hash with float
    normalization can mask but the driver's schema compare may not."""
    s = str(series.dtype)
    if s.startswith(("int", "uint", "Int", "UInt")):
        return "int"
    if s.startswith(("float", "Float")):
        return "float"
    if s.startswith("datetime"):
        return "ts"
    if s == "bool":
        return "bool"
    if s == "object":
        import datetime

        for v in series.head(50):
            if v is None:
                continue
            if isinstance(v, str):
                return "str"
            if isinstance(v, bool):
                return "bool"
            if isinstance(v, int):
                return "int"
            if isinstance(v, float):
                return "float"
            if isinstance(v, datetime.datetime):
                return "ts"
            if isinstance(v, datetime.date):
                return "date"
            return type(v).__name__
        return "allnull"
    return s


def _dtype_mismatches(sp, du) -> list[str]:
    out = []
    for c in sorted(set(sp.columns) & set(du.columns)):
        k1, k2 = _dtype_kind(sp[c]), _dtype_kind(du[c])
        if k1 != k2 and "allnull" not in (k1, k2):
            out.append(f"{c}: {k1} vs {k2}")
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and os.path.isdir(sys.argv[1]) else "/root/testdata/sf0.01"
    only = set(a for a in sys.argv[1:] if not os.path.isdir(a))

    import __spark_entry__ as entrymod
    from build_datawarehouse_demo_spark.session import get_spark

    spark = get_spark("check_oracle")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{p}'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sp = fn(spark, sf_dir).toPandas()
        except Exception:
            print(f"FAIL {name}: spark raised")
            traceback.print_exc()
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows-only ({len(sp)} rows, {time.time()-t0:.1f}s) — no oracle")
            continue
        try:
            du = con.execute(oracles[name]).fetchdf()
        except Exception:
            print(f"FAIL {name}: duckdb oracle raised")
            traceback.print_exc()
            failures.append(name)
            continue
        (n1, c1, h1), (n2, c2, h2) = _hash_frame(sp), _hash_frame(du)
        dtype_bad = _dtype_mismatches(sp, du)
        status = "PASS" if (n1, c1, h1) == (n2, c2, h2) and not dtype_bad else "FAIL"
        detail = ""
        if status == "FAIL":
            failures.append(name)
            if n1 != n2:
                detail = f" rows {n1} vs {n2}"
            elif c1 != c2:
                detail = f" cols {c1} vs {c2}"
            elif dtype_bad:
                detail = f" dtype {dtype_bad}"
            else:
                detail = f" value-hash mismatch ({n1} rows)"
        print(f"{status} {name}: {time.time()-t0:.1f}s{detail}")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
