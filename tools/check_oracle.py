"""Local mimic of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB at sf0.01, compare row count +
column names + order-insensitive values.

Usage: python tools/check_oracle.py [--sf /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        # Tag: Python bool == int (True == 1), but the driver's value hash
        # is typed, so Spark BOOLEAN vs oracle INTEGER must fail here too.
        return ("bool", v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # Tag: Python 3.0 == 3, but the driver hashes typed values —
        # an int-valued DOUBLE (e.g. DuckDB HUGEINT fetched as float64)
        # vs Spark BIGINT must fail here too (the exact q32 r4 miss).
        return ("float", round(v, 9))
    if hasattr(v, "isoformat"):
        return v.isoformat()[:19]
    try:
        import decimal
        if isinstance(v, decimal.Decimal):
            # Keep Decimal DISTINCT from float: the driver's value hash is
            # typed, so Spark DECIMAL vs DuckDB DOUBLE must fail here too
            # (this exact class of bug slipped through in round 2 / ev08).
            return ("decimal", str(v))
    except Exception:
        pass
    return v


def norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in idx) for r in rows]
    return sorted(cols), sorted(out, key=repr)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as E
    from rsmetacheck_spark.session import get_spark

    spark = get_spark("check_oracle", cores=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(args.sf, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, oracles = E.queries(), E.oracle_sql()
    names = args.names or list(qs)
    n_fail = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:
            print(f"FAIL  {name}: spark error: {exc}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = [d[0] for d in rel.description]
            # Fetch via Arrow, not fetchall(): fetchall() downcasts DuckDB
            # HUGEINT to Python int (masking the q32-class typed-hash
            # divergence the driver sees), while Arrow surfaces it as
            # decimal128 — which norm_cell keeps distinct from int.
            tbl = rel.arrow()
            # POSITIONAL fetch (r5 advisor): to_pylist() indexes by
            # column NAME, so duplicate output column names would
            # silently collapse; zip the columns by position instead.
            cols = [tbl.column(i).to_pylist() for i in range(tbl.num_columns)]
            drows = list(zip(*cols)) if cols else []
        except Exception as exc:
            print(f"FAIL  {name}: duckdb error: {exc}")
            n_fail += 1
            continue
        sc, sr = norm_rows(scols, srows)
        dc, dr = norm_rows(dcols, drows)
        if sc != dc:
            print(f"FAIL  {name}: columns {sc} vs {dc}")
            n_fail += 1
        elif len(sr) != len(dr):
            print(f"FAIL  {name}: rowcount {len(sr)} vs {len(dr)}")
            n_fail += 1
        elif sr != dr:
            diffs = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
            print(f"FAIL  {name}: values differ; first diffs: {diffs}")
            n_fail += 1
        else:
            print(f"MATCH {name}: {len(sr)} rows [{time.time()-t0:.1f}s]")
    print(f"\n{len(names) - n_fail}/{len(names)} matched")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
