"""Measure dd05's LSH recall against brute-force cosine ground truth.

Ground truth: DuckDB all-pairs dot product over the unit vectors (N=2000
at sf0.1 -> 2M pairs, trivial at measurement scale). Recall(T) = fraction
of true pairs with cos >= T that dd05's LSH output contains. Run:

    python tools/dd05_recall.py [--sf /root/testdata/sf0.1]

Figures are recorded in PLANS.md §6.
"""
from __future__ import annotations

import argparse
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rsmetacheck_spark.queries import (  # noqa: E402
    COSINE_PAIR_T, DD05_PLANES, DD05_TABLES, dd05_embedding_pairs,
)
from rsmetacheck_spark.session import get_spark  # noqa: E402


def _plant(tmpdir: str, n_base: int = 1500, n_pairs: int = 300) -> str:
    """Synthesize an embeddings table with PLANTED near-dup pairs at known
    cosines in [0.75, 0.95] (the sf0.1 corpus has no pairs >= 0.8, so the
    production-analog recall figure needs planted ground truth). Partner =
    normalize(c*u + sqrt(1-c^2)*w_perp), giving exact cosine c."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(42)
    base = rng.normal(size=(n_base, 64))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = [base]
    for i in range(n_pairs):
        u = base[i]
        c = rng.uniform(0.75, 0.95)
        w = rng.normal(size=64)
        w -= (w @ u) * u
        w /= np.linalg.norm(w)
        rows.append((c * u + np.sqrt(1 - c * c) * w)[None, :])
    vecs = np.vstack(rows).astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float32())),
    })
    pq.write_table(tbl, os.path.join(tmpdir, "embeddings.parquet"))
    return tmpdir


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--plant", action="store_true",
                    help="use a synthetic corpus with planted cos>=0.75 pairs")
    args = ap.parse_args()
    if args.plant:
        import tempfile

        args.sf = _plant(tempfile.mkdtemp(prefix="dd05_plant_"))

    con = duckdb.connect()
    pq = os.path.join(args.sf, "embeddings.parquet")
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{pq}')")
    truth = {
        (a, b): c
        for a, b, c in con.execute(f"""
            WITH un AS (
              SELECT vec_id,
                     list_transform(embedding::DOUBLE[],
                       x -> x / sqrt(list_dot_product(embedding::DOUBLE[],
                                                      embedding::DOUBLE[]))) AS u
              FROM embeddings)
            SELECT a.vec_id, b.vec_id, ROUND(list_dot_product(a.u, b.u), 6) AS c
            FROM un a JOIN un b ON a.vec_id < b.vec_id
            WHERE ROUND(list_dot_product(a.u, b.u), 6) >= {COSINE_PAIR_T}
        """).fetchall()
    }

    spark = get_spark("dd05_recall", cores=8)
    spark.sparkContext.setLogLevel("ERROR")
    got = {(r.id_a, r.id_b) for r in dd05_embedding_pairs(spark, args.sf).collect()}

    print(f"config: K={DD05_PLANES} planes, L={DD05_TABLES} tables, probe-1")
    print(f"true pairs >= {COSINE_PAIR_T}: {len(truth)}   LSH pairs: {len(got)}")
    for t in (COSINE_PAIR_T, 0.6, 0.8):
        tp = {k for k, c in truth.items() if c >= t}
        hit = len(tp & got)
        print(f"recall @ cos>={t}: {hit}/{len(tp)} = {hit / max(1, len(tp)):.3f}")
    extra = got - set(truth)
    assert not extra, f"LSH emitted {len(extra)} pairs below threshold?!"


if __name__ == "__main__":
    main()
