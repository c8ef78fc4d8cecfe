"""dd05 LSH recall regression gate: the multi-probe config must keep
recalling planted near-dup pairs. Uses a small planted corpus (cosine
exactly known by construction) so the bound is stable — the sf corpora
have no pairs above 0.8, which is the production-analog threshold the
round-3 verdict asked to be measured (full figures: tools/dd05_recall.py
and PLANS.md §8)."""

import math
import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rsmetacheck_spark.queries import dd05_embedding_pairs


@pytest.fixture(scope="module")
def planted_sf():
    rng = np.random.default_rng(123)
    n_base, n_pairs = 400, 80
    base = rng.normal(size=(n_base, 64))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows, true_pairs = [base], []
    for i in range(n_pairs):
        u = base[i]
        c = rng.uniform(0.8, 0.95)
        w = rng.normal(size=64)
        w -= (w @ u) * u
        w /= np.linalg.norm(w)
        rows.append((c * u + math.sqrt(1 - c * c) * w)[None, :])
        true_pairs.append((i, n_base + i))
    vecs = np.vstack(rows).astype(np.float32)
    d = tempfile.mkdtemp(prefix="dd05_recall_sf_")
    pq.write_table(
        pa.table({
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs],
                                  pa.list_(pa.float32())),
        }),
        os.path.join(d, "embeddings.parquet"),
    )
    return d, true_pairs


def test_dd05_recall_at_production_threshold(spark, planted_sf):
    sf, true_pairs = planted_sf
    got = {(r.id_a, r.id_b) for r in dd05_embedding_pairs(spark, sf).collect()}
    hit = sum(1 for p in true_pairs if p in got)
    recall = hit / len(true_pairs)
    assert recall >= 0.9, f"planted cos>=0.8 recall {recall:.2f} < 0.9"
