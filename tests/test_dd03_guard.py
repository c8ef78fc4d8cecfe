"""dd03 hot-shingle guard observability: on a template-heavy corpus the
pair output is empty BY DESIGN (every shingle above the df>100 cap) — the
round-4 verdict asked that this mode be visible to users instead of
silent. Every pair row now carries `n_hot_dropped`, and dd03_drop_stats()
reports the dropped-shingle counters even when the pair set is empty."""

import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rsmetacheck_spark.queries import dd03_drop_stats, dd03_jaccard_pairs


def _write_docs(rows: list[tuple[int, str]]) -> str:
    d = tempfile.mkdtemp(prefix="dd03_guard_sf_")
    pq.write_table(
        pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "source": pa.array(["s0"] * len(rows)),
            "text": pa.array([r[1] for r in rows]),
            "lang": pa.array(["en"] * len(rows)),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }),
        os.path.join(d, "documents.parquet"),
    )
    return d


TEMPLATE = "alpha beta gamma delta"  # 4 tokens -> 2 shingles per doc


@pytest.fixture(scope="module")
def template_heavy_sf():
    # 120 identical template docs: both shingles hit df=120 > 100
    return _write_docs([(i, TEMPLATE) for i in range(120)])


def test_dd03_zero_result_mode_is_observable(spark, template_heavy_sf):
    pairs = dd03_jaccard_pairs(spark, template_heavy_sf)
    assert pairs.count() == 0  # the by-design silent mode...
    stats = dd03_drop_stats(spark, template_heavy_sf).collect()[0]
    # ...is explained by the audit row: 2 distinct shingles dropped,
    # 240 index rows, all 120 docs affected
    assert stats.n_hot_dropped == 2
    assert stats.n_index_rows_dropped == 240
    assert stats.n_docs_affected == 120


def test_dd03_pairs_carry_drop_counter(spark, template_heavy_sf):
    # add two near-dup docs with unique (cold) shingles: the guard still
    # drops the 2 template shingles, and the surviving pair row says so
    rows = [(i, TEMPLATE) for i in range(120)]
    rows += [
        (200, "one two three four five six"),
        (201, "one two three four five seven"),
    ]
    sf = _write_docs(rows)
    got = dd03_jaccard_pairs(spark, sf).collect()
    assert [(r.id_a, r.id_b) for r in got] == [(200, 201)]
    assert got[0].n_hot_dropped == 2
