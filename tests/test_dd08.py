"""dd08 incremental dedup: all three verdict branches must actually fire
on real testdata (sf0.1 carries 8 exact-dup clusters, 4 of them crossing
the odd/even batch split), and verdict semantics must hold."""

import pytest

from rsmetacheck_spark.queries import dd08_incremental_dedup

SF = "/root/testdata/sf0.1"


@pytest.fixture(scope="module")
def verdicts(spark):
    rows = dd08_incremental_dedup(spark, SF).collect()
    return {r.doc_id: r for r in rows}


def test_all_branches_fire(verdicts):
    kinds = {r.verdict for r in verdicts.values()}
    assert kinds == {"exact", "near", "new"}


def test_covers_exactly_the_incoming_batch(verdicts):
    assert all(d % 2 == 1 for d in verdicts)
    assert len(verdicts) == 2500  # sf0.1: 5000 docs, half odd


def test_known_exact_pairs(verdicts, spark):
    # sf0.1 ground truth (DuckDB-verified): these md5-identical pairs
    # cross the split; the odd member must resolve 'exact' to the even one
    for odd, even in ((1237, 4246), (2221, 1824), (4677, 1882), (1917, 3562)):
        odd, even = (odd, even) if odd % 2 == 1 else (even, odd)
        assert verdicts[odd].verdict == "exact", verdicts[odd]
        assert verdicts[odd].match_id == even


def test_match_id_null_iff_new(verdicts):
    for r in verdicts.values():
        assert (r.match_id is None) == (r.verdict == "new")
        if r.match_id is not None:
            assert r.match_id % 2 == 0  # matches point INTO the corpus
