"""Physical-plan shape assertions: the scale claims in docstrings are
checked against the actual Catalyst plans, not just asserted in prose.

- cross-evidence detectors (ev01-ev08) are pure per-row map work: their
  plans contain NO Exchange (zero shuffle)
- dd05/sim04 candidate generation is equi-join only: no CartesianProduct
  and no BroadcastNestedLoopJoin anywhere in the plan
- q02's small dims join as BroadcastHashJoin
- q23's aggregates are partial (map-side combine) before the shuffle
"""

from __future__ import annotations

import pytest

from rsmetacheck_spark import evidence as EV
from rsmetacheck_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", sorted(EV._FAMILIES))
def test_evidence_detectors_zero_shuffle(spark, name):
    fn, _ = REGISTRY[name]
    plan = _plan(fn(spark, SF))
    assert "Exchange" not in plan, f"{name} shuffles:\n{plan[:2000]}"


@pytest.mark.parametrize("name", ["dd05_embedding_pairs", "sim04_batch_knn"])
def test_no_unblocked_joins(spark, name):
    fn, _ = REGISTRY[name]
    plan = _plan(fn(spark, SF))
    assert "CartesianProduct" not in plan, plan[:2000]
    assert "BroadcastNestedLoopJoin" not in plan, plan[:2000]


def test_q02_broadcasts_dims(spark):
    fn, _ = REGISTRY["q02_revenue_by_nation"]
    plan = _plan(fn(spark, SF))
    assert "BroadcastHashJoin" in plan


def test_q25_bounded_window(spark):
    """q25's cumsum/rank windows must run over the 30-row top-k, never the
    full distinct vocabulary: the plan has to show TakeOrderedAndProject
    (per-partition top-k + tiny merge) BELOW the Window, and the Window's
    input must not be the raw aggregate output. An unpartitioned Window
    over the full vocab sorts 10^9+ tokens in ONE task at corpus scale."""
    fn, _ = REGISTRY["q25_vocab_coverage"]
    plan = _plan(fn(spark, SF))
    assert "TakeOrderedAndProject" in plan, plan[:3000]
    # the global sort for the window must come AFTER the limit: i.e. no
    # full `Sort ... global=true` below TakeOrderedAndProject's input
    take_pos = plan.index("TakeOrderedAndProject")
    window_pos = plan.index("Window")
    assert window_pos < take_pos, (
        "Window must consume the TakeOrdered output (appear above it in "
        f"the tree):\n{plan[:3000]}"
    )


def test_q27_broadcasts_benchmark_grams(spark):
    """The contamination check must join the (small by construction)
    benchmark gram set as a broadcast — a shuffled join here would move
    the full corpus gram table at 100 TB scale."""
    fn, _ = REGISTRY["q27_contamination"]
    plan = _plan(fn(spark, SF))
    assert "BroadcastHashJoin" in plan, plan[:3000]


def test_q23_partial_aggregation(spark):
    fn, _ = REGISTRY["q23_tfidf_terms"]
    plan = _plan(fn(spark, SF))
    # HashAggregate appears both below (partial) and above (final) the
    # exchange; a plan without partial aggregation would ship raw terms
    assert plan.count("HashAggregate") >= 2 and "Exchange" in plan


def test_q32_sharded_window(spark):
    """Pack assignment's doc-level window must be keyed by
    (source, shard): a per-source-only window sorts one source's entire
    stream in a single task at corpus scale. The shard-base table (rows =
    docs/shard_size) must join back broadcast, not shuffled."""
    fn, _ = REGISTRY["q32_pack_assignments"]
    plan = _plan(fn(spark, SF))
    assert "BroadcastHashJoin" in plan, plan[:3000]
    win_lines = [ln for ln in plan.splitlines() if "Window" in ln]
    assert any("shard" in ln for ln in win_lines), plan[:3000]
    # doc-level rows shuffle once, into the (source, shard) window
    doc_exchanges = [
        ln for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln and "shard" in ln
    ]
    assert doc_exchanges, plan[:3000]


def test_q33_partial_agg_single_exchange(spark):
    """Split assignment is a pure per-row projection + one map-side
    combined groupBy — the split decision itself must not shuffle."""
    fn, _ = REGISTRY["q33_split_assign"]
    plan = _plan(fn(spark, SF))
    assert plan.count("Exchange") == 1, plan[:3000]
    assert plan.count("HashAggregate") >= 2


def test_sim05_broadcasts_probed_cells(spark):
    """IVF multi-probe must broadcast the 2-row probe set; the corpus
    side joins by cell label without moving."""
    fn, _ = REGISTRY["sim05_ivf_multiprobe"]
    plan = _plan(fn(spark, SF))
    assert "BroadcastHashJoin" in plan, plan[:3000]
    assert "CartesianProduct" not in plan


def test_km01_map_only_assignment(spark):
    """k-means assignment must be a map-only projection (centroids are
    literals, not a joined table): no join operator anywhere, and the
    only exchange is the final bounded groupBy(cluster, dim) — partial
    HashAggregate below it, final above."""
    fn, _ = REGISTRY["km01_kmeans_iteration"]
    plan = _plan(fn(spark, SF))
    assert "Join" not in plan, plan[:3000]
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange") == 1, plan[:3000]
    assert plan.count("HashAggregate") >= 2


def test_dd09_broadcasts_filter_bits(spark):
    """The Bloom bit table (≤ m rows regardless of corpus size) must
    broadcast to the incoming scan; the incoming corpus must never be
    sort-merge joined."""
    fn, _ = REGISTRY["dd09_bloom_prefilter"]
    plan = _plan(fn(spark, SF))
    assert "BroadcastHashJoin" in plan, plan[:3000]
    assert "SortMergeJoin" not in plan, plan[:3000]


def test_q35_two_phase_partials(spark):
    """Salted aggregation: phase 1 keys on (source, salt) — the salt
    must appear in a hash-partitioned exchange — and every aggregate is
    map-side combined (partial + final HashAggregate pairs)."""
    fn, _ = REGISTRY["q35_salted_source_stats"]
    plan = _plan(fn(spark, SF))
    salted_exchanges = [
        ln for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln and "salt" in ln
    ]
    assert salted_exchanges, plan[:3000]
    assert plan.count("HashAggregate") >= 4


def test_q36_single_corpus_shuffle(spark):
    """The quantile sketch reads the corpus once: exactly one exchange
    is keyed by the raw row reduction (source, bin); the window and
    final agg run over the tiny binned table."""
    fn, _ = REGISTRY["q36_binned_quantiles"]
    plan = _plan(fn(spark, SF))
    assert plan.count("HashAggregate") >= 2
    bin_exchanges = [
        ln for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln and "bin" in ln
    ]
    assert bin_exchanges, plan[:3000]


def test_dc01_bounded_partials(spark):
    """The sketch's corpus-reading aggregates must be map-side combined
    (partial + final pairs) — the whole point is per-partition state
    capped at sources x m."""
    fn, _ = REGISTRY["dc01_distinct_sketch"]
    plan = _plan(fn(spark, SF))
    assert plan.count("HashAggregate") >= 4, plan[:3000]


def test_q37_broadcasts_count_table(spark):
    """Held-out scoring must join the (vocab-bounded) train count table
    broadcast; the held-out bigram stream must not be sort-merge
    joined."""
    fn, _ = REGISTRY["q37_bigram_coverage"]
    plan = _plan(fn(spark, SF))
    assert "BroadcastHashJoin" in plan, plan[:3000]
    assert "SortMergeJoin" not in plan, plan[:3000]


def test_sim07_map_only_encode_and_score(spark):
    """PQ encode + ADC scoring must be map-only (codebook and ADC table
    are literals): no join operator, no exchange beyond TakeOrdered's
    final gather."""
    fn, _ = REGISTRY["sim07_pq_adc_topk"]
    plan = _plan(fn(spark, SF))
    assert "Join" not in plan, plan[:3000]
    assert "TakeOrderedAndProject" in plan, plan[:3000]


def test_sim06_rescore_joins_candidates_broadcast(spark):
    """The exact-rescore stage must join the float vectors against the
    BROADCAST k*oversample candidate set only — no sort-merge join, no
    second full-corpus sort (the final order is TakeOrdered over the
    candidate rows)."""
    fn, _ = REGISTRY["sim06_quantized_topk"]
    plan = _plan(fn(spark, SF))
    assert "BroadcastHashJoin" in plan, plan[:3000]
    assert "SortMergeJoin" not in plan, plan[:3000]
    assert "TakeOrderedAndProject" in plan, plan[:3000]


def test_q38_single_group_exchange(spark):
    """BFD packing must pay exactly ONE hash exchange (the (source,
    shard) grouping feeding the Arrow grouped-map stage); the oversize
    routing branch is map-only off the same scan."""
    fn, _ = REGISTRY["q38_binpack_bfd"]
    plan = _plan(fn(spark, SF))
    assert "FlatMapGroupsInPandas" in plan, plan[:3000]
    assert plan.count("Exchange hashpartitioning") == 1, plan[:3000]
    assert "Join" not in plan, plan[:3000]
