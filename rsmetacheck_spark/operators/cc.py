"""Connected components via alternating large-star/small-star.

The dedup-group former (dd06) and any other pair-graph consumer need
connected components at 100 TB scale, where plain min-label propagation
is wrong-shaped: its round count equals the component DIAMETER, so one
pathological million-member duplicate chain means a million join rounds.
Large-star/small-star (Kiveris et al., "Connected Components in MapReduce
and Beyond", SoCC'14) contracts the edge set toward stars — every node
edged directly to its component minimum — in a number of rounds that
grows with log(n) regardless of diameter. Each half-round is one
groupBy-min plus one equi-join; no driver-side graph state ever exists.

Semantics of one round over the canonical edge set (directed (a, b) with
b < a, distinct):

  large-star  every node u connects each LARGER neighbor v to
              m = min(N(u) ∪ {u})            — emit (v, m)
  small-star  every node u connects each SMALLER neighbor and itself to
              m = min(N<(u) ∪ {u})           — emit (v, m) and (u, m)

Both preserve connectivity; the fixed point is the star set
{(v, min_C) : v ∈ C, v ≠ min_C}. Convergence is ONE driver action per
round — (count, bit_xor(xxhash64)) over the distinct edge set — and each
round's edges are checkpointed to scratch parquet so lineage stays one
round deep (plan shape identical every round).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CheckpointFn = Callable[[DataFrame, str], DataFrame]


def largestar_components(
    pairs: DataFrame,
    checkpoint: CheckpointFn,
    max_rounds: int = 50,
    stats_out: dict | None = None,
) -> DataFrame:
    """Pair graph -> component labels.

    pairs: DataFrame with columns (id_a, id_b), id_a < id_b per row.
    checkpoint: (df, tag) -> materialized df (scratch-parquet round barrier).
    stats_out: optional dict, receives {"rounds": n} for tests/benchmarks.

    Returns DataFrame[doc_id, group_rep] with group_rep = min reachable id,
    covering every node that appears in `pairs`.
    """
    edges = checkpoint(
        pairs.selectExpr("id_b AS a", "id_a AS b").distinct(), "cc_edges"
    )

    def _stats(e: DataFrame) -> tuple:
        # bit_xor: order-independent, overflow-free (ANSI-safe), and exact
        # over a DISTINCT edge set (no duplicate self-cancellation)
        row = e.agg(
            F.count("*").alias("n"), F.bit_xor(F.xxhash64("a", "b")).alias("h")
        ).first()
        return (row.n, row.h)

    prev = _stats(edges)
    rounds = 0
    for _round in range(max_rounds):
        # large-star: u connects every LARGER neighbor to m = min(N(u)∪{u})
        sym = edges.selectExpr("a AS u", "b AS v").unionByName(
            edges.selectExpr("b AS u", "a AS v")
        )
        mins = sym.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        large = (
            sym.filter("v > u").join(mins, "u")
            .selectExpr("v AS a", "m AS b").filter("a <> b")
        )
        # small-star: u connects every SMALLER neighbor and itself to
        # m = min(N<(u) ∪ {u}); input is already (a, b) with b < a.
        # No dedup between the stars: duplicate emissions are absorbed by
        # the min-aggregate and the final distinct — one less shuffle.
        # `large` is consumed TWICE below (the min aggregate and the join
        # probe side); materialize it once so the large-star subtree isn't
        # recomputed inside the round's checkpoint job.
        le = checkpoint(large, f"cc_large_{_round}")
        minsle = le.groupBy("a").agg(F.min("b").alias("m"))
        small = (
            le.join(minsle, "a").filter("b <> m")
            .selectExpr("b AS a", "m AS b")
            .unionByName(minsle.selectExpr("a", "m AS b"))
            .filter("a <> b")
        )
        edges = checkpoint(small.distinct(), f"cc_star_{_round}")
        rounds += 1
        cur = _stats(edges)
        if cur == prev:
            break
        prev = cur
    else:  # pragma: no cover — log-round convergence makes 50 unreachable
        raise RuntimeError("largestar_components did not converge")
    if stats_out is not None:
        stats_out["rounds"] = rounds
    # fixed point = stars: every edge is (node, component_min)
    return (
        edges.selectExpr("a AS doc_id", "b AS group_rep")
        .unionByName(edges.selectExpr("b AS doc_id", "b AS group_rep"))
        .distinct()
    )
