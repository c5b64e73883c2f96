"""Distributed connected components — the clustering step after near-dup
candidate generation (LSH/Jaccard pairs → dedup GROUPS).

A dedup pipeline doesn't stop at pairs: (a,b) and (b,c) must collapse to
one cluster {a,b,c} with one survivor. That is connected components over
the near-dup graph.

Algorithm: min-label propagation to fixpoint. Every node starts labeled
with itself; each round every node takes the minimum label among itself
and its neighbors; converged when no label changes. Each round is one
hash join (labels ⨝ edges) + one groupBy min — both shuffle on node id,
so AQE/partitioning treat them like any aggregation. The round count is
the graph DIAMETER, and near-dup graphs are shallow (clusters are quasi-
cliques: LSH puts most dup pairs directly in the same bucket), so 3–5
rounds typically suffice; ``max_iter`` bounds pathological chains.

Scale notes (100 TB):
- Per-round driver work is ONE metadata-scale count (the convergence
  check); labels/edges never collect.
- Lineage is truncated every round (localCheckpoint) — without it the
  plan doubles per iteration and the job dies of planning, not data.
- For graphs with genuinely long chains (web link graphs, not near-dup
  graphs) the O(log n)-round alternating large-star/small-star algorithm
  (Kiveris et al., "Connected Components in MapReduce and Beyond",
  SoCC'14) drops in with the same join+min building blocks; label
  propagation is chosen here because near-dup diameters make the extra
  machinery pure overhead.

Reference parity: the reference has no graph operator (its dedup ends at
SQL joins); this is part of the training-data-pipeline extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """(id, component) for every node in ``edges``; component = min node id
    reachable. Deterministic — min over a set is order-independent.
    """
    # checkpoint the EDGE LIST first: everything below references it many
    # times (both union branches, every round), and without truncation each
    # reference re-executes the upstream pipeline that produced the pairs.
    e = edges.select(
        F.col(src).alias("s"), F.col(dst).alias("t")
    ).localCheckpoint(eager=True)
    sym = e.union(e.select(F.col("t").alias("s"), F.col("s").alias("t")))

    # round 0 folded into init: label = min(id, min neighbor id)
    labels = (
        sym.groupBy(F.col("s").alias("id"))
        .agg(F.least(F.min("t"), F.col("s")).alias("component"))
        .localCheckpoint(eager=True)
    )
    # Convergence via Σcomponent: labels only ever DECREASE (least of mins),
    # so the sum is strictly decreasing until fixpoint — an unchanged sum
    # IS convergence. This makes each round two jobs (materialize + tiny
    # sum over the checkpointed frame) instead of three (no join-compare
    # against the previous labels).
    prev_sum = labels.agg(F.sum("component")).first()[0]
    converged = False
    for _ in range(max_iter):
        nb_min = (
            sym.join(
                labels.select(
                    F.col("id").alias("t"), F.col("component").alias("t_comp")
                ),
                "t",
            )
            .groupBy(F.col("s").alias("id"))
            .agg(F.min("t_comp").alias("nb_comp"))
        )
        labels = (
            labels.join(nb_min, "id", "left")
            .select(
                "id",
                F.least(
                    "component", F.coalesce("nb_comp", "component")
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        cur_sum = labels.agg(F.sum("component")).first()[0]
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    if not converged:
        # An unconverged label frame is a PLAUSIBLE WRONG ANSWER (clusters
        # split along long chains) — fail loudly rather than return it.
        raise RuntimeError(
            f"connected_components: no fixpoint after {max_iter} rounds; "
            "graph diameter exceeds max_iter (near-dup graphs converge in "
            "3-5 rounds — for long-chain graphs raise max_iter or switch "
            "to the large-star/small-star algorithm)"
        )
    return labels
