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
  SoCC'14) is implemented below (``connected_components_star``) with the
  same join+min building blocks, and label propagation falls back to it
  automatically on max_iter exhaustion; propagation stays the default
  because near-dup diameters make the extra machinery pure overhead.

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
    fallback_star: bool = True,
) -> DataFrame:
    """(id, component) for every node in ``edges``; component = min node id
    reachable. Deterministic — min over a set is order-independent.

    If label propagation hits ``max_iter`` without a fixpoint (graph
    diameter > max_iter — long chains, not near-dup quasi-cliques), the
    O(log n)-round :func:`connected_components_star` takes over
    (``fallback_star=True``, default) instead of failing; pass
    ``fallback_star=False`` to keep the loud failure.
    """
    # checkpoint the EDGE LIST first: everything below references it many
    # times (both union branches, every round), and without truncation each
    # reference re-executes the upstream pipeline that produced the pairs.
    e = edges.select(
        F.col(src).alias("s"), F.col(dst).alias("t")
    ).localCheckpoint(eager=True)
    sym = e.union(e.select(F.col("t").alias("s"), F.col("s").alias("t")))

    from pyspark.sql import Observation

    # Convergence via Σcomponent: labels only ever DECREASE (least of
    # mins), so the sum is strictly decreasing until fixpoint — an
    # unchanged sum IS convergence.
    # r16 (guide §1.2): the sum rides the checkpoint job as an
    # Observation (CollectMetrics) instead of a second per-round
    # aggregate-and-collect job — one job per round, and at scale the
    # convergence check no longer re-scans the checkpointed labels at
    # all (the metric is folded during materialization, driver receives
    # one scalar). A fresh Observation per round: instances are
    # single-use by API contract.
    # decimal(38,0), not a raw long sum: 64-bit (hash-derived) node ids
    # overflow a bigint sum — ANSI mode turns that into a hard
    # ARITHMETIC_OVERFLOW crash (connected_components_star's checksum
    # guards the same way)
    _sum = F.sum(F.col("component").cast("decimal(38,0)")).alias("s")

    # round 0 folded into init: label = min(id, min neighbor id)
    obs = Observation()
    labels = (
        sym.groupBy(F.col("s").alias("id"))
        .agg(F.least(F.min("t"), F.col("s")).alias("component"))
        .observe(obs, _sum)
        .localCheckpoint(eager=True)
    )
    prev_sum = obs.get["s"]
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
        obs = Observation()
        labels = (
            labels.join(nb_min, "id", "left")
            .select(
                "id",
                F.least(
                    "component", F.coalesce("nb_comp", "component")
                ).alias("component"),
            )
            .observe(obs, _sum)
            .localCheckpoint(eager=True)
        )
        cur_sum = obs.get["s"]
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    if not converged:
        # An unconverged label frame is a PLAUSIBLE WRONG ANSWER (clusters
        # split along long chains) — never return it: hand the graph to
        # the diameter-independent algorithm, or fail loudly.
        if fallback_star:
            # hand over the CHECKPOINTED edge list, not the original plan —
            # the star pass must not re-execute the upstream pair pipeline
            return connected_components_star(e, "s", "t")
        raise RuntimeError(
            f"connected_components: no fixpoint after {max_iter} rounds; "
            "graph diameter exceeds max_iter (near-dup graphs converge in "
            "3-5 rounds — raise max_iter, or use fallback_star/"
            "connected_components_star)"
        )
    return labels


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    damping: float = 0.85,
) -> DataFrame:
    """(id, rank) after ``iterations`` rounds of damped PageRank with
    uniform teleport and dangling-mass redistribution — the host/domain
    quality ranking a crawl-curation pipeline feeds into source
    weighting (CCNet/RefinedWeb keep "head" hosts; the public
    Common-Crawl host ranking is exactly this computation).

    Fixed-iteration, not to-convergence: curation wants a stable,
    reproducible score (and rank mass moves <1% per round after ~5
    rounds on power-law graphs), so the round count is part of the
    operator's contract rather than a runtime outcome.

    Per round the work is one hash join (ranks ⨝ out-edges) + one
    groupBy-sum keyed on the destination node — both shuffle on node id
    and scale like any aggregation. Nothing data-scale ever reaches the
    driver: the one-time node count is the only collected scalar, and
    the per-round dangling mass stays IN the plan as a 1-row aggregate
    broadcast-cross-joined into the rank update (a driver-side
    ``.first()`` per round would double the job count — each round is
    exactly ONE job). Lineage is truncated every round (localCheckpoint,
    same discipline as connected_components: ranks feed two consumers
    per round, so an unmaterialized chain re-expands 2^rounds in the
    physical tree). The out-degree-weighted edge list is checkpointed
    once and reused by every round — the single big artifact in the
    computation, scanned ``iterations`` times but built once.

    Dangling nodes (no out-links — link-graph leaves) donate their rank
    uniformly to every node each round, the standard correction; a
    version that silently dropped that mass would leak ~|leaves|/n of
    total rank per round and mis-rank exactly the hub pages the filter
    is trying to keep.

    Reference parity: none (the reference has no graph surface); this
    extends the training-data-pipeline operator family (SURVEY §2.7).
    """
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("t")).localCheckpoint(
        eager=True
    )
    # The dangling-node membership is FIXED across rounds, so it rides on
    # the nodes/ranks frame as a boolean column instead of a separate id
    # frame (r15, guide §2.4 — remove joins outright): the per-round
    # dangling-mass scalar becomes a filtered aggregate over the ranks
    # frame the round reads anyway, eliminating one semi-join (and its
    # broadcast build job) per round plus the dangling_ids checkpoint at
    # setup. Cost: one boolean per node row through the round lineage.
    from pyspark.sql import Observation

    # the one-time node count rides the checkpoint job as an Observation
    # (r16, same single-pass discipline as connected_components'
    # convergence sum) instead of a second count() job over the frame
    obs = Observation()
    nodes = (
        e.select(F.col("s").alias("id"))
        .union(e.select(F.col("t").alias("id")))
        .distinct()
        .observe(obs, F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    n = obs.get["n"]
    if n == 0:
        return nodes.select("id", F.lit(0.0).alias("rank"))

    # out-degree-normalized contribution edges: (s, t, 1/outdeg(s)),
    # built once, reused every round
    outdeg = e.groupBy("s").agg(F.count(F.lit(1)).alias("outdeg"))
    w_edges = e.join(outdeg, "s").select(
        "s", "t", (F.lit(1.0) / F.col("outdeg")).alias("w")
    ).localCheckpoint(eager=True)

    teleport = (1.0 - damping) / n
    # ranks carries (id, _dangling, rank); _dangling = no out-edges
    ranks = (
        nodes.join(outdeg.select(F.col("s").alias("id"), "outdeg"), "id", "left")
        .select(
            "id",
            F.col("outdeg").isNull().alias("_dangling"),
            F.lit(1.0 / n).alias("rank"),
        )
        .localCheckpoint(eager=True)
    )
    for _ in range(iterations):
        dm = ranks.where(F.col("_dangling")).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm")
        )
        contribs = (
            w_edges.join(ranks.select(F.col("id").alias("s"), "rank"), "s")
            .groupBy(F.col("t").alias("id"))
            .agg(F.sum(F.col("rank") * F.col("w")).alias("contrib"))
        )
        ranks = (
            ranks.select("id", "_dangling")
            .join(contribs, "id", "left")
            .crossJoin(F.broadcast(dm))
            .select(
                "id",
                "_dangling",
                (
                    F.lit(teleport)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("contrib"), F.lit(0.0))
                        + F.col("_dm") / F.lit(float(n))
                    )
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select("id", "rank")


def connected_components_star(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """(id, component) via alternating large-star/small-star (Kiveris et
    al., "Connected Components in MapReduce and Beyond", SoCC'14):
    O(log n) rounds regardless of graph DIAMETER, built from the same
    join + groupBy-min primitives as label propagation.

    Per round the edge set itself is rewritten:

    - **large-star** — for every node u, every strictly-larger neighbor
      is re-pointed at m = min(N(u) ∪ {u});
    - **small-star** — edges oriented big→small, then every smaller
      neighbor and u itself re-pointed at m.

    Both steps preserve connectivity and only ever decrease edge
    endpoints; at the fixpoint every component is a star rooted at its
    minimum node, read off directly as the labels. Convergence is an
    exact edge-set comparison via (count, Σs, Σt, Σxxhash64(s,t)) — four
    scalars per round, no driver-side edge materialization.

    Prefer :func:`connected_components` for near-dup graphs (shallow
    diameter → fewer rounds, no per-round distinct); use this for
    long-chain graphs (web/link graphs, lineage chains).
    """
    all_edges = edges.select(
        F.col(src).alias("s"), F.col(dst).alias("t")
    ).localCheckpoint(eager=True)
    e = all_edges.filter(F.col("s") != F.col("t")).distinct().localCheckpoint(
        eager=True
    )

    def checksum(df: DataFrame) -> tuple:
        # bit_xor is order-independent and cannot overflow (ANSI mode
        # rejects a plain SUM of 64-bit hashes); decimal sums of the
        # endpoints guard the xor against structured collisions
        return tuple(
            df.agg(
                F.count(F.lit(1)),
                F.sum(F.col("s").cast("decimal(38,0)")),
                F.sum(F.col("t").cast("decimal(38,0)")),
                F.bit_xor(F.xxhash64("s", "t")),
            ).first()
        )

    prev = checksum(e)
    converged = False
    for _ in range(max_iter):
        # large-star over the symmetric neighborhood
        sym = e.union(e.select(F.col("t").alias("s"), F.col("s").alias("t")))
        mins = sym.groupBy("s").agg(F.least(F.min("t"), F.col("s")).alias("m"))
        large = (
            sym.join(mins, "s")
            .filter(F.col("t") > F.col("s"))
            .select(F.col("t").alias("s"), F.col("m").alias("t"))
            .filter(F.col("s") != F.col("t"))
            .distinct()
        )
        # small-star over big->small oriented edges
        d = large.select(
            F.greatest("s", "t").alias("s"), F.least("s", "t").alias("t")
        ).distinct()
        mins2 = d.groupBy("s").agg(F.least(F.min("t"), F.col("s")).alias("m"))
        e = (
            d.join(mins2, "s")
            .select(F.col("t").alias("s"), F.col("m").alias("t"))
            .union(mins2.select("s", F.col("m").alias("t")))
            .filter(F.col("s") != F.col("t"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        cur = checksum(e)
        if cur == prev:
            converged = True
            break
        prev = cur
    if not converged:
        raise RuntimeError(
            f"connected_components_star: no fixpoint after {max_iter} "
            "rounds (needs ~log2(n); raise max_iter)"
        )
    # star state: every edge is (node -> component root); roots label
    # themselves. Nodes whose only edges were self-loops vanished with the
    # s != t filter — restore them as singletons so the contract
    # "(id, component) for every node in edges" holds on every path
    # (label propagation keeps them naturally; the fallback must too).
    labels = e.select(F.col("s").alias("id"), F.col("t").alias("component")).union(
        e.select(F.col("t").alias("id"), F.col("t").alias("component")).distinct()
    )
    nodes = (
        all_edges.select(F.col("s").alias("id"))
        .union(all_edges.select(F.col("t").alias("id")))
        .distinct()
    )
    singletons = nodes.join(labels.select("id"), "id", "left_anti").select(
        "id", F.col("id").alias("component")
    )
    return labels.union(singletons)
