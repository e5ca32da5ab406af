"""PageRank over an edge table (extension surface; graph quality
priors).

Crawl-derived corpora use link-graph centrality as a document quality
prior (Common Crawl publishes harmonic/PageRank centrality per host;
curation pipelines weight or threshold on it) — alongside the
connected-components machinery (operators/clustering.py) this gives
the engine the second classic iterative graph op, in the same
DataFrame-only style.

Scale shape, per iteration: one equi-join of the edge table to the
rank table on src (shuffle on the node key), one hash-agg of
contributions by dst, one left join back to the node set. The two
global scalars an iteration needs — dangling mass and node count —
ride along as broadcast scalar crossJoins (the TPC-H scalar-subquery
pattern), so there are ZERO driver round-trips inside the loop;
lineage is truncated by localCheckpoint every few rounds exactly like
the connected-components loop. Nothing driver-side is data-sized.

Semantics: standard damped PageRank with dangling-mass
redistribution — a node with no out-edges donates its entire rank,
scaled by the damping factor, uniformly to all nodes, so total mass
is conserved at every iteration (pinned to 1e-9 in tests).
Determinism note: rank values are float SUMS whose partial order
depends on partitioning, so outputs are reproducible within an
engine/partitioning but not bit-portable — the registry query is
rows-only with that documented reason, and correctness is pinned
against closed forms and a NumPy power-iteration reference in
tests/test_graph.py.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def page_rank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 10,
    damping: float = 0.85,
    checkpoint_every: int = 2,
) -> DataFrame:
    """(node, rank) for every node appearing in ``edges`` (either
    side), after ``n_iter`` damped power iterations from the uniform
    start. Parallel edges count as parallel (a page linking twice
    sends twice the share); self-loops are legal.
    """
    if not 0 < damping < 1:
        raise ValueError(f"damping must be in (0, 1), got {damping!r}")
    # materialize the edge table ONCE — it sits inside every
    # iteration's lineage, and without this each localCheckpoint of
    # the rank table would recompute the caller's upstream plan
    # (scans, joins) checkpoint_every times over
    e = edges.select(
        F.col(src).alias("__s"), F.col(dst).alias("__d")
    ).localCheckpoint()
    nodes = (
        e.select(F.col("__s").alias("node"))
        .unionAll(e.select(F.col("__d").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    # node count as a 1-row broadcast (no .count() round-trip needed
    # per iteration; the loop only ever uses it inside the plan)
    n_df = F.broadcast(nodes.agg(F.count(F.lit(1)).alias("__n")))
    out_deg = e.groupBy("__s").agg(F.count(F.lit(1)).alias("__deg"))
    out_deg = out_deg.localCheckpoint()
    # static sink set (nodes with no out-edges), computed once. NO
    # broadcast hint: dangling nodes are commonly 20-40% of a real
    # crawl graph, i.e. node-scale — a forced broadcast would risk
    # OOM at exactly the scale this operator targets. AQE picks a
    # broadcast join on its own when the set is actually small.
    sinks = nodes.join(
        out_deg.withColumnRenamed("__s", "node"), "node", "left_anti"
    ).localCheckpoint()
    ranks = nodes.crossJoin(n_df).select(
        "node", (F.lit(1.0) / F.col("__n")).alias("rank")
    )
    for i in range(n_iter):
        r_src = ranks.withColumnRenamed("node", "__s")
        contribs = (
            e.join(out_deg, "__s")
            .join(r_src, "__s")
            .select(
                F.col("__d").alias("node"),
                (F.col("rank") / F.col("__deg")).alias("__c"),
            )
            .groupBy("node")
            .agg(F.sum("__c").alias("__in"))
        )
        # dangling mass: total rank sitting on nodes with no out-edges
        # (the static sink set precomputed above — the per-iteration
        # work is one semi-join of the NODE-sized rank table to a
        # broadcast list plus a 1-row aggregate; deriving it from the
        # contribution total via 1−Σin was tried and is SLOWER: the
        # broadcast subplan re-executes the expensive edge join
        # instead of reusing its exchange)
        dangling = F.broadcast(
            ranks.join(sinks, "node", "left_semi").agg(
                F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dang")
            )
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .crossJoin(n_df)
            .crossJoin(dangling)
            .select(
                "node",
                (
                    (F.lit(1.0) - F.lit(damping)) / F.col("__n")
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("__in"), F.lit(0.0))
                        + F.col("__dang") / F.col("__n")
                    )
                ).alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < n_iter:
            ranks = ranks.localCheckpoint()
    return ranks


def page_rank_exact(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 10,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = 10**12,
    checkpoint_every: int = 2,
) -> DataFrame:
    """Damped PageRank in exact BIGINT micro-unit arithmetic — the
    bit-portable twin of :func:`page_rank` (round-9 verdict task 1).

    Every rank is an integer number of ``1/scale`` units and every
    iteration uses only integer floor-division and integer sums:

    * contribution of ``u`` along each out-edge: ``rank_q[u] DIV
      out_deg[u]`` (the floor-div loses < out_deg micro-units per
      node per round — a deterministic, engine-independent rounding
      rule, not float noise);
    * fan-in: an integer SUM, which is associative and commutative
      under ANY partitioning — unlike the float sum in
      :func:`page_rank`, whose partial order is engine-internal;
    * dangling mass: the integer sum of sink ranks, floor-divided
      by the node count;
    * update: ``(scale*(den-num)) DIV (den*n)
      + (num * (in_sum + dang DIV n)) DIV den``.

    The result is a quantized fixed-point trajectory any engine —
    Spark under any partitioning, a DuckDB recursive CTE, a pencil —
    replays bit-for-bit, so the registry query it backs is
    hash-exact-oracled rather than rows-only. Mass conservation is
    approximate (each round leaks < (2·n + edges) micro-units to the
    floors, i.e. ≤ ~1e-6 relative at scale=1e12); ordering agrees
    with the float operator to well below that.

    Same per-iteration plan shape and 100-TB posture as
    :func:`page_rank`: one edge⋈rank shuffle join, one hash-agg by
    dst, one left join back to nodes; global scalars (n, dangling
    mass) ride as broadcast 1-row crossJoins, zero in-loop driver
    round-trips, localCheckpoint lineage truncation.

    Overflow headroom: ranks ≤ ~scale, so the widest intermediate is
    ``damping_num * 2 * scale`` ≈ 1.7e14 at the defaults — 4 orders
    of magnitude under the BIGINT ceiling.

    Returns ``(node, rank_micro)`` with ``rank_micro: long``.
    """
    if not 0 < damping_num < damping_den:
        raise ValueError(
            f"damping must satisfy 0 < num < den, got "
            f"{damping_num}/{damping_den}"
        )
    e = edges.select(
        F.col(src).alias("__s"), F.col(dst).alias("__d")
    ).localCheckpoint()
    nodes = (
        e.select(F.col("__s").alias("node"))
        .unionAll(e.select(F.col("__d").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n_df = F.broadcast(
        nodes.agg(F.count(F.lit(1)).cast("long").alias("__n"))
    )
    out_deg = e.groupBy("__s").agg(
        F.count(F.lit(1)).cast("long").alias("__deg")
    ).localCheckpoint()
    # sink set: same no-broadcast-hint reasoning as page_rank — real
    # crawl graphs have node-scale dangling sets; AQE broadcasts small
    sinks = nodes.join(
        out_deg.withColumnRenamed("__s", "node"), "node", "left_anti"
    ).localCheckpoint()
    scale = int(scale)
    num, den = int(damping_num), int(damping_den)
    ranks = nodes.crossJoin(n_df).select(
        "node",
        F.expr(f"CAST({scale} AS BIGINT) DIV __n").alias("rank_q"),
    )
    for i in range(n_iter):
        r_src = ranks.withColumnRenamed("node", "__s")
        contribs = (
            e.join(out_deg, "__s")
            .join(r_src, "__s")
            .select(
                F.col("__d").alias("node"),
                F.expr("rank_q DIV __deg").alias("__c"),
            )
            .groupBy("node")
            .agg(F.sum("__c").cast("long").alias("__in"))
        )
        dangling = F.broadcast(
            ranks.join(sinks, "node", "left_semi").agg(
                F.coalesce(F.sum("rank_q"), F.lit(0))
                .cast("long")
                .alias("__dang")
            )
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .crossJoin(n_df)
            .crossJoin(dangling)
            .select(
                "node",
                F.expr(
                    f"CAST({scale * (den - num)} AS BIGINT)"
                    f" DIV ({den} * __n)"
                    f" + ({num} * (coalesce(__in, CAST(0 AS BIGINT))"
                    f" + __dang DIV __n)) DIV {den}"
                ).alias("rank_q"),
            )
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < n_iter:
            ranks = ranks.localCheckpoint()
    return ranks.select(
        "node", F.col("rank_q").cast("long").alias("rank_micro")
    )


def triangle_count(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    per_node: bool = False,
) -> DataFrame:
    """Exact triangle counting on an undirected graph — the third
    classic graph op next to PageRank and connected components, and
    the standard clustering/cohesion signal (e.g. boilerplate-network
    detection over near-dup graphs).

    Algorithm: DEGREE-ORIENTED wedge join (Cohen's MapReduce
    formulation; the MR/Spark standard). Edges are canonicalized
    undirected-distinct, then oriented low→high by the total order
    ``(degree, node)``; a self-join of the oriented edge table on the
    wedge apex enumerates each triangle's two low-order edges exactly
    once, and a semi-join against the oriented edges confirms the
    closing edge. Orientation bounds every node's out-degree by
    O(sqrt(m)), so wedge fan-out is O(m^1.5) TOTAL regardless of
    degree skew — a hub of degree d contributes d·sqrt(m), not d²,
    which is the difference between a web-scale graph finishing and
    not. Shape: three hash-aggs/joins on node keys, no windows, no
    driver loops; integer-exact, hence hash-exact cross-engine.

    Returns a 1-row ``(n_triangles)`` frame, or with ``per_node``
    one row per vertex that participates in ≥1 triangle:
    ``(node, n_triangles)`` (each triangle credits all 3 corners).
    """
    # materialize the canonical edge list ONCE (round-15): it feeds
    # three consumers (two degree branches + the orientation join),
    # and the caller's edge-building subplan — for the co-purchase
    # golden a lineitem self-join + support aggregate — would
    # otherwise be REPLICATED per consumer and then squared by the
    # wedge self-join below (measured: 180 parquet scans / 274
    # Exchanges in one plan, zero reuse). Edge lists are the
    # decision-scale data (≪ input at 100 TB); same convention as
    # strongly_connected_components.
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        e.select(F.col("a").alias("n"))
        .unionAll(e.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # orient u -> v iff (deg(u), u) < (deg(v), v)
    da = deg.select(F.col("n").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("n").alias("b"), F.col("d").alias("db"))
    ranked = e.join(da, "a").join(db, "b")
    lower_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    # oriented also feeds three consumers (both wedge wings + the
    # closing-edge probe); one materialization instead of three
    # executions of the two degree joins (round-15, same rationale)
    oriented = ranked.select(
        F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(lower_first, F.col("da")).otherwise(F.col("db")).alias("du"),
        F.when(lower_first, F.col("db")).otherwise(F.col("da")).alias("dv"),
    ).localCheckpoint(eager=True)
    e1 = oriented.select(
        F.col("u"), F.col("v").alias("w1"), F.col("dv").alias("dw1")
    )
    e2 = oriented.select(
        F.col("u"), F.col("v").alias("w2"), F.col("dv").alias("dw2")
    )
    # each triangle's apex is its LOWEST corner; order the two wings
    # by the same total order so the wedge is enumerated once
    wedges = e1.join(e2, "u").where(
        (F.col("dw1") < F.col("dw2"))
        | ((F.col("dw1") == F.col("dw2")) & (F.col("w1") < F.col("w2")))
    )
    closing = oriented.select(
        F.col("u").alias("w1"), F.col("v").alias("w2")
    )
    tris = wedges.join(closing, ["w1", "w2"], "inner").select(
        "u", "w1", "w2"
    )
    if not per_node:
        return tris.agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    corners = (
        tris.select(F.col("u").alias("node"))
        .unionAll(tris.select(F.col("w1").alias("node")))
        .unionAll(tris.select(F.col("w2").alias("node")))
    )
    return corners.groupBy("node").agg(
        F.count(F.lit(1)).cast("long").alias("n_triangles")
    )


def transitive_closure(
    edges: DataFrame,
    child_col: str = "child",
    parent_col: str = "parent",
    max_depth: int = 32,
    checkpoint_every: int = 1,
) -> DataFrame:
    """Hierarchy flattening / transitive closure — the recursive-CTE
    shape (org charts, BOM explosion, category trees) Spark's SQL
    dialect lacks: returns one row per (node, ancestor) pair reachable
    through parent edges, with ``depth`` = path length ≥ 1.

    Algorithm: ITERATIVE DOUBLING (path exponentiation) — round k
    holds all paths of length ≤ 2^k, so ``ceil(log2(max_depth))``
    self-joins reach depth ``max_depth`` (5 rounds for 32 levels,
    where the naive frontier loop pays one shuffle PER LEVEL — the
    difference between 5 and 32 shuffles on a deep BOM). Each round:
    paths ∪ (paths ⋈ paths on tail==head, depths summed) → distinct.
    On a DAG with multiple routes to the same ancestor, ``distinct``
    keeps one row per (node, ancestor, depth); same-pair different-
    depth rows are both real paths and both kept. localCheckpoint
    every ``checkpoint_every`` rounds truncates the doubling lineage
    (the iterative-loop lesson from page_rank / large-star).

    Cycles: a cycle would echo pairs forever under a frontier loop;
    here it simply saturates at max_depth — callers flattening a
    hierarchy should treat any output row at depth == max_depth as a
    "deeper than expected" audit signal.

    ``checkpoint_every`` defaults to 1 (round-15): each round's
    relation feeds THREE consumers next round (left, right, union),
    and an eager per-round checkpoint both pins that to one
    materialization and lets the convergence early-exit below fire
    the first round the relation stops growing. Interleaved min-of-5
    A/B on the customer-hierarchy fixture at sf0.1: cadence 1 =
    2.93 s, cadence 2 = 3.16 s, r14 fixed-rounds = 4.00 s (same
    ordering on the SCC fixture; page_rank keeps its own cadence-2
    optimum — its loop has no early exit to feed).
    """
    paths = (
        edges.select(
            F.col(child_col).alias("node"),
            F.col(parent_col).alias("ancestor"),
            F.lit(1).alias("depth"),
        )
        .where(F.col("node").isNotNull() & F.col("ancestor").isNotNull())
        .distinct()
    )
    rounds = max(1, math.ceil(math.log2(max_depth)))
    prev_n: int | None = None
    for i in range(rounds):
        left = paths.select(
            F.col("node"), F.col("ancestor").alias("__mid"),
            F.col("depth").alias("__d1"),
        )
        right = paths.select(
            F.col("node").alias("__mid"), F.col("ancestor"),
            F.col("depth").alias("__d2"),
        )
        longer = (
            left.join(right, "__mid")
            .select(
                "node",
                "ancestor",
                (F.col("__d1") + F.col("__d2")).alias("depth"),
            )
            .where(F.col("depth") <= max_depth)
        )
        paths = paths.unionByName(longer).distinct()
        if (i + 1) % checkpoint_every == 0 and i + 1 < rounds:
            paths = paths.localCheckpoint(eager=True)
            # EARLY EXIT on convergence (round-15, guide §2.4/§5 —
            # attack job count): the round map is a UNION, so an
            # unchanged count at two consecutive checkpoints means
            # paths is a fixed point of the doubling step — every
            # remaining round would re-shuffle the converged relation
            # to produce itself. max_depth is a safety BOUND, not the
            # actual depth; a shallow hierarchy converges in
            # log2(true depth) rounds and skips the rest. The count
            # is a cheap scan of the just-materialized checkpoint
            # blocks. Result provably identical: superset + equal
            # size ⇒ equal set.
            n = paths.count()
            if n == prev_n:
                break
            prev_n = n
    return paths


def strongly_connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_diameter: int = 64,
    checkpoint_every: int = 1,
) -> DataFrame:
    """SCC labels — the CYCLE-detection sibling of the weakly-connected
    components in ``operators/clustering.py`` (which ignore direction):
    returns one ``(node, component)`` row per node appearing in
    ``edges``, where ``component`` is the MINIMUM node id of the
    node's strongly connected component (u and v share a label iff
    u→v AND v→u). The audit primitive the ``transitive_closure``
    docstring's "cycles saturate" caveat points at: any component of
    size > 1 (or a self-loop) IS a cycle.

    Algorithm: reachability by the same ITERATIVE-DOUBLING kernel as
    ``transitive_closure``, but PAIRS-ONLY (no depth column, so a
    cycle converges to a fixed pair set instead of echoing new depth
    rows): R₀ = E, R_{k+1} = R_k ∪ (R_k ∘ R_k), covering all path
    lengths ≤ 2^k — ``ceil(log2(max_diameter))`` self-join shuffles,
    not one per level. SCC labels then need no second closure:
    mutual = R ∩ Rᵀ (one equi-join of R to itself on the swapped
    pair) ∪ identity, label = min partner per node.

    Scale: |R| is the full reachability relation — LINEAR on
    bounded-reach graphs (hierarchies, per-entity session graphs,
    block-local link structure: the registry fixture), quadratic on a
    long chain; the doubling is the right shape exactly when reach
    sets are bounded, same contract as ``transitive_closure``.
    ``max_diameter`` bounds the longest shortest path the closure
    covers — pairs farther apart than it are not closed (saturation,
    not an error). localCheckpoint every ``checkpoint_every`` rounds
    truncates the doubling lineage (the iterative-loop lesson from
    page_rank / large-star).
    """
    e = (
        edges.select(F.col(src).alias("node"), F.col(dst).alias("reach"))
        .where(F.col("node").isNotNull() & F.col("reach").isNotNull())
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select("node")
        .unionByName(e.select(F.col("reach").alias("node")))
        .distinct()
    )
    r = e
    rounds = max(1, math.ceil(math.log2(max(2, max_diameter))))
    prev_n: int | None = None
    for i in range(rounds):
        left = r.select(F.col("node"), F.col("reach").alias("__mid"))
        right = r.select(F.col("node").alias("__mid"), F.col("reach"))
        longer = left.join(right, "__mid").select("node", "reach")
        r = r.unionByName(longer).distinct()
        if (i + 1) % checkpoint_every == 0 and i + 1 < rounds:
            r = r.localCheckpoint(eager=True)
            # EARLY EXIT on convergence (round-15, see
            # transitive_closure): unchanged count at two consecutive
            # checkpoints ⇒ r is a fixed point of the doubling (the
            # round map is a union, so superset + equal size ⇒ equal
            # set) — every remaining round would re-derive the
            # converged relation. max_diameter is a bound, not the
            # graph's diameter; block-local graphs converge in
            # log2(true diameter) rounds.
            n = r.count()
            if n == prev_n:
                break
            prev_n = n
    mutual = (
        r.alias("f")
        .join(
            r.alias("b"),
            (F.col("f.node") == F.col("b.reach"))
            & (F.col("f.reach") == F.col("b.node")),
        )
        .select(F.col("f.node").alias("node"), F.col("f.reach").alias("partner"))
    )
    ident = nodes.select("node", F.col("node").alias("partner"))
    return (
        mutual.unionByName(ident)
        .groupBy("node")
        .agg(F.min("partner").alias("component"))
    )


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_rounds: int = 4,
    checkpoint_every: int = 1,
) -> DataFrame:
    """Community detection by SYNCHRONOUS label propagation (LPA,
    Raghavan et al. 2007) — the community sibling of the
    connected-components / SCC labelers: returns one ``(node,
    community)`` row per node of the UNDIRECTED graph, where
    ``community`` is the label the node holds after ``n_rounds``
    synchronous rounds. CC merges everything reachable; LPA splits a
    connected graph along its dense regions — the "which cluster of
    near-dup docs / which user cohort" question CC can't answer.

    DETERMINISM (the property naive LPA lacks): the textbook rule
    breaks ties randomly and updates asynchronously, so two runs
    disagree; here rounds are synchronous (every node updates from the
    round-k labels simultaneously) and the tie-break is total —
    adopt the MIN label among those with MAX neighbor count; a node
    with no neighbors keeps its own label. Every round is therefore a
    pure function of the previous labeling, the output is bit-stable
    under any partitioning, and a SQL oracle replays the rounds as
    chained CTEs (golden ``customer_community_labels``).

    Shape, per round: one equi-join of the symmetrized edge table to
    the label table on the neighbor key + two hash-aggs ((node, label)
    vote counts, then the struct-max argmax) — map-side partials, no
    windows, no driver round-trips; localCheckpoint every
    ``checkpoint_every`` rounds truncates lineage (the iterative-loop
    lesson from page_rank / transitive_closure). At 100 TB: edges
    shuffle on node id per round; label skew (a giant community late
    in the run) concentrates VOTE rows, but votes pre-aggregate
    map-side per (node, label) so the reduce side is bounded by
    distinct labels per node's neighborhood, not community size.

    Convergence note: synchronous LPA can two-cycle on bipartite-ish
    structure (a star flips hub↔spokes forever) — callers pick
    ``n_rounds`` for their diameter and treat the fixed round count as
    the contract, exactly like ``transitive_closure.max_depth``.
    Labels must be non-negative integers (the argmax negates them
    inside a struct-max).
    """
    if n_rounds < 1:
        raise ValueError(f"n_rounds must be >= 1, got {n_rounds}")
    fwd = edges.select(F.col(src).alias("node"), F.col(dst).alias("nbr"))
    rev = edges.select(F.col(dst).alias("node"), F.col(src).alias("nbr"))
    e = (
        fwd.unionByName(rev)
        .where(
            F.col("node").isNotNull()
            & F.col("nbr").isNotNull()
            & (F.col("node") != F.col("nbr"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = e.select("node").distinct()
    labels = nodes.select("node", F.col("node").alias("label"))
    for i in range(n_rounds):
        votes = (
            e.join(
                labels.select(
                    F.col("node").alias("nbr"), F.col("label").alias("nlabel")
                ),
                "nbr",
            )
            .groupBy("node", "nlabel")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        best = votes.groupBy("node").agg(
            F.max(
                F.struct(F.col("c"), (-F.col("nlabel")).alias("neg"))
            ).alias("__b")
        )
        labels = (
            labels.join(best, "node", "left")
            .select(
                "node",
                F.coalesce(-F.col("__b.neg"), F.col("label")).alias("label"),
            )
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < n_rounds:
            labels = labels.localCheckpoint(eager=True)
    return labels.select("node", F.col("label").alias("community"))
