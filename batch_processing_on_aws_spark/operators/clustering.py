"""Duplicate clustering: connected components over near-dup pairs and
canonical-document selection.

Pair emitters (minhash_lsh_pairs, simhash_neardup_pairs,
embedding_neardup_pairs) produce EDGES; a dedup pipeline must then
(1) close them into clusters — a ≈ b and b ≈ c means a, b, c are one
duplicate group even if (a, c) was never emitted — and (2) keep one
canonical representative per cluster. This module owns both steps,
all in DataFrame ops.

Algorithm: iterative min-label propagation. Every node starts
labelled with itself; each round every node takes the min of its own
and its neighbors' labels; converged when no label changes. Rounds =
graph diameter, and near-dup graphs are dense local cliques with tiny
diameters (2–4 rounds in practice), so the simple propagation is the
right scale choice over pointer-jumping variants (alternating
large-star/small-star — Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14 — converges in O(log² n) for
adversarially long chains; swap it in if your edge graph has them).
Each round is one shuffle join + one shuffle agg, with
``localCheckpoint`` truncating the lineage so plan size stays
constant across rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
    check_every: int = 1,
    algorithm: str = "propagation",
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``;
    component = min node id reachable (undirected).

    ``algorithm="propagation"`` (default): min-label propagation —
    rounds = graph diameter, the right choice for near-dup cliques
    (diameter 2–4). Raises if not converged within ``max_iter`` rounds
    — at that point the graph has a path longer than any plausible
    near-dup cluster and the large-star algorithm is the right tool.

    ``algorithm="large_star"``: alternating large-star/small-star
    (Kiveris et al., SoCC'14) — O(log² n) rounds even on adversarial
    long chains; see :func:`_cc_large_star`.

    Node ids keep their native type: min-label propagation only needs
    an orderable id (long, string UUID, …), and casting would turn
    non-numeric ids into NULLs that collapse every edge into one bogus
    component. NULL ids are rejected for the same reason — inline via
    ``raise_error`` during the first materialization of the edge list,
    so the guard costs zero extra jobs (an upfront ``count()`` would
    re-evaluate the whole upstream pair pipeline once more).

    ``check_every``: convergence is detected with a driver-side count
    job; each round otherwise launches 2 jobs. For larger edge sets
    set e.g. ``check_every=3`` — propagation past the fixpoint is a
    no-op, so the only cost of checking less often is up to
    ``check_every − 1`` extra (cheap, already-converged) rounds
    against a third of the count jobs."""
    def _nn(c: str):
        return F.when(
            F.col(c).isNull(),
            F.raise_error(F.lit(f"connected_components: NULL node id in {c!r}")),
        ).otherwise(F.col(c))

    if algorithm == "large_star":
        return _cc_large_star(edges, src, dst, max_iter=max_iter, _nn=_nn)
    if algorithm != "propagation":
        raise ValueError(f"unknown algorithm {algorithm!r}")

    sym = edges.select(_nn(src).alias("n"), _nn(dst).alias("nbr")).unionAll(
        edges.select(_nn(dst).alias("n"), _nn(src).alias("nbr"))
    )
    sym = sym.localCheckpoint()
    labels = sym.select("n").distinct().withColumn("label", F.col("n"))
    labels = labels.localCheckpoint()
    for i in range(max_iter):
        nbr_label = (
            sym.join(
                labels.select(
                    F.col("n").alias("nbr"), F.col("label").alias("nbr_label")
                ),
                "nbr",
            )
            .groupBy("n")
            .agg(F.min("nbr_label").alias("nbr_min"))
        )
        new_labels = (
            labels.join(nbr_label, "n", "left")
            .select(
                "n",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_min"), F.col("label"))
                ).alias("label"),
                F.col("label").alias("__old"),
            )
            .localCheckpoint()
        )
        labels = new_labels.drop("__old")
        if (i + 1) % check_every == 0 or i + 1 == max_iter:
            changed = new_labels.where(F.col("label") != F.col("__old")).count()
            if changed == 0:
                return labels.select("n", F.col("label").alias("component"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        "(long chains in the edge graph — rerun with "
        "algorithm='large_star', which converges in O(log² n) rounds)"
    )


def _cc_large_star(
    edges: DataFrame, src: str, dst: str, max_iter: int, _nn
) -> DataFrame:
    """Alternating large-star/small-star connected components (Kiveris
    et al., "Connected Components in MapReduce and Beyond", SoCC'14).

    Each round rewires the graph toward a star forest rooted at every
    component's minimum node:

    - large-star(u): each neighbor v > u re-attaches to
      m = min(Γ(u) ∪ {u});
    - small-star(u) over larger→smaller directed edges: u and all its
      smaller neighbors attach to the smallest of them.

    Both steps preserve connectivity; the alternation converges in
    O(log² n) rounds on ANY graph (the paper's Theorem 3), so
    adversarial long chains — where min-label propagation needs
    diameter rounds — stay cheap. Each step is one shuffle agg + one
    shuffle join + distinct; convergence is detected by an
    order-insensitive edge-set checksum (count + sum of xxhash64), one
    bounded scalar aggregate per round, no data-sized collect.
    """
    # Undirected edge set, NULL-guarded; nodes captured BEFORE dropping
    # self-loops so a self-loop-only node still gets a component.
    raw = edges.select(_nn(src).alias("u"), _nn(dst).alias("v")).localCheckpoint()
    nodes = (
        raw.select(F.col("u").alias("n"))
        .unionAll(raw.select(F.col("v").alias("n")))
        .distinct()
        .localCheckpoint()
    )
    e = (
        raw.where(F.col("u") != F.col("v"))
        .select(
            F.least("u", "v").alias("l"), F.greatest("u", "v").alias("g")
        )
        .distinct()
        .localCheckpoint()
    )

    def _checksum(df: DataFrame):
        # bit_xor: order-insensitive, overflow-free (ANSI sum of
        # xxhash64 longs overflows); edges are distinct so xor
        # cancellation of duplicates cannot occur.
        row = df.agg(
            F.count(F.lit(1)).alias("c"),
            F.bit_xor(F.xxhash64("l", "g")).alias("h"),
        ).collect()[0]
        return row["c"], row["h"]

    sig = _checksum(e)
    for _ in range(max_iter):
        # ---- large-star: neighbors v > u attach to min(Γ(u) ∪ {u}).
        sym = e.select(F.col("l").alias("u"), F.col("g").alias("v")).unionAll(
            e.select(F.col("g").alias("u"), F.col("l").alias("v"))
        )
        mins = sym.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        e = (
            sym.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("m").alias("l"), F.col("v").alias("g"))
            .where(F.col("l") != F.col("g"))
            .distinct()
        )
        # ---- small-star: u and its smaller neighbors attach to their min.
        smins = e.groupBy("g").agg(F.min("l").alias("m"))
        joined = e.join(smins, "g")
        e = (
            joined.where(F.col("l") != F.col("m"))
            .select(F.col("m").alias("l"), F.col("l").alias("g"))
            .unionAll(
                joined.select(F.col("m").alias("l"), F.col("g").alias("g"))
            )
            .distinct()
            .localCheckpoint()
        )
        new_sig = _checksum(e)
        if new_sig == sig:
            break
        sig = new_sig
    else:
        raise RuntimeError(
            f"large-star connected components did not converge in "
            f"{max_iter} rounds"
        )

    # Star forest: every non-root g has edges only to its component
    # min l; roots label themselves.
    labels = e.groupBy(F.col("g").alias("n")).agg(F.min("l").alias("root"))
    return nodes.join(labels, "n", "left").select(
        "n", F.coalesce("root", F.col("n")).alias("component")
    )


def dup_clusters(
    pairs: DataFrame, id_a: str = "doc_id_a", id_b: str = "doc_id_b"
) -> DataFrame:
    """(doc_id, cluster_id) for every doc in a near-dup pair; the
    cluster id is the minimum doc id in the component.

    ``check_every=2``: near-dup cliques close in 2–4 propagation
    rounds, so checking convergence every other round halves the
    driver-side count jobs at the cost of at most one extra (already
    converged, cheap) round."""
    comp = connected_components(pairs, src=id_a, dst=id_b, check_every=2)
    return comp.select(
        F.col("n").alias("doc_id"), F.col("component").alias("cluster_id")
    )


def assign_clusters(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """All of ``docs`` with a ``cluster_id`` column: the near-dup
    component for paired docs, the doc's own id for singletons."""
    clusters = dup_clusters(pairs)
    return (
        docs.join(
            clusters.withColumnRenamed("doc_id", id_col), id_col, "left"
        ).withColumn("cluster_id", F.coalesce("cluster_id", F.col(id_col)))
    )


def keep_canonical(
    docs_with_clusters: DataFrame,
    order_by,
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per cluster: the first doc under ``order_by`` (a list
    of Columns — e.g. longest text first, id ascending as tiebreak).
    This is the dedup pipeline's final filter: everything else in the
    cluster is a near-duplicate of the kept row."""
    from pyspark.sql import Window

    w = Window.partitionBy("cluster_id").orderBy(*order_by)
    return (
        docs_with_clusters.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
