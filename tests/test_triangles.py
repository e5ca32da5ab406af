"""triangle_count contract tests: known shapes + seeded brute force."""

import hashlib
from itertools import combinations

import pytest

from batch_processing_on_aws_spark.operators.graph import triangle_count


def _df(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_triangle_simple_shapes(spark):
    # K3 has 1, K4 has 4; a path has 0
    k3 = [(1, 2), (2, 3), (1, 3)]
    assert triangle_count(_df(spark, k3)).collect()[0]["n_triangles"] == 1
    k4 = [(a, b) for a, b in combinations(range(4), 2)]
    assert triangle_count(_df(spark, k4)).collect()[0]["n_triangles"] == 4
    path = [(1, 2), (2, 3), (3, 4)]
    assert triangle_count(_df(spark, path)).collect()[0]["n_triangles"] == 0


def test_triangle_ignores_direction_dupes_and_loops(spark):
    edges = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 1), (1, 3), (3, 2)]
    assert triangle_count(_df(spark, edges)).collect()[0]["n_triangles"] == 1


def test_triangle_per_node_credits_all_corners(spark):
    # bowtie: triangles {1,2,3} and {3,4,5} share node 3
    edges = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (3, 5)]
    got = {
        r["node"]: r["n_triangles"]
        for r in triangle_count(_df(spark, edges), per_node=True).collect()
    }
    assert got == {1: 1, 2: 1, 3: 2, 4: 1, 5: 1}


def test_triangle_matches_bruteforce_on_seeded_graph(spark):
    def u(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    n = 30
    edges = [
        (i, j)
        for i in range(n)
        for j in range(i + 1, n)
        if u(f"e{i}_{j}") % 5 == 0  # ~20% density
    ]
    adj = {i: set() for i in range(n)}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    want_total = sum(
        1
        for a in range(n)
        for b, c in combinations(sorted(adj[a]), 2)
        if a < b and c in adj[b]
    )
    got = triangle_count(_df(spark, edges)).collect()[0]["n_triangles"]
    assert got == want_total

    per_node = {
        r["node"]: r["n_triangles"]
        for r in triangle_count(_df(spark, edges), per_node=True).collect()
    }
    want_node: dict[int, int] = {}
    for a in range(n):
        for b, c in combinations(sorted(adj[a]), 2):
            if a < b and c in adj[b]:
                for x in (a, b, c):
                    want_node[x] = want_node.get(x, 0) + 1
    assert per_node == want_node


# ------------------------------------------------- transitive closure

def test_transitive_closure_chain_and_tree(spark):
    from batch_processing_on_aws_spark.operators.graph import (
        transitive_closure,
    )

    # chain 1->2->3->4 (child->parent)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "child long, parent long"
    )
    got = {
        (r["node"], r["ancestor"], r["depth"])
        for r in transitive_closure(edges).collect()
    }
    assert got == {
        (1, 2, 1), (2, 3, 1), (3, 4, 1),
        (1, 3, 2), (2, 4, 2), (1, 4, 3),
    }


def test_transitive_closure_early_exit_equals_exact_bound(spark):
    """A max_depth far above the true depth must return EXACTLY the
    closure the tight bound returns (round-15 convergence early-exit:
    unchanged checkpoint counts stop the doubling loop; the bound is a
    safety limit, not a work multiplier)."""
    from batch_processing_on_aws_spark.operators.graph import (
        strongly_connected_components,
        transitive_closure,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "child long, parent long"
    )
    tight = {
        tuple(r)
        for r in transitive_closure(edges, max_depth=4).collect()
    }
    loose = {
        tuple(r)
        for r in transitive_closure(edges, max_depth=4096).collect()
    }
    assert tight == loose
    scc_edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4)], "src long, dst long"
    )
    tight = {
        tuple(r)
        for r in strongly_connected_components(
            scc_edges, max_diameter=4
        ).collect()
    }
    loose = {
        tuple(r)
        for r in strongly_connected_components(
            scc_edges, max_diameter=4096
        ).collect()
    }
    assert tight == loose


def test_transitive_closure_binary_tree_matches_python(spark):
    from batch_processing_on_aws_spark.operators.graph import (
        transitive_closure,
    )

    n = 63  # perfect binary tree, depth 5
    rows = [(i, (i - 1) // 2) for i in range(1, n)]
    edges = spark.createDataFrame(rows, "child long, parent long")
    got = {
        (r["node"], r["ancestor"], r["depth"])
        for r in transitive_closure(edges).collect()
    }
    want = set()
    for i in range(1, n):
        a, d = i, 0
        while a != 0:
            a = (a - 1) // 2
            d += 1
            want.add((i, a, d))
    assert got == want


def test_transitive_closure_dag_keeps_both_depths(spark):
    """A diamond DAG reaches the apex by two routes of different
    length — both (node, ancestor, depth) rows are real paths."""
    from batch_processing_on_aws_spark.operators.graph import (
        transitive_closure,
    )

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 4), (3, 5), (5, 4)],
        "child long, parent long",
    )
    got = {
        (r["node"], r["ancestor"], r["depth"])
        for r in transitive_closure(edges).collect()
    }
    assert (1, 4, 2) in got and (1, 4, 3) in got


def test_transitive_closure_cycle_saturates_at_max_depth(spark):
    from batch_processing_on_aws_spark.operators.graph import (
        transitive_closure,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 1)], "child long, parent long"
    )
    rows = transitive_closure(edges, max_depth=8).collect()
    assert max(r["depth"] for r in rows) == 8  # audit signal, no hang
