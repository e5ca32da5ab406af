"""Connected components / dup clustering: transitive closure,
singleton handling, canonical selection, convergence on chains."""

from pyspark.sql import functions as F

from batch_processing_on_aws_spark.operators.clustering import (
    assign_clusters,
    connected_components,
    keep_canonical,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_components_close_transitively(spark):
    # two clusters {1,2,3} (no direct 1-3 edge) and {10,11}
    comp = {
        r["n"]: r["component"]
        for r in connected_components(
            _edges(spark, [(1, 2), (2, 3), (10, 11)])
        ).collect()
    }
    assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_components_long_chain_converges(spark):
    # a 12-node path: worst case for label propagation
    chain = [(i, i + 1) for i in range(12)]
    comp = {
        r["n"]: r["component"]
        for r in connected_components(_edges(spark, chain)).collect()
    }
    assert set(comp.values()) == {0}
    assert len(comp) == 13


def test_assign_and_canonical(spark):
    docs = spark.createDataFrame(
        [(1, "aaaa"), (2, "aa"), (3, "a"), (7, "solo")],
        "doc_id long, text string",
    ).select("doc_id", "text", F.length("text").alias("tlen"))
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "doc_id_a long, doc_id_b long")
    assigned = assign_clusters(docs, pairs)
    got = {r["doc_id"]: r["cluster_id"] for r in assigned.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 7: 7}  # singleton keeps own id

    kept = keep_canonical(
        assigned, [F.col("tlen").desc(), F.col("doc_id").asc()]
    )
    assert {r["doc_id"] for r in kept.collect()} == {1, 7}  # longest of cluster + solo


def test_components_match_union_find_property(spark):
    """Property: on random edge sets, the DataFrame label propagation
    must equal a driver-side union-find ground truth."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=8, deadline=None)
    @given(
        edges=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=15),
                st.integers(min_value=0, max_value=15),
            ),
            min_size=1,
            max_size=20,
        )
    )
    def check(edges):
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        def union(a, b):
            parent[find(a)] = find(b)

        for a, b in edges:
            union(a, b)
        nodes = {n for e in edges for n in e}
        roots = {}
        expected = {}
        for n in sorted(nodes):  # min node id per component
            r = find(n)
            roots.setdefault(r, n)
            expected[n] = roots[r]

        got = {
            r["n"]: r["component"]
            for r in connected_components(
                _edges(spark, [(int(a), int(b)) for a, b in edges])
            ).collect()
        }
        assert got == expected

    check()


def test_components_string_ids(spark):
    # ids keep their native type — string UUIDs must not be cast away
    edges = spark.createDataFrame(
        [("uuid-b", "uuid-a"), ("uuid-b", "uuid-c"), ("zz", "zy")],
        "src string, dst string",
    )
    comp = {
        r["n"]: r["component"] for r in connected_components(edges).collect()
    }
    assert comp == {
        "uuid-a": "uuid-a", "uuid-b": "uuid-a", "uuid-c": "uuid-a",
        "zy": "zy", "zz": "zy",
    }


def test_components_reject_null_ids(spark):
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    edges = spark.createDataFrame(
        [(1, None), (2, 3)], "src long, dst long"
    )
    with pytest.raises((SparkRuntimeException, Py4JJavaError)):
        connected_components(edges).collect()


def test_components_check_every_matches_per_round(spark):
    chain = [(i, i + 1) for i in range(9)]
    every = connected_components(_edges(spark, chain)).collect()
    batched = connected_components(_edges(spark, chain), check_every=3).collect()
    assert sorted(map(tuple, every)) == sorted(map(tuple, batched))


# ---------------------------------------------------------------- large-star


def test_propagation_raises_on_long_chain_pointing_at_large_star(spark):
    """The documented failure mode, pinned: a 60-edge path exceeds a
    small max_iter for diameter-bound propagation, and the error must
    point at the large-star fallback."""
    import pytest

    chain = _edges(spark, [(i, i + 1) for i in range(60)])
    with pytest.raises(RuntimeError, match="large_star"):
        connected_components(chain, max_iter=10)


def test_large_star_converges_on_long_chain(spark):
    """Same 61-node path: large-star/small-star must converge in
    O(log^2 n) rounds — max_iter=12 is ample for n=61 where diameter-
    bound propagation needs 60."""
    chain = _edges(spark, [(i, i + 1) for i in range(60)])
    comp = {
        r["n"]: r["component"]
        for r in connected_components(
            chain, algorithm="large_star", max_iter=12
        ).collect()
    }
    assert set(comp.values()) == {0}
    assert len(comp) == 61


def test_large_star_agrees_with_propagation_on_random_graphs(spark):
    """Both algorithms are exact: on seeded random graphs (including
    self-loops and duplicate edges) their outputs must be identical."""
    import random

    for seed in (1, 7, 42):
        rng = random.Random(seed)
        n = 40
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(rng.randrange(10, 60))
        ]
        df = _edges(spark, edges)
        prop = sorted(
            map(tuple, connected_components(df).collect())
        )
        star = sorted(
            map(
                tuple,
                connected_components(
                    df, algorithm="large_star", max_iter=15
                ).collect(),
            )
        )
        assert prop == star, f"seed={seed}"


def test_large_star_string_ids_and_self_loop_singleton(spark):
    edges = spark.createDataFrame(
        [("b", "a"), ("b", "c"), ("solo", "solo")], "src string, dst string"
    )
    comp = {
        r["n"]: r["component"]
        for r in connected_components(edges, algorithm="large_star").collect()
    }
    assert comp == {"a": "a", "b": "a", "c": "a", "solo": "solo"}


def test_unknown_algorithm_rejected(spark):
    import pytest

    with pytest.raises(ValueError, match="unknown algorithm"):
        connected_components(_edges(spark, [(1, 2)]), algorithm="pointer")
