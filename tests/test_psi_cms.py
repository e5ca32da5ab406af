"""psi_numeric_drift + Count-Min sketch contract tests."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from batch_processing_on_aws_spark.operators.audit import psi_numeric_drift
from batch_processing_on_aws_spark.operators.sketches import (
    cm_estimate,
    cm_sketch,
)

EDGES = [0.0, 10.0, 20.0, 40.0]


def _psi_rows(spark, old_vals, new_vals):
    old = spark.createDataFrame([(v,) for v in old_vals], "x double")
    new = spark.createDataFrame([(v,) for v in new_vals], "x double")
    return {
        r["bin"]: (r["old_n"], r["new_n"], r["psi_micro"])
        for r in psi_numeric_drift(old, new, "x", EDGES).collect()
    }


def test_psi_matches_python_reference(spark):
    old_vals = [-5.0, 1.0, 5.0, 12.0, 15.0, 25.0, 50.0, 50.0]
    new_vals = [2.0, 3.0, 4.0, 5.0, 13.0, 45.0]
    got = _psi_rows(spark, old_vals, new_vals)

    def bin_of(v):
        b = -1
        for i, e in enumerate(EDGES):
            if v >= e:
                b = i
        return b

    n_cells = len(EDGES) + 1
    for b in range(-1, len(EDGES)):
        old_n = sum(1 for v in old_vals if bin_of(v) == b)
        new_n = sum(1 for v in new_vals if bin_of(v) == b)
        p = (old_n + 1) / (len(old_vals) + n_cells)
        q = (new_n + 1) / (len(new_vals) + n_cells)
        want = round((p - q) * math.log(p / q) * 1_000_000)
        assert got[b] == (old_n, new_n, want), b


def test_psi_identical_snapshots_is_zero(spark):
    vals = [1.0, 5.0, 12.0, 25.0, 50.0]
    got = _psi_rows(spark, vals, vals)
    assert all(v[2] == 0 for v in got.values())
    # every bin row present even when empty (spine join)
    assert set(got) == set(range(-1, len(EDGES)))


def test_psi_nulls_excluded_and_edges_validated(spark):
    old = spark.createDataFrame([(1.0,), (None,)], "x double")
    new = spark.createDataFrame([(1.0,)], "x double")
    rows = psi_numeric_drift(old, new, "x", EDGES).collect()
    assert sum(r["old_n"] for r in rows) == 1
    with pytest.raises(ValueError, match="ascending"):
        psi_numeric_drift(old, new, "x", [3.0, 1.0])


def _py_cm_col(d, key, width):
    return int(hashlib.md5(f"{d}:{key}".encode()).hexdigest()[:8], 16) % width


def test_cm_sketch_matches_python_and_never_undercounts(spark):
    keys = [f"k{i % 7}" for i in range(50)] + ["rare"]
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    width, depth = 16, 3
    sk = cm_sketch(df, "k", width=width, depth=depth)
    mat = {(r["row_idx"], r["col_idx"]): r["n"] for r in sk.collect()}
    # recompute the matrix in python
    want: dict[tuple[int, int], int] = {}
    for k in keys:
        for d in range(depth):
            cell = (d, _py_cm_col(d, k, width))
            want[cell] = want.get(cell, 0) + 1
    assert mat == want

    items = spark.createDataFrame([(k,) for k in set(keys)], "k string")
    est = {
        r["k"]: r["est_n"]
        for r in cm_estimate(sk, items, "k", depth=depth, width=width).collect()
    }
    true = {k: keys.count(k) for k in set(keys)}
    for k in true:
        assert est[k] >= true[k], k
        # python reference estimate
        assert est[k] == min(
            want.get((d, _py_cm_col(d, k, width)), 0) for d in range(depth)
        )


def test_cm_sketch_is_mergeable(spark):
    a = spark.createDataFrame([(f"k{i % 5}",) for i in range(30)], "k string")
    b = spark.createDataFrame([(f"k{i % 3}",) for i in range(20)], "k string")
    merged = (
        cm_sketch(a, "k").unionByName(cm_sketch(b, "k"))
        .groupBy("row_idx", "col_idx")
        .agg(F.sum("n").cast("long").alias("n"))
    )
    direct = cm_sketch(a.unionByName(b), "k")
    assert {tuple(r) for r in merged.collect()} == {
        tuple(r) for r in direct.collect()
    }


def test_cm_sketch_exact_when_no_collisions(spark):
    df = spark.createDataFrame([("a",), ("a",), ("b",)], "k string")
    sk = cm_sketch(df, "k", width=4096, depth=4)
    est = {
        r["k"]: r["est_n"]
        for r in cm_estimate(
            sk, df.distinct(), "k", depth=4, width=4096
        ).collect()
    }
    assert est == {"a": 2, "b": 1}


# --------------------------------------------------- vector centroids

def test_embedding_centroids_exact(spark):
    from batch_processing_on_aws_spark.operators.similarity import (
        embedding_centroids,
    )

    rows = [
        (0, [1.0, 2.0, 3.0]),
        (0, [3.0, 2.0, 1.0]),
        (1, [0.5, -0.5, 0.25]),
    ]
    df = spark.createDataFrame(rows, "label int, embedding array<float>")
    got = {
        r["label"]: (r["centroid"], r["n_vectors"])
        for r in embedding_centroids(df).collect()
    }
    assert got[0] == ([2.0, 2.0, 2.0], 2)
    assert got[1] == ([0.5, -0.5, 0.25], 1)


def test_embedding_centroids_partitioning_invariant(spark):
    """The integer-sum path makes the centroid identical under any
    partitioning — the property a double sum would break."""
    import hashlib

    from batch_processing_on_aws_spark.operators.similarity import (
        embedding_centroids,
    )

    def u(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    rows = [
        (u(f"l{i}") % 3, [((u(f"v{i}_{d}") % 2001) - 1000) / 997.0 for d in range(8)])
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "label int, embedding array<float>")
    a = {
        r["label"]: tuple(r["centroid"])
        for r in embedding_centroids(df.repartition(1)).collect()
    }
    b = {
        r["label"]: tuple(r["centroid"])
        for r in embedding_centroids(df.repartition(13, "label")).collect()
    }
    assert a == b


# ------------------------------------------------------- quantile sketch

def test_qhist_error_bound_and_exact_small_values(spark):
    """Nearest-rank estimates from the log-linear sketch are lower
    bounds within 2^-p relative error; values < 2^p are EXACT."""
    import math
    import random

    from batch_processing_on_aws_spark.operators.sketches import (
        qhist_quantiles,
        qhist_sketch,
    )

    rng = random.Random(7)
    big = [rng.randint(0, 10**9) for _ in range(5000)]
    small = [rng.randint(0, 127) for _ in range(5000)]
    for tag, vals in (("big", big), ("small", small)):
        df = spark.createDataFrame([("g", v) for v in vals], "g string, v long")
        sk = qhist_sketch(df, "v", ("g",))
        est = qhist_quantiles(sk, ("g",), qs=(0.5, 0.9, 0.99)).collect()[0]
        svals = sorted(vals)
        for q, col in ((0.5, "q50"), (0.9, "q90"), (0.99, "q99")):
            true = svals[max(1, math.ceil(q * len(svals))) - 1]
            got = est[col]
            assert got <= true, (tag, q)
            if tag == "small":
                assert got == true, (tag, q)  # exact below 2^p
            elif true >= 128:
                assert (true - got) / true <= 2**-7 + 1e-12, (tag, q)


def test_qhist_mergeable_and_partitioning_invariant(spark):
    from pyspark.sql import functions as F

    from batch_processing_on_aws_spark.operators.sketches import (
        qhist_sketch,
    )

    df = spark.createDataFrame(
        [("a" if v % 3 else "b", v * 977 % (10**8)) for v in range(4000)],
        "g string, v long",
    )
    full = {
        (r["g"], r["bucket_id"]): r["n"]
        for r in qhist_sketch(df, "v", ("g",)).collect()
    }
    h1 = qhist_sketch(df.where(F.col("v") % 2 == 0), "v", ("g",))
    h2 = qhist_sketch(df.where(F.col("v") % 2 == 1), "v", ("g",))
    merged = {
        (r["g"], r["bucket_id"]): r["n"]
        for r in h1.unionByName(h2)
        .groupBy("g", "bucket_id")
        .agg(F.sum("n").alias("n"))
        .collect()
    }
    assert full == merged
    repart = {
        (r["g"], r["bucket_id"]): r["n"]
        for r in qhist_sketch(df.repartition(13), "v", ("g",)).collect()
    }
    assert full == repart


def test_qhist_rejects_negative_values(spark):
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from batch_processing_on_aws_spark.operators.sketches import (
        qhist_sketch,
    )

    df = spark.createDataFrame([("g", -5)], "g string, v long")
    with pytest.raises(SparkRuntimeException, match="negative"):
        qhist_sketch(df, "v", ("g",)).collect()
