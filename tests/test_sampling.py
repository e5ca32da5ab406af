"""Hash-split/sample properties: determinism under repartitioning,
split disjointness/coverage, and approximate fractions."""

from pyspark.sql import functions as F

from batch_processing_on_aws_spark.operators.sampling import (
    hash_bucket,
    hash_sample,
    train_val_test_split,
)


def _ids(spark, n=2000):
    return spark.range(n).select(F.col("id").alias("k"))


def test_split_covers_and_partitions(spark):
    df = train_val_test_split(_ids(spark), "k", val_pct=10, test_pct=10)
    counts = {r["split"]: r["n"] for r in
              df.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 2000
    # md5 buckets are uniform: 10% targets land within a loose band
    assert 120 < counts["val"] < 280
    assert 120 < counts["test"] < 280


def test_split_stable_under_repartition(spark):
    df = _ids(spark)
    a = {(r["k"], r["split"]) for r in
         train_val_test_split(df, "k").collect()}
    b = {(r["k"], r["split"]) for r in
         train_val_test_split(df.repartition(13), "k").collect()}
    assert a == b


def test_hash_sample_is_subset_filter(spark):
    df = _ids(spark)
    pct10 = {r["k"] for r in hash_sample(df, "k", 10).collect()}
    pct20 = {r["k"] for r in hash_sample(df, "k", 20).collect()}
    # monotone: growing the fraction only ADDS rows (stable dev slices)
    assert pct10 <= pct20
    assert 100 < len(pct10) < 320


def test_bucket_matches_python_md5(spark):
    import hashlib

    rows = _ids(spark, 50).select(
        "k", hash_bucket(F.col("k"), 100).alias("b")
    ).collect()
    for r in rows:
        expect = int(hashlib.md5(str(r["k"]).encode()).hexdigest()[:8], 16) % 100
        assert r["b"] == expect, r


def test_mixture_plan_math_and_application(spark):
    """Mixture planning: the binding source gets rate 1.0, realized
    token mix matches the normalized targets, and applying the rates
    via deterministic hash sampling lands near the plan."""
    from pyspark.sql import functions as F

    from batch_processing_on_aws_spark.operators.sampling import (
        hash_bucket,
        mixture_plan,
    )

    rows = []
    did = 0
    for src, n, words in (("web", 300, 10), ("wiki", 60, 10), ("books", 40, 10)):
        for i in range(n):
            rows.append((did, src, " ".join(f"w{did}_{j}" for j in range(words))))
            did += 1
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    # targets: half web, 30% wiki, 20% books -> binding source is the
    # one with smallest tokens/weight = wiki (600/0.3=2000) vs
    # web (3000/0.5=6000) vs books (400/0.2=2000): tie wiki/books
    plan = {r["source"]: r for r in mixture_plan(
        docs, {"web": 0.5, "wiki": 0.3, "books": 0.2}
    ).collect()}
    assert set(plan) == {"web", "wiki", "books"}
    assert plan["wiki"]["sample_rate"] == 1.0 and plan["books"]["sample_rate"] == 1.0
    # scale = 2000 tokens -> web keeps 1000 of 3000
    assert abs(plan["web"]["sample_rate"] - 1000 / 3000) < 1e-6
    assert plan["web"]["target_weight"] == 0.5
    # realized mix: rate_s * T_s proportional to weights
    realized = {s: plan[s]["sample_rate"] * plan[s]["total_tokens"] for s in plan}
    tot = sum(realized.values())
    assert abs(realized["web"] / tot - 0.5) < 1e-6
    assert abs(realized["wiki"] / tot - 0.3) < 1e-6
    # apply via hash buckets: selected fraction tracks the plan
    rates = {s: plan[s]["sample_rate"] for s in plan}
    rate_col = F.coalesce(
        *[
            F.when(F.col("source") == s, F.lit(r))
            for s, r in rates.items()
        ]
    )
    picked = docs.where(
        hash_bucket(F.col("doc_id").cast("string"), 1000) < rate_col * 1000
    )
    n_web = picked.where("source = 'web'").count()
    assert 60 <= n_web <= 140  # 100 expected, deterministic hash spread
    assert picked.where("source = 'wiki'").count() == 60  # rate 1.0


def test_mixture_plan_guards(spark):
    """Invalid weights fail driver-side; a weighted zero-token source
    fails at execution instead of silently zeroing every rate."""
    import pytest
    from py4j.protocol import Py4JJavaError

    from batch_processing_on_aws_spark.operators.sampling import mixture_plan

    docs = spark.createDataFrame(
        [(1, "a", "some real tokens here"), (2, "b", "   ")],
        "doc_id long, source string, text string",
    )
    with pytest.raises(ValueError, match="non-empty"):
        mixture_plan(docs, {})
    with pytest.raises(ValueError, match="positive"):
        mixture_plan(docs, {"a": 0.5, "b": 0.0})
    with pytest.raises(Exception, match="zero tokens"):
        mixture_plan(docs, {"a": 0.5, "b": 0.5}).collect()
    # a weighted source with NO rows (misspelled name) must raise too,
    # not silently drop out of the weight normalization
    with pytest.raises(Exception, match="absent from the corpus"):
        mixture_plan(docs, {"a": 0.5, "c": 0.5}).collect()
    # and every weighted-and-present source still plans normally
    rows = {
        r["source"]: r
        for r in mixture_plan(docs.where("source = 'a'"), {"a": 1.0}).collect()
    }
    assert rows["a"]["sample_rate"] == 1.0


def test_temperature_weights_flatten_toward_uniform(spark):
    """τ=1 reproduces the natural shares; larger τ moves every weight
    toward uniform (the head shrinks, the tail grows); weights always
    sum to 1; τ ≤ 0 is rejected."""
    import pytest

    from batch_processing_on_aws_spark.operators.sampling import (
        temperature_weights,
    )

    docs = spark.createDataFrame(
        [
            (1, "en", "one two three four five six seven eight"),   # 8 tokens
            (2, "fr", "un deux trois quatre"),                      # 4
            (3, "rw", "rimwe kabiri"),                              # 2
        ],
        "doc_id long, source string, text string",
    )
    t1 = {r["source"]: r for r in temperature_weights(docs, 1.0).collect()}
    assert t1["en"]["target_weight"] == t1["en"]["natural_share"]
    assert abs(sum(r["target_weight"] for r in t1.values()) - 1.0) < 1e-5
    t5 = {r["source"]: r for r in temperature_weights(docs, 5.0).collect()}
    # head source gives up share, tail source gains
    assert t5["en"]["target_weight"] < t1["en"]["target_weight"]
    assert t5["rw"]["target_weight"] > t1["rw"]["target_weight"]
    assert abs(sum(r["target_weight"] for r in t5.values()) - 1.0) < 1e-5
    # ordering is preserved (flattened, never inverted)
    assert (
        t5["en"]["target_weight"]
        > t5["fr"]["target_weight"]
        > t5["rw"]["target_weight"]
    )
    with pytest.raises(ValueError, match="temperature"):
        temperature_weights(docs, 0.0)


def test_per_group_sample_exact_k_and_deterministic(spark):
    import pytest

    from batch_processing_on_aws_spark.operators.sampling import (
        per_group_sample,
    )

    df = spark.createDataFrame(
        [(i, "big" if i < 40 else "small") for i in range(46)],
        "doc_id long, source string",
    )
    got = per_group_sample(df, "source", "doc_id", k=3)
    counts = {r["source"]: r["n"] for r in
              got.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts == {"big": 3, "small": 3}
    # groups smaller than k return whole group
    tiny = per_group_sample(df.where("doc_id >= 44"), "source", "doc_id", k=3)
    assert tiny.count() == 2
    # deterministic across repartitionings
    a = sorted((r["source"], r["doc_id"]) for r in got.collect())
    b = sorted(
        (r["source"], r["doc_id"])
        for r in per_group_sample(
            df.repartition(7), "source", "doc_id", k=3
        ).collect()
    )
    assert a == b
    # a different seed draws a different sample
    c = sorted(
        (r["source"], r["doc_id"])
        for r in per_group_sample(
            df, "source", "doc_id", k=3, seed="v2"
        ).collect()
    )
    assert a != c
    with pytest.raises(ValueError, match="positive"):
        per_group_sample(df, "source", "doc_id", k=0)


def test_weighted_sample_proportional_inclusion(spark):
    """A-ES with md5-derived uniforms: a row with 50x the weight must
    be sampled far more often across seed replications (the inclusion-
    probability-proportional-to-weight contract, checked empirically
    over 40 independent salted draws)."""
    from batch_processing_on_aws_spark.operators.sampling import (
        weighted_sample,
    )

    rows = [(i, 50.0 if i == 0 else 1.0) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    heavy_hits = light_hits = 0
    for s in range(40):
        picked = {
            r["doc_id"]
            for r in weighted_sample(
                df, "w", k=10, key="doc_id", seed=f"s{s}"
            ).collect()
        }
        heavy_hits += 0 in picked
        light_hits += 1 in picked
    # heavy weight ~ always in a k=10 of n=100 draw; unit weight ~ k/n
    assert heavy_hits >= 35
    assert light_hits <= 15


def test_weighted_sample_grouped_and_guards(spark):
    from batch_processing_on_aws_spark.operators.sampling import (
        weighted_sample,
    )

    rows = [(i, "a" if i % 2 == 0 else "b", float(i % 7)) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, g string, w double")
    out = weighted_sample(df, "w", k=5, key="doc_id", group_col="g")
    got = out.collect()
    # zero-weight rows (i % 7 == 0) are excluded, ranks are 1..5/group
    assert all(r["weight"] > 0 for r in got)
    by_g = {}
    for r in got:
        by_g.setdefault(r["g"], []).append(r["sample_rank"])
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in by_g.values())
    # determinism: the same call returns the same sample
    again = weighted_sample(df, "w", k=5, key="doc_id", group_col="g")
    assert {(r["g"], r["doc_id"]) for r in got} == {
        (r["g"], r["doc_id"]) for r in again.collect()
    }


def test_weighted_sample_global_is_take_ordered(spark):
    """The global path must compile to TakeOrderedAndProject (merged
    per-partition heaps), not a single-partition window or sort."""
    from batch_processing_on_aws_spark.operators.sampling import (
        weighted_sample,
    )

    df = spark.range(0, 10_000, 1, 8).selectExpr(
        "id AS doc_id", "CAST(1 + id % 13 AS DOUBLE) AS w"
    )
    out = weighted_sample(df, "w", k=25, key="doc_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert out.count() == 25
