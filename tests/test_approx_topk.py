"""Approximate distinct: bounded error vs exact. Top-k: plans as
TakeOrderedAndProject, not a global sort."""

from pyspark.sql import functions as F

from batch_processing_on_aws_spark.plans.golden import (
    approx_distinct_users,
    top_revenue_orders,
)
from batch_processing_on_aws_spark.sources.readers import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_approx_distinct_within_tolerance(spark):
    # The query's own contract: HLL++ estimate within 5% of exact,
    # and the exact counts it reports agree with an independent agg.
    out = {
        r["event_type"]: (r["n_users_exact"], r["approx_within_5pct"])
        for r in approx_distinct_users(spark, SF_DIR).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(out) == set(exact)
    for k, n in exact.items():
        assert out[k][0] == n, (k, out[k], n)
        assert out[k][1], (k, out[k], n)


def test_topk_plans_as_take_ordered(spark):
    df = top_revenue_orders(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_kmv_distinct_accuracy_and_exact_small_groups(spark):
    """KMV estimate within ~4 standard errors of the exact distinct
    count on real data; groups with < k distinct keys are EXACT; the
    whole operator is deterministic (same result twice)."""
    from batch_processing_on_aws_spark.operators.sketches import (
        kmv_distinct,
    )
    from batch_processing_on_aws_spark.sources import load_table

    events = load_table(spark, "/root/testdata/sf0.01", "events")
    k = 128
    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    got1 = {r["event_type"]: r["est_distinct"]
            for r in kmv_distinct(events, "user_id", "event_type", k=k).collect()}
    got2 = {r["event_type"]: r["est_distinct"]
            for r in kmv_distinct(events, "user_id", "event_type", k=k).collect()}
    assert got1 == got2  # deterministic, unlike RNG-seeded sketches
    se = 1.0 / (k - 2) ** 0.5
    for g, n in exact.items():
        est = got1[g]
        if n < k:
            assert est == float(n), g
        else:
            assert abs(est - n) / n < 4 * se, (g, est, n)


def test_kmv_union_matches_direct_sketch(spark):
    """Mergeability: union of per-source sketches estimates the global
    distinct count about as well as one direct sketch over the union —
    and exactly equals it when the k smallest hashes coincide."""
    from batch_processing_on_aws_spark.operators.sketches import (
        kmv_distinct,
        kmv_union_estimate,
    )
    from batch_processing_on_aws_spark.sources import load_table

    events = load_table(spark, "/root/testdata/sf0.01", "events")
    k = 128
    sketches = kmv_distinct(events, "user_id", "event_type", k=k)
    merged = kmv_union_estimate(sketches, k=k).collect()[0]["est_distinct"]
    # one direct sketch over everything
    direct = kmv_distinct(
        events.withColumn("__all", F.lit(1)), "user_id", "__all", k=k
    ).collect()[0]["est_distinct"]
    # the union's k smallest hashes ARE the direct sketch's k smallest
    # (same hash function, same data), so the two estimates are equal
    assert merged == direct
    exact = events.select("user_id").where(
        F.col("user_id").isNotNull()
    ).distinct().count()
    se = 1.0 / (k - 2) ** 0.5
    assert abs(merged - exact) / exact < 4 * se


def test_kmv_intersect_exact_below_k(spark):
    from batch_processing_on_aws_spark.operators.sketches import (
        kmv_distinct,
        kmv_intersect_estimate,
    )

    rows = [("a", i) for i in range(30)] + [("b", i) for i in range(20, 50)]
    df = spark.createDataFrame(rows, ["grp", "key"])
    sk = kmv_distinct(df, "key", "grp", k=128)
    (r,) = kmv_intersect_estimate(sk, "grp", k=128).collect()
    # union (50) below k: sketch holds every hash, both estimates exact
    assert (r["group_a"], r["group_b"]) == ("a", "b")
    assert r["n_union_kept"] == 50
    assert r["est_union"] == 50.0
    assert r["est_intersection"] == 10.0


def test_kmv_intersect_estimator_accuracy_above_k(spark):
    from batch_processing_on_aws_spark.operators.sketches import (
        kmv_distinct,
        kmv_intersect_estimate,
    )

    # |A| = |B| = 2000, overlap 1000, union 3000; k = 128 forces the
    # rho-scaled estimator path. RSE ~ 1/sqrt(k-2) ~ 9%; allow 4 sigma.
    rows = [("a", i) for i in range(2000)]
    rows += [("b", i) for i in range(1000, 3000)]
    df = spark.createDataFrame(rows, ["grp", "key"])
    sk = kmv_distinct(df, "key", "grp", k=128)
    (r,) = kmv_intersect_estimate(sk, "grp", k=128).collect()
    assert r["n_union_kept"] == 128
    assert abs(r["est_union"] - 3000) / 3000 < 0.36, r
    assert abs(r["est_intersection"] - 1000) / 1000 < 0.55, r


def test_kmv_intersect_deterministic_under_repartition(spark):
    from batch_processing_on_aws_spark.operators.sketches import (
        kmv_distinct,
        kmv_intersect_estimate,
    )

    offs = {"x": 0, "y": 3, "z": 6}
    rows = [(g, i) for g, o in offs.items() for i in range(o, 400)]
    df = spark.createDataFrame(rows, ["grp", "key"])
    a = kmv_intersect_estimate(
        kmv_distinct(df, "key", "grp", k=64), "grp", k=64
    ).orderBy("group_a", "group_b").collect()
    b = kmv_intersect_estimate(
        kmv_distinct(df.repartition(13), "key", "grp", k=64), "grp", k=64
    ).orderBy("group_a", "group_b").collect()
    assert a == b and len(a) == 3


def test_kmv_ledger_lossless_and_idempotent(spark, tmp_path):
    from batch_processing_on_aws_spark.operators.sketches import (
        KmvLedger,
        kmv_distinct,
    )

    rows = [("g%d" % (i % 3), i % 500) for i in range(2000)]
    df = spark.createDataFrame(rows, ["grp", "key"])
    ledger = KmvLedger(str(tmp_path / "kmv"), "grp", "key", k=64)
    # three arbitrary batch splits, one re-delivered (at-least-once)
    b1 = df.where("key % 3 = 0")
    b2 = df.where("key % 3 = 1")
    b3 = df.where("key % 3 = 2")
    for b in (b1, b2, b2, b3):  # b2 applied twice
        ledger.update(spark, b)
    got = {
        r["grp"]: (r["n_distinct_kept"], r["kmv_hashes"], r["est_distinct"])
        for r in ledger.read(spark).collect()
    }
    want = {
        r["grp"]: (r["n_distinct_kept"], r["kmv_hashes"], r["est_distinct"])
        for r in kmv_distinct(df, "key", "grp", k=64).collect()
    }
    # lossless merge: state arrays BIT-IDENTICAL to the one-shot
    # full-table sketch, re-delivery a no-op
    assert got == want and len(got) == 3


def test_kmv_trailing_distinct_exact_below_k(spark):
    from batch_processing_on_aws_spark.operators.sketches import (
        kmv_distinct,
        kmv_trailing_distinct,
    )

    # day 0: users 0-9; day 1: 5-14; day 3: 100-104 (day 2 absent)
    rows = [(0, u) for u in range(10)]
    rows += [(1, u) for u in range(5, 15)]
    rows += [(3, u) for u in range(100, 105)]
    df = spark.createDataFrame(rows, ["day", "user"])
    sk = kmv_distinct(df, "user", "day", k=128)
    got = {
        r["day"]: (r["n_distinct_kept"], r["est_distinct"])
        for r in kmv_trailing_distinct(
            sk.select("day", "kmv_hashes"), "day", window=3, k=128
        ).collect()
    }
    # frames (trailing 3 periods, only PRESENT days in output):
    # day 0: {0..9} = 10; day 1: {0..14} = 15; day 3: day1 ∪ day3 = 15
    assert got == {0: (10, 10.0), 1: (15, 15.0), 3: (15, 15.0)}


def test_kmv_trailing_equals_union_of_frame_sketches(spark):
    from batch_processing_on_aws_spark.operators.sketches import (
        kmv_distinct,
        kmv_trailing_distinct,
        kmv_union_estimate,
    )

    # composition property: each frame's estimate equals
    # kmv_union_estimate over exactly that frame's per-day sketches
    rows = [(d, (d * 131 + j) % 900) for d in range(6) for j in range(300)]
    df = spark.createDataFrame(rows, ["day", "user"])
    k = 64
    sk = kmv_distinct(df, "user", "day", k=k)
    got = {
        r["day"]: r["est_distinct"]
        for r in kmv_trailing_distinct(
            sk.select("day", "kmv_hashes"), "day", window=3, k=k
        ).collect()
    }
    for day in range(6):
        frame = sk.where(
            (sk["day"] >= day - 2) & (sk["day"] <= day)
        )
        want = kmv_union_estimate(frame, k=k).collect()[0]["est_distinct"]
        assert got[day] == want, (day, got[day], want)


def test_tfidf_pairs_invariant_under_repartition(spark):
    from batch_processing_on_aws_spark.operators.textstats import (
        tfidf_cosine_pairs,
    )

    rows = [
        (i, "shared rare%d tokens alpha beta common words %d" % (i % 7, i))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    a = sorted(
        tuple(r) for r in tfidf_cosine_pairs(df, threshold=0.2).collect()
    )
    b = sorted(
        tuple(r)
        for r in tfidf_cosine_pairs(
            df.repartition(17), threshold=0.2
        ).collect()
    )
    assert a == b and len(a) > 0


def test_kmv_ledger_accepts_brand_new_groups_later(spark, tmp_path):
    from batch_processing_on_aws_spark.operators.sketches import (
        KmvLedger,
        kmv_distinct,
    )

    ledger = KmvLedger(str(tmp_path / "kmv2"), "grp", "key", k=32)
    b1 = spark.createDataFrame([("a", i) for i in range(100)], ["grp", "key"])
    # batch 2 introduces a group the state has never seen
    b2 = spark.createDataFrame(
        [("a", i) for i in range(50, 150)] + [("b", i) for i in range(40)],
        ["grp", "key"],
    )
    ledger.update(spark, b1)
    ledger.update(spark, b2)
    got = {
        r["grp"]: r["kmv_hashes"] for r in ledger.read(spark).collect()
    }
    want = {
        r["grp"]: r["kmv_hashes"]
        for r in kmv_distinct(b1.unionByName(b2), "key", "grp", k=32).collect()
    }
    assert got == want and set(got) == {"a", "b"}
