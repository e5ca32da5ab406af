"""Salted join / two-phase agg must be result-identical to the plain
forms — skew mitigation is a physical rewrite, not a semantic one."""

from pyspark.sql import functions as F

from batch_processing_on_aws_spark.operators.skew import (
    salted_join,
    two_phase_agg,
)


def _skewed(spark):
    # 90% of rows share one hot key
    rows = [("hot" if i % 10 else f"k{i}", i, float(i)) for i in range(500)]
    return spark.createDataFrame(rows, "k string, i int, v double")


def _dim(spark):
    rows = [("hot", "H"), ("k10", "A"), ("k20", "B"), ("k30", "C")]
    return spark.createDataFrame(rows, "k string, label string")


def test_salted_join_matches_plain_inner(spark):
    left, right = _skewed(spark), _dim(spark)
    got = sorted(
        (r["k"], r["i"], r["label"])
        for r in salted_join(left, right, on="k", n_salts=4).collect()
    )
    want = sorted(
        (r["k"], r["i"], r["label"]) for r in left.join(right, "k").collect()
    )
    assert got == want and len(got) > 0


def test_salted_join_matches_plain_left(spark):
    left, right = _skewed(spark), _dim(spark)
    got = sorted(
        (r["k"], r["i"], r["label"])
        for r in salted_join(left, right, on="k", n_salts=4, how="left").collect()
    )
    want = sorted(
        (r["k"], r["i"], r["label"])
        for r in left.join(right, "k", "left").collect()
    )
    assert got == want and len(got) == 500


def test_two_phase_agg_matches_plain(spark):
    df = _skewed(spark)
    got = {
        r["k"]: (r["total"], r["n"])
        for r in two_phase_agg(
            df,
            keys=["k"],
            partial_aggs=[F.sum("v").alias("s"), F.count(F.lit(1)).alias("c")],
            final_aggs=[
                F.sum("s").alias("total"),
                F.sum("c").cast("long").alias("n"),
            ],
            n_salts=4,
        ).collect()
    }
    want = {
        r["k"]: (r["total"], r["n"])
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("total"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want
