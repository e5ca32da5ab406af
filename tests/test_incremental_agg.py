import pytest
from pyspark.sql import functions as F

from batch_processing_on_aws_spark.operators.incremental_agg import (
    IncrementalAgg,
)

AGGS = {
    "n": ("count", "id"),
    "total": ("sum", "amount"),
    "lo": ("min", "amount"),
    "hi": ("max", "amount"),
}


def _rows(spark, rows):
    return spark.createDataFrame(rows, "grp string, id long, amount long")


def _full(df):
    return {
        r["grp"]: (r["n"], r["total"], r["lo"], r["hi"])
        for r in df.groupBy("grp")
        .agg(
            F.count("id").alias("n"),
            F.sum("amount").alias("total"),
            F.min("amount").alias("lo"),
            F.max("amount").alias("hi"),
        )
        .collect()
    }


def test_any_batch_split_equals_full_recompute(spark, tmp_path):
    rows = [
        ("a", i, (i * 7) % 23 - 5) for i in range(40)
    ] + [("b", 100 + i, i * 3) for i in range(7)] + [("c", 200, -9)]
    df = _rows(spark, rows)
    want = _full(df)
    for split in (2, 3, 5):
        agg = IncrementalAgg(
            str(tmp_path / f"state{split}"), keys=["grp"], aggs=AGGS
        )
        for k in range(split):
            agg.apply_batch(spark, df.where(F.col("id") % split == k))
        got = {
            r["grp"]: (r["n"], r["total"], r["lo"], r["hi"])
            for r in agg.read(spark).collect()
        }
        assert got == want, split


def test_new_groups_and_untouched_groups_survive(spark, tmp_path):
    agg = IncrementalAgg(str(tmp_path / "s"), keys=["grp"], aggs=AGGS)
    agg.apply_batch(spark, _rows(spark, [("a", 1, 10), ("b", 2, 20)]))
    # second batch touches only 'b' and introduces 'c'
    agg.apply_batch(spark, _rows(spark, [("b", 3, 5), ("c", 4, 7)]))
    got = {
        r["grp"]: (r["n"], r["total"], r["lo"], r["hi"])
        for r in agg.read(spark).collect()
    }
    assert got == {
        "a": (1, 10, 10, 10),   # untouched group unchanged
        "b": (2, 25, 5, 20),    # merged: count 1+1, sum 20+5, min/max widen
        "c": (1, 7, 7, 7),      # new group appears
    }


def test_unknown_agg_kind_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="unknown kind"):
        IncrementalAgg(
            str(tmp_path / "x"), keys=["grp"], aggs={"a": ("avg", "amount")}
        )
