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


def test_untouched_buckets_not_rewritten(spark, tmp_path):
    """Round-6 verdict task 3: a refresh touching one group must leave
    every untouched bucket's parquet files byte-identical (same paths,
    same content hash) — the O(touched groups) contract the module
    docstring claims. With many groups spread over many buckets, a
    one-group batch may rewrite only that group's bucket."""
    import hashlib
    import os

    def bucket_files(path):
        out = {}
        for root, _, files in os.walk(path):
            for f in files:
                if f.endswith(".parquet"):
                    p = os.path.join(root, f)
                    with open(p, "rb") as fh:
                        out[p] = hashlib.md5(fh.read()).hexdigest()
        return out

    path = str(tmp_path / "s")
    agg = IncrementalAgg(path, keys=["grp"], aggs=AGGS, n_buckets=8)
    seed = [(f"g{i}", i, i * 3) for i in range(40)]
    agg.apply_batch(spark, _rows(spark, seed))
    before = bucket_files(path)
    # one batch touching exactly one group
    agg.apply_batch(spark, _rows(spark, [("g7", 1000, 1)]))
    after = bucket_files(path)
    changed_dirs = {
        os.path.dirname(p)
        for p in set(before) ^ set(after)
        | {p for p in before.keys() & after.keys() if before[p] != after[p]}
    }
    assert len(changed_dirs) == 1, (
        f"expected exactly one rewritten bucket, got {sorted(changed_dirs)}"
    )
    # untouched buckets: every surviving file byte-identical
    untouched = {
        p for p in before if os.path.dirname(p) not in changed_dirs
    }
    assert untouched, "fixture degenerate: all buckets touched"
    for p in untouched:
        assert p in after and after[p] == before[p], f"rewritten: {p}"
    # and the aggregate is still correct
    got = {
        r["grp"]: (r["n"], r["total"], r["lo"], r["hi"])
        for r in agg.read(spark).collect()
    }
    assert got["g7"] == (2, 22, 1, 21)
    assert got["g3"] == (1, 9, 9, 9)


def test_all_null_sum_group_stays_null(spark, tmp_path):
    """SQL SUM over an all-NULL group is NULL; the incremental merge
    must preserve that (NULL iff both partials NULL), not coalesce it
    to 0 — the incremental == recompute contract."""
    agg = IncrementalAgg(
        str(tmp_path / "s"),
        keys=["grp"],
        aggs={"n": ("count", "id"), "total": ("sum", "amount")},
    )
    agg.apply_batch(
        spark, _rows(spark, [("a", 1, None), ("b", 2, 5)])
    )
    agg.apply_batch(
        spark, _rows(spark, [("a", 3, None), ("b", 4, None)])
    )
    got = {r["grp"]: (r["n"], r["total"]) for r in agg.read(spark).collect()}
    assert got == {"a": (2, None), "b": (2, 5)}
