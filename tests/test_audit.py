import math

import pytest

from batch_processing_on_aws_spark.operators.audit import (
    assert_max_missing_ratio,
    drop_sparse_columns,
    missing_value_counts,
    missing_value_ratios,
)


@pytest.fixture()
def audit_df(spark):
    return spark.createDataFrame(
        [
            (1, None, float("nan")),
            (2, "x", 1.5),
            (None, "y", None),
            (4, None, float("nan")),
        ],
        "id: int, name: string, score: double",
    )


def test_missing_counts_one_pass(audit_df):
    row = missing_value_counts(audit_df).collect()[0]
    # isnan counts for double; isNull for all types (reference
    # init-data-transformation.py:41)
    assert (row["id"], row["name"], row["score"]) == (1, 2, 3)


def test_missing_ratios(audit_df):
    row = missing_value_ratios(audit_df).collect()[0]
    assert (row["id"], row["name"], row["score"]) == (0.25, 0.5, 0.75)


def test_threshold_assert(audit_df):
    with pytest.raises(AssertionError, match="score"):
        assert_max_missing_ratio(audit_df, {"id": 0.5, "score": 0.7})
    assert_max_missing_ratio(audit_df, {"id": 0.5})


def test_drop_sparse_columns(audit_df):
    """The reference's >70%-null drop rule
    (init-data-transformation.py:80-85) as an operator."""
    out = drop_sparse_columns(audit_df, max_missing_ratio=0.7)
    assert out.columns == ["id", "name"]


def test_snapshot_diff_statuses(spark):
    """added/removed/changed/unchanged classification, including the
    null-key and null-content edge cases presence markers exist for."""
    from pyspark.sql import functions as F

    from batch_processing_on_aws_spark.operators.audit import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (None, "nk"), (5, None)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (4, "d"), (None, "nk"), (5, None)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["status"] for r in snapshot_diff(old, new).collect()}
    assert out[1] == "unchanged"
    assert out[2] == "changed"
    assert out[3] == "removed"
    assert out[4] == "added"
    # null KEY rows match null-safely -> unchanged, not added+removed
    assert out[None] == "unchanged"
    # null CONTENT with same key: null fingerprints compare null-safely
    assert out[5] == "unchanged"
    # rollup shape: one row per key in either snapshot
    assert snapshot_diff(old, new).count() == 6
    # custom fingerprint column
    byid = snapshot_diff(old, new, fingerprint=F.lit("x"))
    assert {r["status"] for r in byid.collect()} <= {
        "added", "removed", "unchanged"
    }


def test_source_drift_shares_and_absent_groups(spark):
    from batch_processing_on_aws_spark.operators.audit import source_drift

    old = spark.createDataFrame(
        [(1, "web"), (2, "web"), (3, "web"), (4, "wiki")],
        "doc_id long, source string",
    )
    new = spark.createDataFrame(
        [(1, "web"), (2, "wiki"), (3, "wiki"), (4, "code")],
        "doc_id long, source string",
    )
    out = {r["source"]: r for r in source_drift(old, new).collect()}
    assert set(out) == {"web", "wiki", "code"}
    assert (out["web"]["old_n"], out["web"]["new_n"]) == (3, 1)
    assert out["web"]["old_share"] == 0.75 and out["web"]["new_share"] == 0.25
    assert out["web"]["share_delta"] == -0.5
    assert (out["code"]["old_n"], out["code"]["new_n"]) == (0, 1)
    assert out["code"]["old_share"] == 0.0
    # empty old snapshot: shares divide by the guarded total, no NaN
    empty = old.where("doc_id < 0")
    out2 = {r["source"]: r for r in source_drift(empty, new).collect()}
    assert out2["wiki"]["old_share"] == 0.0 and out2["wiki"]["old_n"] == 0
