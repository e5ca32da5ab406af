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
