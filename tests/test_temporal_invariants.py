"""Cross-operator temporal invariants: the SCD2 / interval-join /
as-of family must agree with each other on randomized (seeded,
md5-derived) observation streams — properties no single-operator
unit test pins."""

import hashlib
from datetime import datetime

from pyspark.sql import functions as F

from batch_processing_on_aws_spark.operators.asof import asof_join
from batch_processing_on_aws_spark.operators.rangejoin import interval_join
from batch_processing_on_aws_spark.operators.scd import scd2_collapse


def _u(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _ts(day, hour=0):
    return datetime(2024, 1, day, hour)


def _obs_rows(n=150, keys=5, tiers=3):
    return [
        (
            _u(f"k{i}") % keys,
            f"t{_u(f'v{i}') % tiers}",
            _ts(1 + _u(f'd{i}') % 28, _u(f'h{i}') % 24),
            i,
        )
        for i in range(n)
    ]


def test_scd2_intervals_partition_the_timeline(spark):
    """Per key: intervals are disjoint, chained (valid_to == next
    valid_from), cover [first obs, open), exactly one is_current, and
    consecutive intervals carry DIFFERENT tiers (maximal runs)."""
    rows = _obs_rows()
    df = spark.createDataFrame(
        rows, "user_id long, tier string, ts timestamp, obs_id long"
    )
    out = scd2_collapse(df, ["user_id"], ["tier"], "ts", "obs_id").collect()
    by_key: dict[int, list] = {}
    for r in out:
        by_key.setdefault(r["user_id"], []).append(r)
    assert set(by_key) == {r[0] for r in rows}
    for k, ivls in by_key.items():
        ivls.sort(key=lambda r: r["valid_from"])
        first_obs = min(r[2] for r in rows if r[0] == k)
        assert ivls[0]["valid_from"] == first_obs
        assert sum(1 for r in ivls if r["is_current"]) == 1
        assert ivls[-1]["valid_to"] is None and ivls[-1]["is_current"]
        for a, b in zip(ivls, ivls[1:]):
            assert a["valid_to"] == b["valid_from"], k  # chained
            assert a["tier"] != b["tier"], k  # maximal runs


def test_scd2_collapse_is_idempotent(spark):
    """Collapsing the run starts again (start ts as obs ts) returns
    the identical dimension — the fixpoint property that makes
    scd2_apply_changes' replay-starts-as-observations exact."""
    rows = _obs_rows()
    df = spark.createDataFrame(
        rows, "user_id long, tier string, ts timestamp, obs_id long"
    )
    dim = scd2_collapse(
        df, ["user_id"], ["tier"], "ts", "obs_id", tiebreak_out="rt"
    )
    again = scd2_collapse(
        dim.select(
            "user_id", "tier", F.col("valid_from").alias("ts"),
            F.col("rt").alias("obs_id"),
        ),
        ["user_id"], ["tier"], "ts", "obs_id", tiebreak_out="rt",
    )
    key = lambda r: (  # noqa: E731
        r["user_id"], r["tier"], r["valid_from"], r["valid_to"],
        r["is_current"], r["rt"],
    )
    assert {key(r) for r in dim.collect()} == {key(r) for r in again.collect()}


def test_interval_join_agrees_with_asof_on_scd2_dim(spark):
    """Point-in-time lookup two ways: containment against the SCD2
    intervals == backward as-of against the run STARTS (SCD2 intervals
    are half-open and chained, so the interval containing ts is
    exactly the greatest start <= ts). The two operators share no
    code path — agreement pins both."""
    rows = _obs_rows()
    obs = spark.createDataFrame(
        rows, "user_id long, tier string, ts timestamp, obs_id long"
    )
    dim = scd2_collapse(obs, ["user_id"], ["tier"], "ts", "obs_id")
    points = spark.createDataFrame(
        [
            (i, _u(f"pk{i}") % 5, _ts(1 + _u(f"pd{i}") % 30, _u(f"ph{i}") % 24))
            for i in range(120)
        ],
        "event_id long, user_id long, ts timestamp",
    )
    horizon = F.lit(_ts(31))
    via_interval = {
        r["event_id"]: r["tier"]
        for r in interval_join(
            points, dim.drop("is_current"),
            on=["user_id"], point_ts="ts",
            start_col="valid_from", end_col="valid_to",
            bin_width_seconds=86400, open_end_ts=horizon, how="left",
        ).collect()
    }
    starts = dim.select(
        "user_id", F.col("valid_from").alias("sts"),
        F.col("tier").alias("a_tier"),
    )
    via_asof = {
        r["event_id"]: r["a_tier_matched"]
        for r in asof_join(
            points, starts, on="user_id", left_ts="ts", right_ts="sts",
            payload=["a_tier"],
        ).collect()
    }
    # containment caps at the horizon; asof does not — align by
    # restricting to points below it (all are, by construction)
    assert via_interval == via_asof
