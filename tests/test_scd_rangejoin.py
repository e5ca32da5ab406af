"""scd2_collapse + interval_join contract tests — handcrafted frames
plus seeded brute-force equivalence."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from batch_processing_on_aws_spark.operators.rangejoin import interval_join
from batch_processing_on_aws_spark.operators.scd import scd2_collapse


def _ts(day, hour=0, minute=0, second=0, us=0):
    return datetime(2024, 1, day, hour, minute, second, us)


# ---------------------------------------------------------------- SCD2

def test_scd2_runs_and_current(spark):
    obs = spark.createDataFrame(
        [
            (1, "bronze", _ts(1), 10),
            (1, "bronze", _ts(3), 11),   # same value: extends the run
            (1, "silver", _ts(5), 12),
            (1, "silver", _ts(7), 13),
            (1, "gold", _ts(9), 14),
            (2, "gold", _ts(2), 20),     # second key, single run
        ],
        "user_id long, tier string, ts timestamp, obs_id long",
    )
    out = scd2_collapse(
        obs, ["user_id"], ["tier"], "ts", tiebreak="obs_id"
    ).collect()
    rows = {(r["user_id"], r["tier"]): r for r in out}
    assert len(out) == 4
    r = rows[(1, "bronze")]
    assert (r["valid_from"], r["valid_to"], r["is_current"]) == (
        _ts(1), _ts(5), False
    )
    r = rows[(1, "silver")]
    assert (r["valid_from"], r["valid_to"], r["is_current"]) == (
        _ts(5), _ts(9), False
    )
    r = rows[(1, "gold")]
    assert (r["valid_from"], r["valid_to"], r["is_current"]) == (
        _ts(9), None, True
    )
    r = rows[(2, "gold")]
    assert (r["valid_from"], r["valid_to"], r["is_current"]) == (
        _ts(2), None, True
    )


def test_scd2_same_ts_tiebreak_and_null_runs(spark):
    obs = spark.createDataFrame(
        [
            (1, "a", _ts(1), 1),
            (1, "b", _ts(1), 2),      # same ts: obs_id 2 wins -> 'b'
            (1, None, _ts(3), 3),     # NULL run starts
            (1, None, _ts(4), 4),     # NULL == NULL: same run
            (1, "c", _ts(6), 5),
        ],
        "user_id long, tier string, ts timestamp, obs_id long",
    )
    out = sorted(
        scd2_collapse(obs, ["user_id"], ["tier"], "ts", "obs_id").collect(),
        key=lambda r: r["valid_from"],
    )
    assert [(r["tier"], r["valid_from"], r["valid_to"]) for r in out] == [
        ("b", _ts(1), _ts(3)),
        (None, _ts(3), _ts(6)),
        ("c", _ts(6), None),
    ]


def test_scd2_leading_null_is_a_run(spark):
    """A key whose FIRST observed value is NULL still opens a run —
    the first-row guard must not classify it as 'unchanged'."""
    obs = spark.createDataFrame(
        [(1, None, _ts(1), 1), (1, "x", _ts(2), 2)],
        "user_id long, tier string, ts timestamp, obs_id long",
    )
    out = sorted(
        scd2_collapse(obs, ["user_id"], ["tier"], "ts", "obs_id").collect(),
        key=lambda r: r["valid_from"],
    )
    assert [(r["tier"], r["is_current"]) for r in out] == [
        (None, False), ("x", True)
    ]


def test_scd2_multi_attr_change(spark):
    """Any one attribute changing opens a new interval."""
    obs = spark.createDataFrame(
        [
            (1, "a", 1, _ts(1), 1),
            (1, "a", 2, _ts(2), 2),   # second attr changed
            (1, "a", 2, _ts(3), 3),   # unchanged
        ],
        "user_id long, tier string, level int, ts timestamp, obs_id long",
    )
    out = scd2_collapse(
        obs, ["user_id"], ["tier", "level"], "ts", "obs_id"
    ).collect()
    assert len(out) == 2


# -------------------------------------------------------- interval_join

@pytest.fixture(scope="module")
def ivl_frames(spark):
    points = spark.createDataFrame(
        [
            (1, 10, _ts(2)),        # inside first interval
            (2, 10, _ts(5)),        # exactly at a boundary: next wins
            (3, 10, _ts(9, 23, 59, 59)),  # just before open end
            (4, 20, _ts(4)),        # no interval for this key
            (5, 10, _ts(1) ),       # at the very start: matches
        ],
        "event_id long, user_id long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            (10, "bronze", _ts(1), _ts(5)),
            (10, "silver", _ts(5), _ts(8)),
            (10, "gold", _ts(8), None),   # open
        ],
        "user_id long, tier string, valid_from timestamp, valid_to timestamp",
    )
    return points, intervals


def test_interval_join_halfopen_and_open_end(ivl_frames):
    points, intervals = ivl_frames
    out = {
        r["event_id"]: r["tier"]
        for r in interval_join(
            points, intervals, ["user_id"], "ts",
            "valid_from", "valid_to",
            bin_width_seconds=86400,
            open_end_ts=F.lit(_ts(31)),
        ).collect()
    }
    assert out == {1: "bronze", 2: "silver", 3: "gold", 5: "bronze"}


def test_interval_join_left_null_extends(ivl_frames):
    points, intervals = ivl_frames
    out = {
        r["event_id"]: r["tier"]
        for r in interval_join(
            points, intervals, ["user_id"], "ts",
            "valid_from", "valid_to",
            bin_width_seconds=86400,
            open_end_ts=F.lit(_ts(31)),
            how="left",
        ).collect()
    }
    assert out[4] is None and len(out) == 5


def test_interval_join_left_null_payload_not_duplicated(spark):
    """A MATCHED point row carrying a NULL payload column must come
    back exactly once (enriched) — the anti-join that finds unmatched
    points is null-safe per column, so a NULL never makes a row fail
    to match its own copy and show up a second time NULL-extended."""
    points = spark.createDataFrame(
        [
            (1, 10, _ts(2), None),       # matched, NULL payload
            (2, 10, _ts(2), "ok"),       # matched, non-NULL payload
            (3, 20, _ts(2), None),       # unmatched, NULL payload
        ],
        "event_id long, user_id long, ts timestamp, note string",
    )
    intervals = spark.createDataFrame(
        [(10, "bronze", _ts(1), _ts(5))],
        "user_id long, tier string, valid_from timestamp, valid_to timestamp",
    )
    rows = interval_join(
        points, intervals, ["user_id"], "ts", "valid_from", "valid_to",
        bin_width_seconds=86400, how="left",
    ).collect()
    assert len(rows) == 3
    by_id = {r["event_id"]: r for r in rows}
    assert by_id[1]["tier"] == "bronze" and by_id[1]["note"] is None
    assert by_id[2]["tier"] == "bronze"
    assert by_id[3]["tier"] is None


def test_interval_join_subsecond_end(spark):
    """An interval ending mid-second must still match points in that
    second's fractional tail (exact-micros binning, not whole-second
    unix_timestamp)."""
    points = spark.createDataFrame(
        [(1, 1, _ts(1, 0, 0, 0, 300_000)), (2, 1, _ts(1, 0, 0, 0, 700_000))],
        "event_id long, k long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [(1, "in", _ts(1), _ts(1, 0, 0, 0, 500_000))],
        "k long, tag string, s timestamp, e timestamp",
    )
    out = {
        r["event_id"]: r["tag"]
        for r in interval_join(
            points, intervals, ["k"], "ts", "s", "e", bin_width_seconds=1,
            how="left",
        ).collect()
    }
    assert out == {1: "in", 2: None}


def test_interval_join_fanout_guard(spark):
    points = spark.createDataFrame(
        [(1, 1, _ts(2))], "event_id long, k long, ts timestamp"
    )
    intervals = spark.createDataFrame(
        [(1, "wild", _ts(1), _ts(30))],
        "k long, tag string, s timestamp, e timestamp",
    )
    with pytest.raises(Exception, match="fans out"):
        interval_join(
            points, intervals, ["k"], "ts", "s", "e",
            bin_width_seconds=60, max_bins_per_interval=100,
        ).collect()


def test_interval_join_matches_bruteforce(spark):
    import hashlib

    def u(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    prows = [
        (i, u(f"pk{i}") % 4, _ts(1 + u(f"pd{i}") % 28, u(f"ph{i}") % 24))
        for i in range(80)
    ]
    irows = []
    for i in range(30):
        s = _ts(1 + u(f"is{i}") % 25, u(f"ih{i}") % 24)
        e = _ts(
            1 + u(f"is{i}") % 25 + 1 + u(f"il{i}") % 3, u(f"ie{i}") % 24
        )
        irows.append((i, u(f"ik{i}") % 4, s, e))
    points = spark.createDataFrame(
        prows, "event_id long, k long, ts timestamp"
    )
    intervals = spark.createDataFrame(
        irows, "ivl_id long, k long, s timestamp, e timestamp"
    )
    got = {
        (r["event_id"], r["ivl_id"])
        for r in interval_join(
            points, intervals, ["k"], "ts", "s", "e",
            bin_width_seconds=6 * 3600,
        ).collect()
    }
    want = {
        (p[0], i[0])
        for p in prows
        for i in irows
        if p[1] == i[1] and i[2] <= p[2] < i[3]
    }
    assert got == want


# ------------------------------------------------- incremental SCD2

def _collapse(spark, rows):
    from batch_processing_on_aws_spark.operators.scd import scd2_collapse

    df = spark.createDataFrame(
        rows, "user_id long, tier string, ts timestamp, obs_id long"
    )
    return scd2_collapse(
        df, ["user_id"], ["tier"], "ts", "obs_id", tiebreak_out="run_tiebreak"
    )


def _rowset(df):
    return {
        (
            r["user_id"], r["tier"], r["valid_from"], r["valid_to"],
            r["is_current"], r["run_tiebreak"],
        )
        for r in df.collect()
    }


def test_scd2_apply_changes_equals_full_recompute(spark):
    import hashlib

    from batch_processing_on_aws_spark.operators.scd import (
        scd2_apply_changes,
    )

    def u(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    rows = [
        (
            u(f"k{i}") % 6,
            "t" + str(u(f"v{i}") % 3),
            _ts(1 + (i * 29) % 28, u(f"h{i}") % 24),
            i,
        )
        for i in range(120)
    ]
    rows.sort(key=lambda r: r[2])
    full = _rowset(_collapse(spark, rows))

    # three in-order batches split at global time cutoffs
    b1 = [r for r in rows if r[2] < _ts(10)]
    b2 = [r for r in rows if _ts(10) <= r[2] < _ts(20)]
    b3 = [r for r in rows if r[2] >= _ts(20)]
    dim = _collapse(spark, b1)
    for batch in (b2, b3):
        obs = spark.createDataFrame(
            batch, "user_id long, tier string, ts timestamp, obs_id long"
        )
        dim = scd2_apply_changes(
            dim, obs, ["user_id"], ["tier"], "ts", "obs_id"
        )
    assert _rowset(dim) == full


def test_scd2_apply_changes_untouched_keys_pass_through(spark):
    from batch_processing_on_aws_spark.operators.scd import (
        scd2_apply_changes,
    )

    dim = _collapse(
        spark,
        [(1, "a", _ts(1), 1), (1, "b", _ts(3), 2), (2, "x", _ts(2), 3)],
    )
    obs = spark.createDataFrame(
        [(2, "y", _ts(5), 9)],
        "user_id long, tier string, ts timestamp, obs_id long",
    )
    out = scd2_apply_changes(dim, obs, ["user_id"], ["tier"], "ts", "obs_id")
    got = _rowset(out)
    # key 1 rows byte-identical to the original dimension
    assert {r for r in got if r[0] == 1} == {
        r for r in _rowset(dim) if r[0] == 1
    }
    # key 2 gained a run
    k2 = sorted((r for r in got if r[0] == 2), key=lambda r: r[2])
    assert [(r[1], r[4]) for r in k2] == [("x", False), ("y", True)]


def test_scd2_apply_changes_same_ts_tiebreak_exact(spark):
    from batch_processing_on_aws_spark.operators.scd import (
        scd2_apply_changes,
    )

    dim = _collapse(spark, [(1, "a", _ts(5), 10)])
    # smaller tiebreak at the same ts: stored winner stands
    lose = spark.createDataFrame(
        [(1, "z", _ts(5), 4)],
        "user_id long, tier string, ts timestamp, obs_id long",
    )
    out = scd2_apply_changes(dim, lose, ["user_id"], ["tier"], "ts", "obs_id")
    assert [r["tier"] for r in out.collect()] == ["a"]
    # greater tiebreak: new observation wins the timestamp
    win = spark.createDataFrame(
        [(1, "z", _ts(5), 40)],
        "user_id long, tier string, ts timestamp, obs_id long",
    )
    out = scd2_apply_changes(dim, win, ["user_id"], ["tier"], "ts", "obs_id")
    assert [r["tier"] for r in out.collect()] == ["z"]


def test_scd2_apply_changes_late_errors_and_replays(spark):
    from batch_processing_on_aws_spark.operators.scd import (
        scd2_apply_changes,
    )

    dim = _collapse(spark, [(1, "a", _ts(1), 1), (1, "b", _ts(9), 2)])
    late = spark.createDataFrame(
        [(1, "c", _ts(4), 5)],
        "user_id long, tier string, ts timestamp, obs_id long",
    )
    with pytest.raises(Exception, match="strictly-late"):
        scd2_apply_changes(
            dim, late, ["user_id"], ["tier"], "ts", "obs_id"
        ).collect()
    out = scd2_apply_changes(
        dim, late, ["user_id"], ["tier"], "ts", "obs_id", late="replay"
    )
    runs = sorted(
        ((r["tier"], r["valid_from"]) for r in out.collect()),
        key=lambda t: t[1],
    )
    assert runs == [("a", _ts(1)), ("c", _ts(4)), ("b", _ts(9))]


def test_interval_join_auto_bin_width(ivl_frames):
    """bin_width_seconds=None sizes bins from the median interval
    duration (pow2-rounded, clamped) — results identical to an
    explicit width."""
    from batch_processing_on_aws_spark.operators.rangejoin import (
        _auto_bin_width,
    )

    points, intervals = ivl_frames
    w = _auto_bin_width(intervals, "valid_from", "valid_to", F.lit(_ts(31)))
    assert 60 <= w <= 30 * 86_400
    assert w & (w - 1) == 0  # power of two
    auto = {
        r["event_id"]: r["tier"]
        for r in interval_join(
            points, intervals, ["user_id"], "ts", "valid_from", "valid_to",
            open_end_ts=F.lit(_ts(31)),
        ).collect()
    }
    explicit = {
        r["event_id"]: r["tier"]
        for r in interval_join(
            points, intervals, ["user_id"], "ts", "valid_from", "valid_to",
            bin_width_seconds=86400, open_end_ts=F.lit(_ts(31)),
        ).collect()
    }
    assert auto == explicit


def test_auto_bin_width_all_null_ends_falls_back(spark):
    from batch_processing_on_aws_spark.operators.rangejoin import (
        _auto_bin_width,
    )

    intervals = spark.createDataFrame(
        [(10, "a", _ts(1), None)],
        "user_id long, tier string, valid_from timestamp, valid_to timestamp",
    )
    assert _auto_bin_width(intervals, "valid_from", "valid_to", None) == 86_400
