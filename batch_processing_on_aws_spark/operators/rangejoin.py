"""Range (interval) join via bucketed equi-join.

Semantics: pair (l, r) where ``l.on == r.on`` and ``r.ts`` falls in
``[l.ts + lower_s, l.ts + upper_s]`` (inclusive bounds, seconds).

A naive theta-join (``BETWEEN`` inside a non-equi condition) plans as
BroadcastNestedLoopJoin — O(|L|·|R|) comparisons, hopeless at scale.
The standard distributed plan instead buckets time into windows of
width = interval span: every right row lands in one bucket, every
left row's interval overlaps at most two consecutive buckets, so an
equi-join on ``(key, bucket)`` generates a candidate set only a
constant factor above the true result, then an exact ``BETWEEN``
refine keeps true pairs. One shuffle on a well-distributed composite
key; no nested loop anywhere.

The reference has no range join (SURVEY.md §2.4); extension surface
for time-windowed attribution / feature generation.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str] | str,
    lower_s: float,
    upper_s: float,
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload: Sequence[str] | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Inner range join; right payload columns return as
    ``<name><suffix>``. ``lower_s``/``upper_s`` bound
    ``r.ts - l.ts`` in seconds (e.g. ``(-3600, 0)`` = right events in
    the hour up to and including the left timestamp)."""
    if upper_s < lower_s:
        raise ValueError("upper_s must be >= lower_s")
    keys = [on] if isinstance(on, str) else list(on)
    payload_cols = (
        list(payload)
        if payload is not None
        else [c for c in right.columns if c not in keys]
    )
    span_us = max(int((upper_s - lower_s) * 1_000_000), 1)
    lo_us = int(lower_s * 1_000_000)
    hi_us = int(upper_s * 1_000_000)

    # cast("timestamp") is a no-op on TIMESTAMP and an exact conversion
    # on TIMESTAMP_NTZ under the UTC session tz; unix_micros accepts
    # only TIMESTAMP.
    l_us = F.unix_micros(F.col(left_ts).cast("timestamp"))
    r_us = F.unix_micros(F.col(right_ts).cast("timestamp"))

    l2 = left.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor((l_us + F.lit(lo_us)) / F.lit(span_us)),
                F.floor((l_us + F.lit(hi_us)) / F.lit(span_us)),
            )
        ),
    ).withColumn("__l_us", l_us)
    r2 = right.select(
        *keys,
        F.floor(r_us / F.lit(span_us)).alias("__bucket"),
        r_us.alias("__r_us"),
        *[F.col(c).alias(f"{c}{suffix}") for c in payload_cols],
    )
    joined = l2.join(r2, on=[*keys, "__bucket"]).where(
        F.col("__r_us").between(
            F.col("__l_us") + F.lit(lo_us), F.col("__l_us") + F.lit(hi_us)
        )
    )
    return joined.drop("__bucket", "__l_us", "__r_us")


_AUTO_BIN_MIN_S = 60
_AUTO_BIN_MAX_S = 30 * 86_400


def _auto_bin_width(
    intervals: DataFrame,
    start_col: str,
    end_col: str,
    open_end_ts: Column | None,
) -> int:
    """Median interval duration rounded UP to the next power-of-two
    seconds, clamped to [60 s, 30 d]. One bounded driver aggregate
    (approxQuantile over the duration column) — never a data-sized
    collect. Falls back to one day when the table has no bounded
    interval to sample (all-NULL ends with no ``open_end_ts``)."""
    end_eff = (
        F.coalesce(F.col(end_col), open_end_ts)
        if open_end_ts is not None
        else F.col(end_col)
    )
    dur_s = (
        (
            F.unix_micros(end_eff.cast("timestamp"))
            - F.unix_micros(F.col(start_col).cast("timestamp"))
        )
        / F.lit(1_000_000.0)
    ).alias("__dur_s")
    sampled = intervals.select(dur_s).where(
        F.col("__dur_s").isNotNull() & (F.col("__dur_s") > 0)
    )
    med = sampled.approxQuantile("__dur_s", [0.5], 0.01)
    if not med:
        return 86_400
    # next power of two >= median (stabilizes the choice against
    # sampler jitter), floored at 64 s, capped at 30 d
    width = 1 << max(
        _AUTO_BIN_MIN_S.bit_length(), (max(1, int(med[0])) - 1).bit_length()
    )
    return min(width, _AUTO_BIN_MAX_S)


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: Sequence[str] | str,
    point_ts: str,
    start_col: str,
    end_col: str,
    bin_width_seconds: int | None = None,
    open_end_ts: Column | None = None,
    max_bins_per_interval: int = 4096,
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval containment join — the INTERVAL-TABLE sibling
    of ``range_join`` (which windows around each left point): joins
    each point row to every interval row of the same key containing it
    under HALF-OPEN ``start <= ts < end`` semantics (the SCD2
    convention, so chained validity intervals never double-match a
    boundary point).

    Same bucketed plan — intervals EXPLODE into every
    ``bin_width_seconds`` bin they overlap, points land in exactly
    one, a shuffled equi-join on ``(key, bin)`` generates candidates
    and the exact containment predicate refines. Explosion factor is
    ``ceil(interval_len / bin_width)``; ``max_bins_per_interval``
    FAILS LOUDLY beyond it (an unbounded interval silently exploding
    into millions of bin rows is the classic range-join incident at
    scale) — bound open intervals via ``open_end_ts`` (a timestamp
    Column substituted for NULL ``end_col``, used by both the binning
    and the predicate). All bin arithmetic is exact ``unix_micros``
    BIGINT floor-division, so sub-second interval tails cannot be
    missed the way second-granularity binning would.

    ``bin_width_seconds=None`` (the default) AUTO-SIZES the bin from
    the interval table itself: one bounded aggregate takes the median
    interval duration (open ends bounded via ``open_end_ts``; NULL
    ends with no bound are ignored by the sampler) and the width
    rounds UP to the next power-of-two seconds, clamped to
    [60 s, 30 d]. Median-sized bins mean a TYPICAL interval explodes
    into ~2–3 bin rows while points stay 1 row — the balance point of
    the explosion/selectivity trade — and the long tail still trips
    ``max_bins_per_interval`` loudly instead of silently fanning out.
    The probe is a driver-side ``approxQuantile`` (same bounded-
    aggregate pattern as ``ranking.global_row_numbers``); pass an
    explicit width when the plan must be reproducible without a probe
    (every oracled registry query does).

    Output: all ``points`` columns + the non-key ``intervals``
    columns; ``how="left"`` keeps uncontained points NULL-extended.
    Overlapping intervals yield one row per containing interval —
    dedup is the caller's policy decision.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left: {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    ivl_cols = [c for c in intervals.columns if c not in keys]
    clash = set(ivl_cols) & set(points.columns)
    if clash:
        raise ValueError(
            f"interval columns collide with point columns: {sorted(clash)}"
        )

    if bin_width_seconds is None:
        bin_width_seconds = _auto_bin_width(
            intervals, start_col, end_col, open_end_ts
        )
    width_us = F.lit(int(bin_width_seconds) * 1_000_000)
    end_eff = (
        F.coalesce(F.col(end_col), open_end_ts)
        if open_end_ts is not None
        else F.col(end_col)
    )

    def _bin(us: Column) -> Column:
        # exact integer floor-div: (us - us % w) is a precise multiple
        # of w, so the double division is exact — a plain floor(us/w)
        # can round across the boundary at day-sized widths.
        return ((us - us % width_us) / width_us).cast("long")

    sbin = _bin(F.unix_micros(F.col(start_col).cast("timestamp")))
    # end is EXCLUSIVE: step back one microsecond before flooring so
    # an interval ending exactly on a bin edge does not occupy it.
    ebin = _bin(F.unix_micros(end_eff.cast("timestamp")) - 1)
    n_bins = ebin - sbin + 1

    ivl = intervals.select(
        *keys,
        *ivl_cols,
        end_eff.alias("__end_eff"),
        sbin.alias("__sbin"),
        F.when(
            n_bins > max_bins_per_interval,
            F.raise_error(
                F.concat(
                    F.lit(
                        "interval_join: interval fans out into more than "
                        f"{max_bins_per_interval} bins of "
                        f"{bin_width_seconds}s — widen bin_width_seconds, "
                        "bound the interval, or raise "
                        "max_bins_per_interval: start="
                    ),
                    F.col(start_col).cast("string"),
                )
            ).cast("long"),
        )
        .otherwise(n_bins)
        .alias("__nbins"),
    )
    exploded = ivl.select(
        *keys,
        *ivl_cols,
        "__end_eff",
        F.explode(
            F.sequence(F.col("__sbin"), F.col("__sbin") + F.col("__nbins") - 1)
        ).alias("__bin"),
    )

    # explicit side aliases: when points and intervals share lineage
    # (e.g. SCD2 intervals built from the same table as the points),
    # bare df[col] references can resolve to the same attribute and
    # silently degrade the key predicate to trivially-true.
    pts = points.withColumn(
        "__bin", _bin(F.unix_micros(F.col(point_ts).cast("timestamp")))
    ).alias("__pts")
    exploded = exploded.alias("__ivl")
    cond = [F.col("__pts.__bin") == F.col("__ivl.__bin")] + [
        F.col(f"__pts.{k}") == F.col(f"__ivl.{k}") for k in keys
    ]
    joined = pts.join(exploded, cond, "inner").where(
        (F.col(f"__pts.{point_ts}") >= F.col(f"__ivl.{start_col}"))
        & (F.col(f"__pts.{point_ts}") < F.col("__ivl.__end_eff"))
    )
    matched = joined.select(
        *[F.col(f"__pts.{c}") for c in points.columns],
        *[F.col(f"__ivl.{c}") for c in ivl_cols],
    )
    if how == "inner":
        return matched
    # left: points with no containing interval come back NULL-extended.
    # The anti-join must be NULL-SAFE per column: a by-name anti-join
    # (null-unsafe equality) would never match a point row carrying a
    # NULL payload column against its own copy in ``matched``, so such
    # a row would be emitted TWICE — once enriched and once
    # NULL-extended. eqNullSafe keys keep it an equi-join (hash/SMJ
    # planable), never a nested loop.
    m = matched.select(*points.columns).alias("__m")
    p2 = points.alias("__p2")
    anti_cond = reduce(
        lambda a, b: a & b,
        [
            F.col(f"__p2.{c}").eqNullSafe(F.col(f"__m.{c}"))
            for c in points.columns
        ],
    )
    missing = p2.join(m, anti_cond, "left_anti").select(
        *[F.col(f"__p2.{c}") for c in points.columns]
    )
    for c in ivl_cols:
        missing = missing.withColumn(
            c, F.lit(None).cast(intervals.schema[c].dataType)
        )
    return matched.unionByName(missing)
