"""Date-spine densification and gap filling.

The reference's weather dimension has missing days and sparse columns
it simply drops (init-data-transformation.py:80-85); the dashboard
trend chart (README.md:39-41) silently skips absent dates. Proper
time-series hygiene is: generate the full calendar spine, left-join
the observed rollup, zero-fill counts, forward-fill carrying measures.
All of it is built-ins — ``sequence`` + ``explode`` for the spine
(distributed, not a driver loop) and ``last(ignorenulls)`` over a
running window for the fill.

Scale: the spine is calendar-bounded (366 rows/year — trivially
broadcastable), so the join is a broadcast join against the rollup,
and a per-key fill partitions the window by key; only the bounded
unkeyed variant runs a single-partition window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def date_spine(df_or_spark, start: str, end: str) -> DataFrame:
    """One row per day in [start, end] — ``sequence`` is evaluated on
    executors, never a driver-side date loop."""
    spark = getattr(df_or_spark, "sparkSession", df_or_spark)
    return spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(start).cast("date"),
                F.lit(end).cast("date"),
                F.expr("interval 1 day"),
            )
        ).alias("day")
    )


def densify_daily(
    daily: DataFrame,
    start: str,
    end: str,
    date_col: str = "day",
    zero_fill: tuple[str, ...] = (),
) -> DataFrame:
    """Join a daily rollup onto the full calendar spine (all spine
    days kept); listed count columns become 0 on missing days,
    everything else stays null (for a downstream fill to carry).

    Phrased as ``rollup RIGHT JOIN spine`` with the rollup broadcast:
    a spine-preserving outer join can only broadcast its build side,
    and both inputs here are calendar-bounded, so broadcasting the
    rollup gives a BroadcastHashJoin instead of a shuffle (a
    spine-side broadcast hint on a LEFT join is unsupported and would
    silently degrade)."""
    spine = date_spine(daily, start, end)
    out = F.broadcast(daily.withColumnRenamed(date_col, "day")).join(
        spine, "day", "right"
    )
    for c in zero_fill:
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(0)))
    return out


def _series_window(
    partition_cols: tuple[str, ...], bounded_input: bool, op: str
):
    """Window spec for a keyed series — or, ONLY under an explicit
    ``bounded_input=True`` declaration, a global single-partition
    window. An unkeyed window with no declaration raises: it plans a
    single-reducer global sort, the exact shape the engine eliminated
    everywhere else (``customer_spend_quartiles`` moved to the
    two-pass range-partitioned rank for this reason), and silently
    handing it to the next caller is a 100×-scale landmine. Use the
    :mod:`..operators.ranking` two-pass machinery for genuinely
    global, data-sized series."""
    if partition_cols:
        return Window.partitionBy(*partition_cols)
    if not bounded_input:
        raise ValueError(
            f"{op}: empty partition_cols plans a GLOBAL single-reducer "
            "window. Pass partition_cols for a keyed series, or declare "
            "bounded_input=True when the frame is provably bounded "
            "(e.g. a calendar spine of <=366 rows)."
        )
    return Window.partitionBy(F.lit(1))


def fill_forward(
    df: DataFrame,
    cols: tuple[str, ...],
    order_col: str = "day",
    partition_cols: tuple[str, ...] = (),
    bounded_input: bool = False,
) -> DataFrame:
    """Carry the last non-null observation forward (nulls before the
    first observation remain null). Partition by key columns when the
    series is keyed; the unkeyed form requires an explicit
    ``bounded_input=True`` declaration and is for calendar-bounded
    frames only (see module docstring)."""
    w = _series_window(partition_cols, bounded_input, "fill_forward") \
        .orderBy(order_col).rowsBetween(Window.unboundedPreceding, 0)
    out = df
    for c in cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out


def interpolate_linear(
    df: DataFrame,
    y_col: str,
    x_col: str,
    partition_cols: tuple[str, ...] = (),
    round_digits: int | None = None,
    out_col: str | None = None,
    bounded_input: bool = False,
) -> DataFrame:
    """Linear interpolation of NULL gaps in a keyed series — the
    value-filling sibling of :func:`fill_forward`: a missing point
    takes ``prev + (next - prev) · (x - xₚ)/(xₙ - xₚ)`` between its
    nearest non-null neighbours in ``x_col`` order; leading/trailing
    NULLs (no neighbour on one side) stay NULL, observed values pass
    through untouched.

    ``x_col`` must be numeric (for time series pass an exact integer
    index — epoch-hours, day number — not a raw timestamp; integer x
    keeps the single lerp float op running on identical operands in
    any engine, which with ``round_digits`` makes the result
    hash-exact cross-engine when y is integer-valued too).

    Shape: one shuffle on the key + two frames over the SAME sort
    (running last(struct) for the previous observation, reversed-frame
    first(struct) for the next) — O(1) state per row, no self-join,
    no explode; the struct rides atomically so NULL y can never
    resolve prev/next to different rows.
    """
    out = out_col or y_col
    w_base = _series_window(
        partition_cols, bounded_input, "interpolate_linear"
    ).orderBy(F.col(x_col).asc())
    w_prev = w_base.rowsBetween(Window.unboundedPreceding, 0)
    w_next = w_base.rowsBetween(0, Window.unboundedFollowing)

    obs = F.when(
        F.col(y_col).isNotNull(),
        F.struct(F.col(x_col).alias("x"), F.col(y_col).alias("y")),
    )
    prev = F.last(obs, ignorenulls=True).over(w_prev)
    nxt = F.first(obs, ignorenulls=True).over(w_next)

    frac = (F.col(x_col) - prev["x"]) / (nxt["x"] - prev["x"])
    lerp = prev["y"] + (nxt["y"] - prev["y"]) * frac
    filled = (
        F.when(F.col(y_col).isNotNull(), F.col(y_col).cast("double"))
        # an observation at the SAME x (duplicate-x rows can sort to
        # either side of the NULL) is the value — also guards the
        # 0/0 frac when both neighbours share x.
        .when(
            nxt.isNotNull() & (nxt["x"] == F.col(x_col)),
            nxt["y"].cast("double"),
        )
        .when(
            prev.isNotNull() & (prev["x"] == F.col(x_col)),
            prev["y"].cast("double"),
        )
        .when(prev.isNotNull() & nxt.isNotNull(), lerp)
    )
    if round_digits is not None:
        filled = F.round(filled, round_digits)
    return df.withColumn(out, filled)


#: mergeable aggregate kinds and how a coarser level re-aggregates a
#: finer level's partial: count partials MERGE BY SUM, the rest are
#: idempotent under their own function.
_MERGEABLE = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}


def multires_rollup(
    df: DataFrame,
    ts_col: str,
    measures: dict[str, tuple[str | None, str]],
    levels: tuple[str, ...] = ("hour", "day", "month"),
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Multi-resolution time rollup with PARTIAL-AGGREGATE REUSE —
    the hypertable "continuous aggregate" shape: the finest level is
    the only pass over the raw data; every coarser level re-aggregates
    the PREVIOUS level's partials (a frame that is already orders of
    magnitude smaller), so an hour→day→month hierarchy over 100 TB
    costs one full scan plus two trivial aggregations instead of
    three full scans. Only algebraic aggregates are accepted
    (count/sum/min/max — ``avg`` is ``sum/count`` downstream), which
    is exactly the class for which partial merge is lossless.

    ``measures`` maps output name → ``(column, kind)`` with kind in
    count|sum|min|max (column ignored for count). ``levels`` are
    ``date_trunc`` units ordered finest→coarsest; each must truncate
    coarser than the previous (trusted, not checked — a wrong order
    simply yields per-bucket re-grouping noise the tests would catch).
    Output: ``level`` (string), ``group_cols``, ``bucket``
    (truncated timestamp), one column per measure; one row set per
    level, unioned.

    Hash-exactness note: ``sum`` over doubles is order-dependent —
    for cross-engine-exact rollups sum integer-quantized columns
    (the golden query sums micro-units BIGINT) and keep doubles to
    min/max, which are order-free.
    """
    for name, (_, kind) in measures.items():
        if kind not in _MERGEABLE:
            raise ValueError(
                f"measure {name!r}: kind must be one of "
                f"{sorted(_MERGEABLE)} (algebraic/mergeable), got {kind!r}"
            )
    gcols = list(group_cols)

    def first_agg(name, col, kind):
        if kind == "count":
            return F.count(F.lit(1)).cast("long").alias(name)
        return getattr(F, kind)(F.col(col)).alias(name)

    def merge_agg(name, kind):
        return getattr(F, _MERGEABLE[kind])(F.col(name)).alias(name)

    cur = df.groupBy(
        *gcols, F.date_trunc(levels[0], F.col(ts_col)).alias("bucket")
    ).agg(*[first_agg(n, c, k) for n, (c, k) in measures.items()])
    out = cur.select(F.lit(levels[0]).alias("level"), *gcols, "bucket", *measures)
    for lvl in levels[1:]:
        cur = cur.groupBy(
            *gcols, F.date_trunc(lvl, F.col("bucket")).alias("bucket")
        ).agg(*[merge_agg(n, k) for n, (_, k) in measures.items()])
        out = out.unionByName(
            cur.select(F.lit(lvl).alias("level"), *gcols, "bucket", *measures)
        )
    return out


def rolling_zscore(
    df: DataFrame,
    y_col: str,
    x_col: str,
    partition_cols: tuple[str, ...] = (),
    window: int = 24,
    min_points: int = 12,
    quant: int = 1_000_000,
    bounded_input: bool = False,
) -> DataFrame:
    """Trailing-window z-score per point — the metric-anomaly
    primitive (traffic spikes, ingestion stalls, quality-score drift
    alarms): each point is scored against the PRECEDING ``window``
    observations (current point excluded, so an anomaly cannot mask
    itself), NULL until ``min_points`` of history exist.

    Exactness: ``y`` must be integer-valued (counts, quantized
    metrics); the window aggregates are exact BIGINT Σy and Σy², and
    the z-score collapses algebraically to
    ``(y·n − Σy) / sqrt(n·Σy² − (Σy)²)`` — inner terms all exact
    integers, ONE float expression quantized to ``quant`` units, so
    scores are hash-exact cross-engine (the module's standard trick).
    Zero-variance history yields NULL (no finite score exists).

    MAGNITUDE GUARD: the variance term ``n·Σy² − (Σy)²`` wraps BIGINT
    silently under non-ANSI Spark once ``window²·y²`` crosses 2⁶³, so
    rows where ``|y| > ⌊√2⁶³⌋/window`` (≈ 1.27e8 at the default
    window of 24) FAIL LOUDLY instead of producing garbage z-scores.
    Quantize continuous metrics COARSELY enough to fit (milli-units
    reach |metric| ≈ 1.2e5 at window 24; micro-quantizing to 1e12 is
    exactly the overflow case the guard exists for).

    Call on a DENSE series (``densify``/spine-join first) — on a
    sparse one a ROWS frame would silently span irregular gaps.
    """
    w = _series_window(
        partition_cols, bounded_input, "rolling_zscore"
    ).orderBy(F.col(x_col).asc()).rowsBetween(-window, -1)
    # |Σy| ≤ window·max|y| and n·Σy² ≤ window²·max|y|², so both inner
    # terms stay exact iff window²·max|y|² < 2⁶³ — i.e.
    # |y| ≤ ⌊√(2⁶³)⌋ / window. Beyond that the BIGINT multiply wraps
    # silently (non-ANSI mode); fail loudly instead.
    y_bound = 3_037_000_499 // max(int(window), 1)
    y_raw = F.col(y_col).cast("long")
    y = F.when(
        F.abs(y_raw) > y_bound,
        F.raise_error(
            F.concat(
                F.lit(
                    f"rolling_zscore: |{y_col}| exceeds the exact-BIGINT "
                    f"bound {y_bound} for window={window} (n·Σy² − (Σy)² "
                    "would wrap 2⁶³) — quantize the metric more coarsely: "
                ),
                y_raw.cast("string"),
            )
        ).cast("long"),
    ).otherwise(y_raw)
    n = F.count(y).over(w)
    s1 = F.sum(y).over(w)
    s2 = F.sum(y * y).over(w)
    num = y * n - s1
    var_n2 = n * s2 - s1 * s1  # n² · variance, exact BIGINT
    z = F.when(
        (n >= min_points) & (var_n2 > 0),
        F.round(
            num / F.sqrt(var_n2.cast("double")) * F.lit(float(quant))
        ).cast("long"),
    )
    return df.withColumn("z_micro", z).withColumn(
        "is_anomaly",
        F.when(z.isNotNull(), F.abs(F.col("z_micro")) > 3 * quant).otherwise(
            F.lit(False)
        ),
    )


def mad_anomaly(
    df: DataFrame,
    y_col: str,
    x_col: str,
    partition_cols: tuple[str, ...] = (),
    k: int = 5,
    min_points: int = 12,
    bounded_input: bool = False,
    broadcast_group_aggs: bool = False,
) -> DataFrame:
    """Median/MAD robust anomaly flags per series — the BREAKDOWN-
    RESISTANT complement of :func:`rolling_zscore`: mean/σ move with
    the outliers they are supposed to catch (one 100× spike inflates
    σ enough to hide the next one), while the median and the median
    absolute deviation ignore up to 50% contamination (Hampel's
    rule: flag |y − median| > k·MAD, classically k ≈ 3·1.4826 ≈ 4.5;
    the default 5 is that constant rounded against integer k·MAD).

    Exactness: STRICTLY INTEGER END TO END — ``y`` must be
    integer-valued (counts, quantized metrics), and both medians are
    LOWER medians (the ⌊(n+1)/2⌋-th order statistic), so median, MAD,
    deviations, and the k·MAD comparison are all exact BIGINTs with
    not one float expression anywhere. A SQL oracle replays
    rank-selection arithmetic bit-for-bit, and unlike the z-score
    there is no overflow regime: |y − med| never squares.

    Degenerate series behave per the textbook: MAD = 0 (over half
    the points share the median value) flags EVERY point off the
    median — Hampel's rule with zero spread; series shorter than
    ``min_points`` return NULL flags (no robust baseline exists).

    Plan shape: two keyed rank windows (one per median) + two
    hash-agg joins, each window partitioned by the series key and
    bounded by the series length — call on an AGGREGATED series
    (daily/hourly rollup), the same contract as the rest of the
    module (the unkeyed form requires ``bounded_input=True``).

    Output: input columns + (median, mad, deviation, is_anomaly
    boolean, NULL when the series has < min_points points).
    """
    w_rank = _series_window(
        partition_cols, bounded_input, "mad_anomaly"
    )

    # materialize the input series ONCE (round-15): it is referenced
    # by the count aggregate, both rank windows and both joins below,
    # so a caller's upstream subplan (a daily rollup over events, or a
    # whole seasonal_decompose) re-executed per consumer — measured 48
    # scans / 72 Exchanges in calendar_adjusted_anomalies' plan and
    # interleaved min-of-5 2.00 → 1.31 s with one checkpoint. The
    # input is an AGGREGATED series by this module's contract
    # (group×bucket-scale), so the materialization is bounded.
    df = df.localCheckpoint(eager=True)

    def pick(n):  # lower median: the floor((n+1)/2)-th order statistic
        return F.floor((n + F.lit(1)) / F.lit(2))

    if partition_cols:
        counts = df.groupBy(*partition_cols).agg(
            F.count(F.lit(1)).cast("long").alias("__n")
        )
    else:
        counts = df.agg(F.count(F.lit(1)).cast("long").alias("__n"))

    r1 = df.withColumn(
        "__r",
        F.row_number().over(
            w_rank.orderBy(F.col(y_col).asc(), F.col(x_col).asc())
        ),
    )
    # keyed per-group aggregates scale with key cardinality, so the
    # broadcast hint is OPT-IN: callers pass broadcast_group_aggs=True
    # only when the group count is bounded by construction (calendar
    # rollups, schema-bounded categories); otherwise AQE broadcasts
    # when it measures small. The unkeyed branch stays hinted: 1 row.
    def _hint(d):
        return F.broadcast(d) if broadcast_group_aggs else d

    if partition_cols:
        r1 = r1.join(_hint(counts), list(partition_cols))
    else:
        r1 = r1.crossJoin(F.broadcast(counts))
    med = r1.where(F.col("__r") == pick(F.col("__n"))).select(
        *(partition_cols or []),
        F.col(y_col).cast("long").alias("__med"),
    )
    if partition_cols:
        dev = df.join(_hint(med), list(partition_cols))
    else:
        dev = df.crossJoin(F.broadcast(med))
    dev = dev.withColumn(
        "__dev", F.abs(F.col(y_col).cast("long") - F.col("__med"))
    )
    r2 = dev.withColumn(
        "__r",
        F.row_number().over(
            w_rank.orderBy(F.col("__dev").asc(), F.col(x_col).asc())
        ),
    )
    if partition_cols:
        r2 = r2.join(_hint(counts), list(partition_cols))
    else:
        r2 = r2.crossJoin(F.broadcast(counts))
    mad = r2.where(F.col("__r") == pick(F.col("__n"))).select(
        *(partition_cols or []),
        F.col("__dev").alias("__mad"),
    )
    if partition_cols:
        out = dev.join(_hint(mad), list(partition_cols)).join(
            _hint(counts), list(partition_cols)
        )
    else:
        out = dev.crossJoin(F.broadcast(mad)).crossJoin(F.broadcast(counts))
    return out.select(
        *df.columns,
        F.col("__med").alias("median"),
        F.col("__mad").alias("mad"),
        F.col("__dev").alias("deviation"),
        F.when(F.col("__n") < min_points, F.lit(None).cast("boolean"))
        .otherwise(F.col("__dev") > F.lit(int(k)) * F.col("__mad"))
        .alias("is_anomaly"),
    )


def seasonal_decompose(
    df: DataFrame,
    y_col: str,
    x_col: str,
    partition_cols: tuple[str, ...] = (),
    period: int = 7,
    trend_window: int = 7,
    bounded_input: bool = False,
    broadcast_group_aggs: bool = False,
) -> DataFrame:
    """Robust seasonal decomposition (STL-lite on order statistics):
    y = trend + seasonal + residual, where

    - ``trend`` is the CENTERED rolling LOWER MEDIAN of y over
      ``trend_window`` points (truncated frames at series edges take
      the median of what exists),
    - ``seasonal`` is the per-phase (``x mod period``) lower median of
      the detrended series — the day-of-week / hour-of-day profile,
    - ``residual`` is what anomaly scoring should look at (feed it to
      :func:`mad_anomaly`: Hampel on residuals catches a Tuesday
      spike that a raw-series flag would excuse as "Tuesdays are
      high").

    Medians, not means, end to end: one outlier inside a trend frame
    or a phase group leaves both components unmoved (the same
    50%-breakdown argument as :func:`mad_anomaly`) — and LOWER
    medians keep the whole operator in exact BIGINT arithmetic with
    no float anywhere, so a SQL oracle replays it bit-for-bit.

    ``x_col`` must be an integer period index (epoch-day/epoch-hour);
    ``y`` integer-valued (quantize upstream). Plan shape: one keyed
    frame window whose per-row state is ≤ trend_window collected
    values, one keyed rank window per (series, phase) over the series
    rollup, two hash-agg joins — call on AGGREGATED series, the
    module contract (unkeyed form requires ``bounded_input=True``).

    Output: input columns + (trend, phase, seasonal, residual).
    """
    w = _series_window(partition_cols, bounded_input, "seasonal_decompose")
    half = int(trend_window) // 2
    frame = w.orderBy(F.col(x_col).asc()).rowsBetween(-half, half)
    arr = F.array_sort(
        F.collect_list(F.col(y_col).cast("long")).over(frame)
    )
    trend = F.element_at(
        arr,
        F.floor((F.size(arr) + F.lit(1)) / F.lit(2)).cast("int"),
    )
    base = (
        df.withColumn("trend", trend)
        .withColumn(
            "__detr", F.col(y_col).cast("long") - F.col("trend")
        )
        .withColumn(
            "phase",
            F.pmod(F.col(x_col).cast("long"), F.lit(int(period))),
        )
    )
    pcols = list(partition_cols) + ["phase"]
    counts = base.groupBy(*pcols).agg(
        F.count(F.lit(1)).cast("long").alias("__n")
    )
    wr = Window.partitionBy(*pcols).orderBy(
        F.col("__detr").asc(), F.col(x_col).asc()
    )
    # same opt-in contract as mad_anomaly: (series, phase) aggregates
    # are group-count-sized; hint only on caller-bounded group counts
    def _hint(d):
        return F.broadcast(d) if broadcast_group_aggs else d

    seas = (
        base.withColumn("__r", F.row_number().over(wr))
        .join(_hint(counts), pcols)
        .where(
            F.col("__r") == F.floor((F.col("__n") + F.lit(1)) / F.lit(2))
        )
        .select(*pcols, F.col("__detr").alias("seasonal"))
    )
    return (
        base.join(_hint(seas), pcols)
        .withColumn("residual", F.col("__detr") - F.col("seasonal"))
        .select(*df.columns, "trend", "phase", "seasonal", "residual")
    )
