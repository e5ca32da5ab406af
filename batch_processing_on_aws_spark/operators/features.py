"""Feature-engineering operators (extension surface).

The model-training side of a data platform needs the same
cross-engine-exact discipline as the curation side: a feature
computed differently by the training pipeline and the serving
pipeline is a silent skew bug. Every operator here follows the
module-family contract — exact integer aggregates, at most ONE float
expression over identical operands, quantized to integer units — so
a SQL oracle replays each feature bit-for-bit.

Reference scope: the reference's analytics stop at dashboard
aggregates (proc_1_spark_emr_dag.py); feature engineering is part of
the extension surface, like the curation/sketch families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def target_encode(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    m: float = 20.0,
    quant: int = 1_000_000,
) -> DataFrame:
    """Smoothed target encoding (empirical-Bayes mean encoding, the
    Micci-Barreca CS4 scheme): each category maps to

        enc = (Σ y(cat) + m · global_mean) / (n(cat) + m)

    — the category mean shrunk toward the global mean by pseudo-count
    ``m``, so rare categories don't memorize their few labels (the
    high-cardinality-categorical alternative to one-hot that doesn't
    explode the feature width).

    Exactness: ``target`` must be integer-valued (0/1 labels or
    micro-quantized regression targets); per-category Σy and n and the
    global Σy/N are exact BIGINTs, and ``enc`` is ONE float expression
    over them quantized to ``quant`` units — hash-exact replay in SQL.

    Plan shape: one per-category hash-agg + a broadcast 1-row global
    aggregate; nothing row-level leaves the executors. Apply to rows
    with a broadcast join against the returned mapping (categories ≪
    rows by definition of the encoding).

    Output: (cat_col, n BIGINT, enc_micro BIGINT).
    """
    y = F.col(target_col).cast("long")
    stats = df.groupBy(cat_col).agg(
        F.sum(y).alias("__sy"),
        F.count(y).cast("long").alias("n"),
    )
    glob = df.agg(
        F.sum(y).alias("__gy"),
        F.count(y).cast("long").alias("__gn"),
    )
    enc = F.round(
        (F.col("__sy") + F.lit(float(m)) * F.col("__gy") / F.col("__gn"))
        / (F.col("n") + F.lit(float(m)))
        * F.lit(float(quant))
    ).cast("long")
    return stats.crossJoin(F.broadcast(glob)).select(
        cat_col, "n", enc.alias("enc_micro")
    )


def winsorize(
    df: DataFrame,
    value_col: str,
    group_cols: tuple[str, ...] = (),
    lower_q: float = 0.01,
    upper_q: float = 0.99,
    precision_bits: int = 7,
) -> DataFrame:
    """Per-group winsorization (percentile clipping) at QUANTILE-
    SKETCH bounds: heavy-tailed features get their tails clipped to
    the [lower_q, upper_q] per-group quantiles before scaling — and
    the quantiles come from :func:`~.sketches.qhist_sketch`, NOT a
    per-group rank window, because ranking raw feature rows per group
    is data-sized work per key while the sketch is one hash-agg with
    a bounded-bucket cumulative pass (relative bound error ≤
    2^-precision_bits, deterministic, SQL-replayable — the
    scale-right trade for a tail clip, whose cutoffs are heuristic
    anyway).

    ``value_col`` must be non-negative integer-valued (the qhist
    domain — micro-quantize and offset upstream). Clipping uses the
    sketch buckets' INCLUSIVE LOWER BOUNDS, integer-exact in both
    engines.

    Output: input columns + ``clip_lo``/``clip_hi`` (the per-group
    bounds) + ``<value_col>_winsorized``.
    """
    from .sketches import qhist_quantiles, qhist_sketch

    gcols = list(group_cols)
    sk = qhist_sketch(df, value_col, tuple(gcols), precision_bits)
    bounds = qhist_quantiles(
        sk, tuple(gcols), qs=(lower_q, upper_q),
        precision_bits=precision_bits,
    ).select(
        *gcols,
        F.col(f"q{round(lower_q * 100)}").alias("clip_lo"),
        F.col(f"q{round(upper_q * 100)}").alias("clip_hi"),
    )
    joined = (
        df.join(F.broadcast(bounds), gcols) if gcols
        else df.crossJoin(F.broadcast(bounds))
    )
    v = F.col(value_col).cast("long")
    return joined.withColumn(
        f"{value_col}_winsorized",
        F.least(F.greatest(v, F.col("clip_lo")), F.col("clip_hi")),
    )


def quantile_normalize(
    df: DataFrame,
    value_col: str,
    group_cols: tuple[str, ...],
    precision_bits: int = 7,
    resolution: int = 1000,
) -> DataFrame:
    """Per-group quantile normalization onto the GLOBAL distribution:
    each row maps to its within-group quantile index (1..resolution),
    then to the global inverse-CDF value at that index — the
    distribution-alignment step that makes a feature comparable
    across sources whose scales drift (the microarray-normalization
    scheme, batch-effect removal for tabular features).

    Everything runs on :func:`~.sketches.qhist_sketch` state, never
    on per-group ranks of raw rows (data-sized work per key): the
    within-group quantile is the group's sketch-cumulative share at
    the row's bucket, quantized to ``ceil(cum·resolution/total)``,
    and the global inverse CDF is a ≤resolution-row lookup table
    derived from the global sketch by pure integer interval algebra
    (bucket b covers exactly the indexes q with
    ``floor(prev_cum·res/N) < q ≤ floor(cum·res/N)``). EVERY
    intermediate is an exact BIGINT — no float appears anywhere — so
    the row-level output replays hash-exact in SQL.

    ``value_col`` must be non-negative integer-valued (the qhist
    domain). Plan shape: two sketch hash-aggs + sketch-sized
    cumulative windows, one row-side equi-join on (group, bucket),
    one broadcast equi-join on the quantile index.

    Output: input columns + ``q_idx`` + ``<value_col>_qnorm`` (the
    global bucket lower bound at the row's quantile).
    """
    from pyspark.sql import Window

    from .sketches import qhist_bucket_low, qhist_sketch

    gcols = list(group_cols)
    res = int(resolution)

    gsk = qhist_sketch(df, value_col, tuple(gcols), precision_bits)
    wg = (
        Window.partitionBy(*gcols)
        .orderBy("bucket_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    gcum = gsk.select(
        *gcols,
        "bucket_id",
        F.sum("n").over(wg).alias("__cum"),
        F.sum("n").over(Window.partitionBy(*gcols)).alias("__total"),
    ).select(
        *gcols,
        "bucket_id",
        # ceil(cum*res/total) in pure INTEGER arithmetic (div, not /,
        # which would detour through doubles and lose exactness past
        # 2^53)
        F.expr(
            f"(__cum * {res} + __total - 1) div __total"
        ).cast("long").alias("q_idx"),
    )

    allsk = qhist_sketch(df, value_col, (), precision_bits)
    # global sketch is bounded (~(64-p)*2^p buckets): the unkeyed
    # cumulative window is sketch-sized by construction, never
    # data-sized
    wa = Window.orderBy("bucket_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    acum = allsk.select(
        "bucket_id",
        F.col("n").alias("__n_this"),
        F.sum("n").over(wa).alias("__cum"),
        F.sum("n").over(
            Window.partitionBy().orderBy("bucket_id").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("__total"),
    )
    lookup = (
        acum.select(
            "bucket_id",
            F.expr(
                f"((__cum - __n_this) * {res}) div __total"
            ).cast("long").alias("__qlo"),
            F.expr(f"(__cum * {res}) div __total")
            .cast("long").alias("__qhi"),
        )
        .where(F.col("__qlo") < F.col("__qhi"))
        .select(
            F.explode(
                F.sequence(F.col("__qlo") + F.lit(1), F.col("__qhi"))
            ).alias("q_idx"),
            qhist_bucket_low(F.col("bucket_id"), precision_bits)
            .cast("long")
            .alias(f"{value_col}_qnorm"),
        )
    )

    p = int(precision_bits)
    rows = (
        df.withColumn("__v", F.col(value_col).cast("long"))
        .withColumn("__e", (F.length(F.bin(F.col("__v"))) - 1).cast("int"))
        .withColumn("__shift", F.greatest(F.lit(0), F.col("__e") - F.lit(p)))
        .withColumn(
            "__b",
            F.when(F.col("__v") < F.lit(2**p), F.col("__v")).otherwise(
                F.col("__shift").cast("long") * F.lit(2**p)
                + F.expr("shiftright(__v, __shift)")
            ),
        )
        .drop("__e", "__shift")
    )
    joined = rows.join(
        gcum.withColumnRenamed("bucket_id", "__b"), gcols + ["__b"]
    )
    return (
        joined.join(F.broadcast(lookup), "q_idx")
        .drop("__b", "__v")
        .select(*df.columns, "q_idx", f"{value_col}_qnorm")
    )
