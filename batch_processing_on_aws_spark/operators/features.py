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
