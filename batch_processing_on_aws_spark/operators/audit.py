"""Data-quality audit operators (SURVEY.md §2.5 A1-A2; M7).

The reference profiles missing values with a one-pass conditional
count per column — ``count(when(isnan(c) | isNull(c), c))`` —
(reference: init-data-transformation.py:41,67-77) and eyeballs the
output. This engine keeps the single-pass shape (ONE hash aggregate,
partial+final, regardless of column count) and adds asserted
thresholds so the audit is a test, not a printout.

``isnan`` is only defined on float/double (SURVEY §1.3); for other
types only ``isNull`` applies — handled per-column here.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _missing_pred(df: DataFrame, col: str) -> Column:
    dtype = df.schema[col].dataType
    c = F.col(col)
    if isinstance(dtype, (T.DoubleType, T.FloatType)):
        return F.isnan(c) | c.isNull()
    return c.isNull()


def missing_value_counts(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """A1 — per-column null/NaN counts in one aggregate pass."""
    cols = list(cols or df.columns)
    return df.agg(
        *[
            F.count(F.when(_missing_pred(df, c), c)).alias(c)
            for c in cols
        ]
    )


def missing_value_ratios(
    df: DataFrame, cols: Sequence[str] | None = None, decimals: int = 2
) -> DataFrame:
    """A2 — per-column missing ratio (reference: init-data-transformation.py:76
    computes count(when)/count(lit(1)) with F.round)."""
    cols = list(cols or df.columns)
    total = F.count(F.lit(1))
    return df.agg(
        *[
            F.round(
                F.count(F.when(_missing_pred(df, c), c)) / total, decimals
            ).alias(c)
            for c in cols
        ]
    )


def assert_max_missing_ratio(
    df: DataFrame, thresholds: dict[str, float]
) -> dict[str, float]:
    """Threshold-asserted audit: raise if any column's missing ratio
    exceeds its bound. Encodes the reference's manual '>70% null ⇒
    drop' rule (init-data-transformation.py:80-85) as a check."""
    ratios = missing_value_ratios(df, list(thresholds), decimals=6).collect()[0].asDict()
    bad = {c: r for c, r in ratios.items() if r is not None and r > thresholds[c]}
    if bad:
        raise AssertionError(f"missing-ratio thresholds exceeded: {bad}")
    return ratios


def drop_sparse_columns(df: DataFrame, max_missing_ratio: float = 0.7) -> DataFrame:
    """The reference's sparse-column drop (init-data-transformation.py:80-85),
    generalized: drop every column whose missing ratio exceeds the bound.
    One aggregate pass to decide, one projection to apply."""
    ratios = missing_value_ratios(df, decimals=6).collect()[0].asDict()
    keep = [c for c in df.columns if (ratios[c] or 0.0) <= max_missing_ratio]
    return df.select(*keep)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "doc_id",
    fingerprint: Column | None = None,
) -> DataFrame:
    """Corpus snapshot diff — the dataset-versioning audit every
    training-data pipeline runs between two ingests: which records
    were added, removed, changed, or carried unchanged.

    ``fingerprint`` is the content identity (default: md5 of the
    ``text`` column); rows are matched by ``key_col`` and compared by
    fingerprint. Output: (key, status in
    {added, removed, changed, unchanged}, old_fp, new_fp) — one row
    per key present in EITHER snapshot, so the result doubles as a
    changelog (filter) and an audit rollup (groupBy status).

    Scale shape: one full-outer shuffle join on the key — fingerprints
    (16 B) cross the exchange, never content; on bucketed snapshot
    tables (bucketBy the key at write) the exchange disappears
    entirely. Null-safe on the key like every merge-family operator.
    """
    fp = fingerprint if fingerprint is not None else F.md5(F.col("text"))
    # explicit presence markers: null KEYS (matched null-safely) and
    # null FINGERPRINTS (null content) must not masquerade as
    # missing-side rows
    o = old.select(
        F.col(key_col).alias("__k"),
        fp.alias("old_fp"),
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        F.col(key_col).alias("__nk"),
        fp.alias("new_fp"),
        F.lit(True).alias("__in_new"),
    )
    joined = o.join(n, F.col("__k").eqNullSafe(F.col("__nk")), "full_outer")
    status = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(F.col("old_fp").eqNullSafe(F.col("new_fp")), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(
        F.coalesce(F.col("__k"), F.col("__nk")).alias(key_col),
        status.alias("status"),
        "old_fp",
        "new_fp",
    )


def source_drift(
    old: DataFrame,
    new: DataFrame,
    group_col: str = "source",
) -> DataFrame:
    """Per-group distribution drift between two corpus snapshots — the
    companion audit to :func:`snapshot_diff` and the retuning signal
    for ``sampling.mixture_plan``: when a source's share moves, the
    mixture weights that realized yesterday's target no longer do.

    Output: (group, old_n, new_n, old_share, new_share, share_delta)
    for every group present in EITHER snapshot (absent side counts 0).
    Counts are exact longs; shares are single divisions of exact
    integers rounded to 6 — bit-stable cross-engine, no log/entropy
    terms whose libm rounding could differ between engines.

    Scale shape: one hash-agg per snapshot (map-side partials) and a
    full-outer join on the LOW-CARDINALITY group key plus two 1-row
    scalar broadcasts for the totals — nothing corpus-sized shuffles.
    """
    def counted(df, n_name):
        return df.groupBy(F.col(group_col).alias("__g")).agg(
            F.count(F.lit(1)).alias(n_name)
        )

    o = counted(old, "old_n")
    n = counted(new, "new_n")
    joined = (
        o.join(n, o["__g"].eqNullSafe(n["__g"]), "full_outer")
        .select(
            F.coalesce(o["__g"], n["__g"]).alias(group_col),
            F.coalesce(F.col("old_n"), F.lit(0)).alias("old_n"),
            F.coalesce(F.col("new_n"), F.lit(0)).alias("new_n"),
        )
    )
    tot_o = old.agg(F.count(F.lit(1)).alias("__to"))
    tot_n = new.agg(F.count(F.lit(1)).alias("__tn"))
    old_share = F.round(
        F.col("old_n") / F.greatest(F.col("__to"), F.lit(1)), 6
    )
    new_share = F.round(
        F.col("new_n") / F.greatest(F.col("__tn"), F.lit(1)), 6
    )
    return (
        joined.crossJoin(F.broadcast(tot_o))
        .crossJoin(F.broadcast(tot_n))
        .select(
            group_col,
            "old_n",
            "new_n",
            old_share.alias("old_share"),
            new_share.alias("new_share"),
            F.round(new_share - old_share, 6).alias("share_delta"),
        )
    )


def psi_numeric_drift(
    old: DataFrame,
    new: DataFrame,
    value_col: str,
    bin_edges: Sequence[float],
) -> DataFrame:
    """Population Stability Index over a NUMERIC column's binned
    distribution — the numeric-feature sibling of :func:`source_drift`
    (categorical shares) and the standard "did this feature's
    distribution move between snapshots" monitor for training-data
    pipelines (doc length, quality score, token count drift between
    crawls).

    Bins are caller-fixed edges (deterministic, schema-stable between
    runs — never data-derived quantiles, which would make two
    snapshots' bins incomparable): bin i covers [edge_i, edge_{i+1});
    values below the first edge land in bin 0's underflow twin (-1),
    values at/above the last edge in bin len(edges)-1. Shares are
    add-one smoothed ((n+1)/(N+B), so empty bins contribute finite
    terms) and each bin's PSI term (p−q)·ln(p/q) is quantized ONCE to
    micro-units BIGINT — the bigram-LM trick: the single float
    expression runs on identical integer triples in any engine, so
    the per-bin terms and their integer sum are hash-exact
    cross-engine.

    Output: one row per occupied-or-empty bin —
    (bin, old_n, new_n, psi_micro) — plus exact counts; total PSI =
    SUM(psi_micro)/1e6 downstream. Shape: one hash-agg per snapshot
    over a #bins-cardinality key, a broadcast full-outer align on the
    bin spine, two 1-row scalar broadcasts for the totals. Nothing
    corpus-sized shuffles; NULL values are excluded (they are
    missing-ness, audited by missing_value_counts, not distribution
    mass).
    """
    edges = list(bin_edges)
    if len(edges) < 2 or sorted(edges) != edges:
        raise ValueError("bin_edges must be >= 2 ascending values")
    n_bins = len(edges)  # bins: -1 (underflow), 0..len-2, len-1 (overflow)

    def binned(df, n_name):
        b = F.lit(-1)
        for i, e in enumerate(edges):
            b = F.when(F.col(value_col) >= F.lit(float(e)), F.lit(i)).otherwise(b)
        return (
            df.where(F.col(value_col).isNotNull())
            .groupBy(b.alias("bin"))
            .agg(F.count(F.lit(1)).alias(n_name))
        )

    spark = old.sparkSession
    spine = spark.range(-1, n_bins).select(F.col("id").cast("int").alias("bin"))
    o = binned(old, "old_n")
    n = binned(new, "new_n")
    joined = (
        spine.join(F.broadcast(o), "bin", "left")
        .join(F.broadcast(n), "bin", "left")
        .select(
            "bin",
            F.coalesce(F.col("old_n"), F.lit(0)).cast("long").alias("old_n"),
            F.coalesce(F.col("new_n"), F.lit(0)).cast("long").alias("new_n"),
        )
    )
    tot_o = old.where(F.col(value_col).isNotNull()).agg(
        F.count(F.lit(1)).alias("__to")
    )
    tot_n = new.where(F.col(value_col).isNotNull()).agg(
        F.count(F.lit(1)).alias("__tn")
    )
    n_cells = F.lit(n_bins + 1)  # underflow + len-1 inner + overflow
    p = (F.col("old_n") + 1) / (F.col("__to") + n_cells)
    q = (F.col("new_n") + 1) / (F.col("__tn") + n_cells)
    psi_micro = F.round((p - q) * F.log(p / q) * F.lit(1_000_000.0)).cast(
        "long"
    )
    return (
        joined.crossJoin(F.broadcast(tot_o))
        .crossJoin(F.broadcast(tot_n))
        .select("bin", "old_n", "new_n", psi_micro.alias("psi_micro"))
    )
