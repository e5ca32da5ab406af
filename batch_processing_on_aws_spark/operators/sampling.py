"""Deterministic hash-based sampling and dataset splitting.

A training-data pipeline needs sampling that is (a) reproducible
across runs and engines, (b) stable under repartitioning, and (c)
executable as a pushed-down filter — none of which ``df.sample``
(seeded per-partition RNG, partitioning-dependent) provides. The
standard fix is content hashing: bucket every row by a cryptographic
hash of its key and select buckets. The same arithmetic runs in any
engine (md5 is bit-identical everywhere), so the DuckDB oracle can
reproduce the exact row set — these are PASS-grade golden queries,
not rows-only.

Scale: the hash is a per-row projection (no shuffle, no state); the
split is a plain filter, so Catalyst pushes the surviving columns
down to the scan and the split never materializes the rejected rows.
At 100 TB a 1% hash sample reads all row groups but writes 1% —
exactly what you want for a reproducible dev slice.

The reference has no sampling surface (SURVEY.md §2.10 — its only
"sampling" is ``show(n)`` eyeballing); this extends the engine for
the LLM-pipeline use cases (train/val/test splits, dev slices).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(key: Column, n_buckets: int = 100) -> Column:
    """Deterministic bucket in [0, n_buckets) from md5 of the key's
    string form. Uses the first 8 hex chars (32 bits) — uniform and
    cheap, and reproducible bit-for-bit in DuckDB:
    ``CAST(('0x' || substr(md5(k), 1, 8)) AS BIGINT) % n``."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10)
        .cast("long")
        % n_buckets
    )


def hash_sample(df: DataFrame, key: str, fraction_pct: int) -> DataFrame:
    """Keep rows whose hash bucket (out of 100) falls below
    ``fraction_pct`` — a reproducible, engine-independent sample."""
    return df.where(hash_bucket(F.col(key)) < fraction_pct)


def train_val_test_split(
    df: DataFrame,
    key: str,
    val_pct: int = 1,
    test_pct: int = 1,
) -> DataFrame:
    """Label every row with a deterministic ``split`` column
    (train/val/test). Hash-keyed: the same key always lands in the
    same split, across runs, engines, and repartitions — the property
    that prevents train/test leakage when the corpus is re-ingested."""
    b = hash_bucket(F.col(key))
    return df.withColumn(
        "split",
        F.when(b < test_pct, F.lit("test"))
        .when(b < test_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("train")),
    )


def stratified_hash_sample(
    df: DataFrame,
    key: str,
    group_col: str,
    rates_pct: dict[str, int],
    default_pct: int = 0,
) -> DataFrame:
    """Per-group hash sampling: keep rows whose bucket (out of 100)
    falls below their group's rate — the data-mixture rebalancing
    primitive (downsample the dominant web crawl, keep all of the
    rare high-quality source). Groups absent from ``rates_pct`` get
    ``default_pct``.

    Same determinism contract as ``hash_sample``: the rate lookup is a
    literal CASE chain and the bucket is md5 of the key, so the
    surviving row set is a pure function of (key, group) — stable
    across runs, engines, and repartitions, and still a pushdown-able
    single-pass filter (no shuffle, no per-group state)."""
    rate = F.lit(default_pct)
    for g, pct in rates_pct.items():
        rate = F.when(F.col(group_col) == g, F.lit(pct)).otherwise(rate)
    return df.where(hash_bucket(F.col(key)) < rate)


def mixture_plan(
    docs: DataFrame,
    weights: dict[str, float],
    source_col: str = "source",
    token_count_col: Column | None = None,
) -> DataFrame:
    """Token-budget data-mixture planning: given target mixture
    weights per source, compute the per-source DOWN-sampling rates
    that realize the mixture at the largest size no source has to be
    upsampled for.

    For normalized weights w_s and per-source token totals T_s the
    binding source is the one minimizing T_s / w_s; with
    ``scale = min_s(T_s / w_s)`` the planned corpus holds
    ``w_s × scale`` tokens of source s, i.e.
    ``sample_rate_s = w_s × scale / T_s`` (exactly 1.0 for the binding
    source, < 1 for everything else). Feed the rates into
    :func:`stratified_hash_sample` (deterministic hash buckets) to
    materialize the mix.

    Output: (source, n_docs, total_tokens, target_weight,
    sample_rate) — one row per WEIGHTED source (unweighted corpus
    sources are excluded from the mixture by definition). A weighted
    source with no rows in the corpus raises — same infeasibility
    class as the zero-token case, and the silent alternative
    (dropping it from weight normalization, so the realized mixture
    quietly differs from the requested one — e.g. on a misspelled
    source name) is exactly the failure a planner must surface.
    Weights need not be pre-normalized.

    Scale shape: one hash-agg over the corpus (map-side partials),
    then arithmetic on the #sources-row summary — the two global
    scalars (weight sum, min scale) are broadcast scalar crossJoins,
    the same pattern as the TPC-H scalar subqueries. The corpus is
    scanned once and never shuffled beyond the per-source agg."""
    from .textstats import token_count

    if not weights:
        raise ValueError("mixture_plan: weights must be non-empty")
    bad = {k: v for k, v in weights.items() if not v > 0}
    if bad:
        raise ValueError(
            f"mixture_plan: weights must be positive, got {bad!r} — a zero "
            "or negative weight makes the mixture undefined"
        )
    spark = docs.sparkSession
    if token_count_col is None:
        token_count_col = token_count(F.col("text"))
    wdf = spark.createDataFrame(
        [(k, float(v)) for k, v in weights.items()],
        f"{source_col} string, __w double",
    )
    # LEFT join FROM the weights: a weighted source absent from the
    # corpus surfaces as a null-n_docs row (caught in the scale
    # aggregate below) instead of silently vanishing from the
    # normalization via an inner join
    agg = (
        docs.select(F.col(source_col), token_count_col.alias("__nt"))
        .groupBy(source_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__nt").cast("long").alias("total_tokens"),
        )
    )
    totals = wdf.join(agg, source_col, "left")
    wsum = totals.agg(F.sum("__w").alias("__wsum"))
    normed = totals.crossJoin(F.broadcast(wsum)).withColumn(
        "__nw", F.col("__w") / F.col("__wsum")
    )
    # a weighted source with zero tokens — or absent from the corpus
    # entirely (null n_docs from the left join: misspelled name) —
    # makes the mixture infeasible (its target share can never be
    # realized); fail loudly inside the aggregate rather than let
    # scale=0 silently zero every rate
    scale = normed.agg(
        F.min(
            F.when(
                F.col("total_tokens") > 0,
                F.col("total_tokens") / F.col("__nw"),
            ).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit("mixture_plan: weighted source "),
                        F.col(source_col),
                        F.when(
                            F.col("n_docs").isNull(),
                            F.lit(
                                " is absent from the corpus"
                                " (misspelled?) - mixture infeasible"
                            ),
                        ).otherwise(
                            F.lit(" has zero tokens - mixture infeasible")
                        ),
                    )
                ).cast("double")
            )
        ).alias("__scale")
    )
    return (
        normed.crossJoin(F.broadcast(scale))
        .select(
            source_col,
            "n_docs",
            "total_tokens",
            F.round("__nw", 6).alias("target_weight"),
            F.round(
                F.least(
                    F.lit(1.0),
                    F.col("__nw") * F.col("__scale") / F.col("total_tokens"),
                ),
                6,
            ).alias("sample_rate"),
        )
    )


def per_group_sample(
    df: DataFrame,
    group_col: str,
    key: str,
    k: int,
    seed: str = "",
) -> DataFrame:
    """Deterministic k-per-group sample (the reservoir-sample shape,
    without reservoir state): rank rows within each group by the md5
    of their key (+ optional seed salt) and keep the first ``k`` —
    uniform-ish, engine-portable, and stable across runs/partitionings
    like every other sampler here (no RNG state to checkpoint). The
    classic uses: per-source eval slices, human-QA draws, per-domain
    capping of a crawl.

    One window sort PARTITIONED BY the group — never a global order;
    the output carries ``sample_rank`` (1..k within group).
    """
    from pyspark.sql import Window

    if k <= 0:
        raise ValueError(f"per_group_sample: k must be positive, got {k}")
    h = F.md5(F.concat(F.col(key).cast("string"), F.lit(seed)))
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(key).asc())
    return (
        df.withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .where(F.col("sample_rank") <= k)
    )


def weighted_sample(
    df: DataFrame,
    weight_col,
    k: int,
    key: str = "doc_id",
    group_col: str | None = None,
    seed: str = "",
) -> DataFrame:
    """Weighted random sampling without replacement (Efraimidis &
    Spirakis A-ES), derandomized the house way: the uniform draw is
    the md5 of the row key (+ seed salt) instead of RNG state, so the
    sample is stable across runs, partitionings, and engines — the
    property every sampler in this module keeps so training subsets
    are reproducible from the key alone.

    A-ES: draw u ~ U(0,1], give each row priority u^(1/w), keep the
    top-k — inclusion probability proportional to weight, provably
    (the Gumbel-trick/exponential-race argument). We rank by the
    monotone-equivalent ln(u)/w, ROUNDED to 6 so the cross-engine
    ``ln`` ulp gap can't flip an order the oracle disagrees with;
    ties break by key.

    Scale shape: grouped (``group_col``) → one window partitioned by
    the group, never global. Global (``group_col=None``) → orderBy +
    limit, which Spark executes as TakeOrderedAndProject: per-
    partition top-k heaps merged on one k-sized reducer — no global
    sort, no single-partition window. Weights must be positive; rows
    with NULL or non-positive weight are excluded (they would get
    ±inf priorities).
    """
    w = (
        F.col(weight_col).cast("double")
        if isinstance(weight_col, str)
        else weight_col.cast("double")
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col(key).cast("string"), F.lit(seed))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        + 1
    ) / F.lit(4294967296.0)
    pr = F.round(F.log(u) / w, 6)
    t = (
        df.where(w.isNotNull() & (w > 0))
        .withColumn("weight", w)
        .withColumn("priority", pr)
    )
    if group_col is None:
        return (
            t.orderBy(F.col("priority").desc(), F.col(key).asc())
            .limit(k)
            .withColumn("sample_rank", F.lit(None).cast("long"))
        )
    from pyspark.sql import Window

    win = Window.partitionBy(group_col).orderBy(
        F.col("priority").desc(), F.col(key).asc()
    )
    return t.withColumn(
        "sample_rank", F.row_number().over(win).cast("long")
    ).where(F.col("sample_rank") <= k)


def temperature_weights(
    docs: DataFrame,
    temperature: float,
    source_col: str = "source",
    token_count_col: Column | None = None,
) -> DataFrame:
    """Temperature-scaled mixture weights — the multilingual/
    multi-source rebalancing rule (the τ-sampling of mBERT/XLM-R and
    the data-mixture literature): with per-source token shares p_s,
    the target weight is p_s^(1/τ) renormalized. τ=1 keeps the
    natural mix; τ→∞ approaches uniform; τ<1 sharpens toward the
    head. Feed the output weights into :func:`mixture_plan` to turn
    them into concrete down-sampling rates.

    Output: (source, total_tokens, natural_share, target_weight),
    shares and weights rounded to 6 — ``pow`` on IEEE doubles is
    bit-identical across engines for identical inputs, and the
    rounded division keeps the hash stable.

    Scale shape: one hash-agg over the corpus, then arithmetic on the
    #sources-row summary with two broadcast scalar crossJoins (token
    total, weight normalizer) — the corpus is scanned once.

    ``temperature`` must be > 0; τ=0 (argmax-only mixture) is
    degenerate and rejected.
    """
    from .textstats import token_count

    if not temperature > 0:
        raise ValueError(
            f"temperature_weights: temperature must be > 0, got {temperature!r}"
        )
    if token_count_col is None:
        token_count_col = token_count(F.col("text"))
    per_source = docs.groupBy(F.col(source_col).alias("source")).agg(
        F.sum(token_count_col).cast("long").alias("total_tokens")
    )
    total = per_source.agg(
        F.sum("total_tokens").cast("long").alias("__total")
    )
    shared = per_source.crossJoin(F.broadcast(total)).withColumn(
        "__p", F.col("total_tokens") / F.col("__total")
    )
    powed = shared.withColumn(
        "__w", F.pow(F.col("__p"), F.lit(1.0 / temperature))
    )
    norm = powed.agg(F.sum("__w").alias("__z"))
    return (
        powed.crossJoin(F.broadcast(norm))
        .select(
            "source",
            "total_tokens",
            F.round(F.col("__p"), 6).alias("natural_share"),
            F.round(F.col("__w") / F.col("__z"), 6).alias("target_weight"),
        )
    )


def training_order(
    df: DataFrame,
    shard_col: str = "source",
    key_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Deterministic per-shard training-order shuffle: assign every
    row a pseudo-random ``position`` within its shard by ranking on
    ``md5(seed:key)`` — the data-loader handoff that decorrelates a
    corpus laid down in crawl/source order without any RNG state
    (same md5-ordering idiom as :func:`hash_bucket` and the k-means
    trainer sample: a pure function of (seed, key), so re-runs,
    engines, and repartitions all agree).

    Output: (shard, key, position 1..shard_size). The rank window is
    PARTITIONED BY the shard — per-shard sort, never a global total
    order; at 100 TB shards (source/file/date buckets) bound each
    sort partition exactly like ``packing.pack_sequences``'s shards
    do, and a global shuffle is the documented degenerate
    single-shard call. Readers interleave shards round-robin by
    position, which is the standard two-level shuffle
    (shard-interleave x in-shard order) used for training-data
    loaders at scale.
    """
    from pyspark.sql import Window

    sort_key = F.md5(
        F.concat(F.lit(f"{seed}:"), F.col(key_col).cast("string"))
    )
    w = Window.partitionBy(shard_col).orderBy(sort_key, F.col(key_col))
    return df.select(shard_col, key_col).withColumn(
        "position", F.row_number().over(w).cast("long")
    )
