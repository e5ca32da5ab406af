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
