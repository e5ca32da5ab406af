"""Scale-safe exact global ranking.

A ``Window.orderBy(...)`` with no partition spec is a total order: every
row funnels through ONE reducer (Spark logs ``WindowExec: No Partition
Defined`` for it). Fine at sf0.1, a confirmed scale-killer at 100 TB.

``global_row_numbers`` computes the SAME exact global row numbers with a
classic range-partitioned two-pass rank, the pattern TeraSort and every
distributed ORDER BY (Spark's own ``SortExec`` via ``RangePartitioning``)
use — but surfaced as row numbers, which plain ``df.orderBy`` does not
give you:

1. sample range boundaries for the ordering column (``approxQuantile`` —
   one bounded aggregate, same machinery as RangePartitioning's sampler);
2. assign each row a range bucket (pure projection, no shuffle);
3. count rows per bucket (tiny agg: ≤ ``num_buckets`` rows collected —
   bounded by config, never by data size) and prefix-sum the offsets;
4. ``row_number`` within each bucket (``Window.partitionBy(bucket)`` —
   parallel across buckets) + the bucket's offset = exact global rank.

Rows with equal range-column values always land in the same bucket, so
any within-bucket tie-break ordering stays globally consistent.

From the exact row number, the classic rank family follows in closed
form whenever the full ORDER BY is a strict total order (i.e. it ends in
a unique tie-breaker — every ranked query in this repo does):

- ``percent_rank = (rn - 1) / (N - 1)``   (0.0 when N == 1)
- ``cume_dist   = rn / N``
- ``ntile(k)``: the first ``N mod k`` tiles get ``ceil(N/k)`` rows, the
  rest ``floor(N/k)`` — a two-branch expression on ``rn``.

Reference parity: the reference's warehouse layer leans on Redshift for
ordered analytics (/root/reference/metabase/README.md dashboards over
``init_2_s3_to_redshifht_dag.py`` tables); this module is the engine-side
equivalent that still works when the table is 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_BUCKET = "__range_bucket"
_RN = "__global_rn"


def global_row_numbers(
    df: DataFrame,
    range_col: str,
    order_by: list[Column],
    *,
    ascending: bool = True,
    num_buckets: int = 64,
    relative_error: float = 0.001,
    rn_col: str = _RN,
) -> tuple[DataFrame, int]:
    """Exact 1-based global row numbers over ``order_by`` without a
    single-reducer window.

    ``range_col`` must be a numeric column that is the leading key of
    ``order_by`` (same direction as ``ascending``); ``order_by`` must be
    a strict total order (end it with a unique tie-breaker).

    Returns ``(df_with_rn, total_rows)``. Triggers two bounded driver
    actions (quantile sketch + per-bucket counts of ≤ num_buckets rows);
    both are aggregates, never data-sized collects.
    """
    probs = [i / num_buckets for i in range(1, num_buckets)]
    bounds = sorted(set(df.approxQuantile(range_col, probs, relative_error)))
    if not ascending:
        bounds = list(reversed(bounds))

    if bounds:
        arr = F.array(*[F.lit(float(b)) for b in bounds])
        v = F.col(range_col).cast("double")
        # bucket = #boundaries strictly before v in sort order: monotone
        # w.r.t. the ordering, and equal values share a bucket.
        pred = (lambda b: v > b) if ascending else (lambda b: v < b)
        bucket = F.size(F.filter(arr, pred))
    else:
        bucket = F.lit(0)
    bucketed = df.withColumn(_BUCKET, bucket)

    # Bounded driver collect: ≤ num_buckets rows by construction.
    counts = {
        r[_BUCKET]: r["count"] for r in bucketed.groupBy(_BUCKET).count().collect()
    }
    total = sum(counts.values())
    offsets, acc = [], 0
    for i in range(len(bounds) + 1):
        offsets.append(acc)
        acc += counts.get(i, 0)
    # element_at is 1-based; offsets_arr[bucket + 1] = rows before bucket.
    offsets_arr = F.array(*[F.lit(o) for o in offsets])

    w = Window.partitionBy(_BUCKET).orderBy(*order_by)
    out = bucketed.withColumn(
        rn_col,
        (
            F.row_number().over(w).cast("long")
            + F.element_at(offsets_arr, F.col(_BUCKET) + 1).cast("long")
        ),
    ).drop(_BUCKET)
    return out, total


def ntile_from_rn(rn: Column, n_total: int, k: int) -> Column:
    """SQL ``ntile(k)`` computed from an exact global row number: the
    first ``N mod k`` tiles have ``ceil(N/k)`` rows, the rest
    ``floor(N/k)`` — identical to the window function on a strict total
    order."""
    q, r = divmod(n_total, k)
    big = q + 1
    if q == 0:  # fewer rows than tiles: tile == rn
        return rn.cast("long")
    return (
        F.when(rn <= r * big, F.floor((rn - 1) / big) + 1)
        .otherwise(r + F.floor((rn - r * big - 1) / q) + 1)
        .cast("long")
    )


def percent_rank_from_rn(rn: Column, n_total: int) -> Column:
    """``percent_rank()`` under a strict total order: (rn-1)/(N-1)."""
    if n_total <= 1:
        return F.lit(0.0)
    return (rn - F.lit(1)).cast("double") / F.lit(float(n_total - 1))


def cume_dist_from_rn(rn: Column, n_total: int) -> Column:
    """``cume_dist()`` under a strict total order: rn/N."""
    return rn.cast("double") / F.lit(float(max(n_total, 1)))
