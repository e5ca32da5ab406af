"""Slowly-changing-dimension (SCD Type 2) history builder —
extension surface; the warehouse-versioning primitive that turns a
keyed change stream into validity intervals.

``scd2_collapse(df, ...)`` takes observation rows
``(key, attrs..., ts)`` and emits one row per RUN of consecutive
equal attribute values per key: ``(key, attrs, valid_from, valid_to,
is_current)`` with half-open ``[valid_from, valid_to)`` intervals and
``valid_to IS NULL`` on the current row — the Kimball Type-2
dimension shape, built declaratively.

Plan shape: one shuffle on the key, then two window passes over the
SAME ``(key, ts)`` sort order (lag to find change points, lead for
interval ends — Spark reuses the sort between them), no self-join,
no explode. Scale: per-key history is processed sequentially, which
is inherent to run-length semantics; keys distribute freely, so the
operator is shuffle-bounded at any corpus size.

Determinism: duplicate observations at the same ``(key, ts)`` are
pre-collapsed to the row with the greatest ``tiebreak`` — without
this, which duplicate starts a run would depend on partition order.

NULL attribute values are compared null-safely (NULL == NULL is the
SAME value, so a run of NULLs is one interval, matching warehouse
practice).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_collapse(
    df: DataFrame,
    key_cols: Sequence[str],
    attr_cols: Sequence[str],
    ts_col: str,
    tiebreak: str,
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
    current_col: str = "is_current",
    tiebreak_out: str | None = None,
) -> DataFrame:
    """Collapse a keyed observation stream into SCD2 intervals.

    Output columns: ``key_cols + attr_cols + [valid_from, valid_to,
    is_current]``; one row per maximal run of consecutive equal
    ``attr_cols`` values in ``ts_col`` order, ``valid_to`` = the next
    run's ``valid_from`` (NULL for the open current run).

    ``tiebreak_out`` additionally emits the winning tiebreak of each
    run's STARTING observation — required when the dimension will be
    incrementally maintained (:func:`scd2_apply_changes` replays run
    starts as observations, and an equal-timestamp new observation
    must tie-break against the original winner, not against nothing).
    """
    keys = list(key_cols)
    attrs = list(attr_cols)

    # one observation per (key, ts): greatest tiebreak wins
    w_dedup = Window.partitionBy(*keys, ts_col).orderBy(F.col("__tb").desc())
    obs = (
        df.select(*keys, *attrs, ts_col, F.col(tiebreak).alias("__tb"))
        .withColumn("__rn", F.row_number().over(w_dedup))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )

    w = Window.partitionBy(*keys).orderBy(F.col(ts_col).asc())
    changed = F.lit(False)
    for a in attrs:
        prev = F.lag(a).over(w)
        changed = changed | ~F.col(a).eqNullSafe(prev)
    # the first row of a key has lag NULL for every attr; eqNullSafe
    # against a genuinely-NULL first value would wrongly read
    # "unchanged", so the row_number==1 case is forced to True.
    first = F.row_number().over(w) == 1
    starts = obs.withColumn("__chg", first | changed).where(F.col("__chg"))

    w2 = Window.partitionBy(*keys).orderBy(F.col(ts_col).asc())
    extra = (
        [F.col("__tb").alias(tiebreak_out)] if tiebreak_out is not None else []
    )
    return (
        starts.select(
            *keys,
            *attrs,
            F.col(ts_col).alias(valid_from_col),
            F.lead(ts_col).over(w2).alias(valid_to_col),
            *extra,
        )
        .withColumn(current_col, F.col(valid_to_col).isNull())
    )


def scd2_apply_changes(
    dim: DataFrame,
    new_obs: DataFrame,
    key_cols: Sequence[str],
    attr_cols: Sequence[str],
    ts_col: str,
    tiebreak: str,
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
    current_col: str = "is_current",
    tiebreak_out: str = "run_tiebreak",
    late: str = "error",
) -> DataFrame:
    """Incrementally maintain an SCD2 dimension: merge a batch of new
    observations into an existing :func:`scd2_collapse` output (built
    with ``tiebreak_out``), recomputing ONLY the touched keys —
    untouched keys' rows pass through byte-identical, so refresh cost
    is O(batch + touched-key history), never O(dimension). The same
    contract as ``IncrementalAgg``: sequential applies over in-order
    batches equal the full recompute exactly (pinned by test and by
    the registry oracle).

    Exactness requires per-key IN-ORDER batches: every new
    observation at or after its key's last interval start. A run
    start replayed as an observation stands in for the whole run,
    which is lossful for observations INSIDE a closed run — so a
    strictly-late arrival (``ts`` < the key's last ``valid_from``)
    cannot be merged exactly from the dimension alone.
    ``late='error'`` (default) fails the job loudly on one;
    ``late='replay'`` accepts it with documented approximate
    semantics (the late value splits the closed run at its timestamp,
    as if no later intra-run observation existed — correct whenever
    closed runs contain no unrecorded repeats). Same-timestamp
    arrivals tie-break against the stored run-start winner exactly.
    """
    if late not in ("error", "replay"):
        raise ValueError(f"late must be error|replay: {late!r}")
    keys = list(key_cols)
    attrs = list(attr_cols)
    obs_cols = [*keys, *attrs, ts_col, tiebreak]

    touched = new_obs.select(*keys).distinct()
    dim_rest = dim.join(touched, keys, "left_anti")
    dim_touched = dim.join(touched, keys, "left_semi")

    starts_as_obs = dim_touched.select(
        *keys,
        *attrs,
        F.col(valid_from_col).alias(ts_col),
        F.col(tiebreak_out).alias(tiebreak),
    )
    fresh = new_obs.select(*obs_cols)
    if late == "error":
        last_start = dim_touched.groupBy(*keys).agg(
            F.max(valid_from_col).alias("__last_vf")
        )
        fresh = (
            fresh.join(last_start, keys, "left")
            .withColumn(
                ts_col,
                F.when(
                    F.col("__last_vf").isNotNull()
                    & (F.col(ts_col) < F.col("__last_vf")),
                    F.raise_error(
                        F.concat(
                            F.lit(
                                "scd2_apply_changes: strictly-late "
                                "observation older than its key's last "
                                "interval start cannot be merged exactly "
                                "(pass late='replay' to accept "
                                "approximate splits): ts="
                            ),
                            F.col(ts_col).cast("string"),
                        )
                    ).cast(dim.schema[valid_from_col].dataType),
                ).otherwise(F.col(ts_col)),
            )
            .drop("__last_vf")
        )
    merged = starts_as_obs.unionByName(fresh)
    recomputed = scd2_collapse(
        merged,
        keys,
        attrs,
        ts_col,
        tiebreak,
        valid_from_col=valid_from_col,
        valid_to_col=valid_to_col,
        current_col=current_col,
        tiebreak_out=tiebreak_out,
    )
    return dim_rest.unionByName(recomputed)


def scd2_from_table_history(
    vt,
    spark,
    attr_cols: Sequence[str],
    deleted_col: str = "is_deleted",
) -> DataFrame:
    """Reconstruct the FULL Type-2 history of a Type-1
    :class:`~.versioned.VersionedTable` from its commit log — the
    lakehouse "history table from the change feed" pattern (Delta CDF
    → SCD2): version 1's snapshot seeds the observations, every later
    version contributes its CDC rows (insert/update → the new values,
    delete → a tombstone observation with NULL attributes and
    ``deleted_col`` true), and :func:`scd2_collapse` turns the keyed
    observation stream into validity intervals ON THE VERSION AXIS —
    ``valid_from_version`` / ``valid_to_version`` half-open, open
    current run, ``is_current``.

    The version number IS the time axis: it is monotonic by the
    commit protocol, integer-exact, and identical in any engine — a
    wall-clock axis would hang history reconstruction on
    caller-supplied commit timestamps. Cost: one
    :meth:`~.versioned.VersionedTable.changes` read per version pair,
    each O(touched buckets) by the manifest diff (never O(table)),
    unioned into one collapse — linear in history length, the
    standard change-feed-replay cost. Long histories should
    checkpoint the union every few dozen versions (same lineage note
    as the iterative graph ops).
    """
    from pyspark.sql import functions as F

    keys = list(vt.keys)
    attrs = list(attr_cols)
    versions = vt.versions()
    if not versions:
        raise ValueError("table has no committed versions")

    first = versions[0]
    obs = vt.read(spark, version=first).select(
        *keys,
        *attrs,
        F.lit(False).alias(deleted_col),
        F.lit(first).cast("long").alias("__v"),
    )
    for v_from, v_to in zip(versions, versions[1:]):
        ch = vt.changes(spark, v_from, v_to)
        # ONE projection per version pair (round-14): the old
        # upserts/deletes two-branch union filtered the SAME change
        # feed twice, so each pair's CDC diff (a full-outer join over
        # both versions' touched buckets) executed twice in the final
        # plan — exchange reuse dedups the join inputs but not the
        # join. Every change row lands in exactly one branch, so a
        # CASE on change_type produces the identical row set in a
        # single pass: delete → NULL attributes + tombstone flag,
        # insert/update → the new values.
        is_del = F.col("change_type") == "delete"
        obs = obs.unionByName(
            ch.select(
                *keys,
                *[
                    F.when(~is_del, F.col(f"new_{c}")).alias(c)
                    for c in attrs
                ],
                is_del.alias(deleted_col),
                F.lit(v_to).cast("long").alias("__v"),
            )
        )

    return scd2_collapse(
        obs,
        keys,
        [*attrs, deleted_col],
        "__v",
        tiebreak="__v",  # one observation per (key, version): no ties
        valid_from_col="valid_from_version",
        valid_to_col="valid_to_version",
        current_col="is_current",
    )
