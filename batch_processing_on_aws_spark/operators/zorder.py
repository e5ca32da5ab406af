"""Z-order (Morton) clustering + file-skipping statistics (extension
surface; data-layout optimization).

The layout problem at 100 TB: a table queried by BOTH ``x`` and ``y``
ranges can be sorted by only one of them — files sorted by ``x`` have
useless min/max bounds on ``y``, so a ``y``-range query scans every
file. Z-ordering (Delta ``OPTIMIZE ZORDER BY``, the classic Morton
curve) interleaves the BITS of the two keys so that sorting by the
single z-value keeps rows close in BOTH dimensions — every file then
covers a small bounding box in (x, y), and ordinary parquet min/max
pruning skips it for any box query that misses the box.

Everything here is plain JVM bit arithmetic (shift/and/or — inside
WholeStageCodegen, no UDF), so a DuckDB oracle replays the identical
expression: the z-value, the cell assignment, the per-cell bounding
boxes, and the prune decision are all bit-exact cross-engine.

``z_value``   — interleave two non-negative ints into the Morton code.
``cell_stats`` — group by the top z-bits (= the files a z-sorted
  writer would cut): per-cell row count, (x, y) bounding box, and
  whether a given box query could SKIP the cell on min/max alone.
  The demonstrable claim: z-cells give bounded boxes in both dims,
  so a selective box query skips most cells — the quantified version
  of "Z-ORDER makes both filters prune".

At scale the writer-side move is ``df.repartitionByRange(n,
z).sortWithinPartitions(z)`` + write: range partitioning on the
z-value IS the clustering; these stats are the audit that the layout
does what it claims (the same numbers a Delta OPTIMIZE report shows).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def z_value(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton code of two non-negative integer columns: bit i of x
    lands at position 2i, bit i of y at 2i+1. ``bits`` is the width
    of EACH input (values must fit, i.e. < 2**bits); the result uses
    2·bits bits of a long."""
    parts = []
    for i in range(bits):
        parts.append(
            F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        )
        parts.append(
            F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return reduce(lambda a, b: a.bitwiseOR(b), parts)


def z_value_sql(x: str, y: str, bits: int = 16) -> str:
    """The identical Morton expression as ANSI SQL text (oracle twin
    of :func:`z_value`; also handy for engines without the helper)."""
    parts = []
    for i in range(bits):
        parts.append(f"((({x} >> {i}) & 1) << {2 * i})")
        parts.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(parts)


def zorder_write(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    bits: int = 8,
    cell_shift: int = 10,
    mode: str = "overwrite",
) -> None:
    """Physically write ``df`` in a z-clustered layout: assign each
    row to cell ``z >> cell_shift`` and write one parquet file per
    cell (``partitionBy`` on the cell id; the shuffle hashes each
    cell to exactly one task, so each cell directory holds one file,
    internally sorted by the full z-value for row-group pruning
    inside big cells). Every file then covers a bounded (x, y) box
    and ordinary parquet min/max footer stats prune it for any box
    query that misses the box — the write path of the
    :func:`cell_stats` audit, i.e. what Delta's ``OPTIMIZE ZORDER
    BY`` produces. Deterministic: the cell cut is pure bit
    arithmetic, not range-sampling, so the layout (and its footer
    stats) is bit-stable across runs — which is what lets an oracle
    replay the physical layout analytically. Rows with NULL keys are
    excluded (a real writer gives them a dedicated file; callers that
    must keep them route them separately).

    At 100 TB: one shuffle on the cell id (same cost class as any
    repartition), parallel writes, no global sort — z-ordering is
    spiritually a sort but the Morton trick makes it a hash-shaped
    plan."""
    zc = z_value(F.col(x_col).cast("long"), F.col(y_col).cast("long"), bits)
    out = (
        df.where(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
        .withColumn("__z", zc)
        .withColumn("z_cell", F.shiftright(F.col("__z"), cell_shift))
    )
    (
        out.repartition(F.col("z_cell"))
        .sortWithinPartitions("z_cell", "__z")
        .drop("__z")
        .write.mode(mode)
        .partitionBy("z_cell")
        .parquet(path)
    )


def parquet_layout_audit(
    spark,
    files: list[str],
    x_col: str,
    y_col: str,
    box: tuple[int, int, int, int],
) -> DataFrame:
    """Row-group-level audit of a PHYSICAL parquet layout: for every
    row group of every file, the footer min/max statistics of the two
    clustering keys and whether the box query ``(x_lo, x_hi, y_lo,
    y_hi)`` (half-open) could SKIP it on those stats alone — the
    exact test a parquet reader applies before touching data pages.
    This is the ground-truth counterpart of :func:`cell_stats`: cells
    are the PLAN, footers are what actually got written.

    Distributed: the file list is parallelized and each task reads
    only FOOTERS via pyarrow (KBs per file, never data pages) — at a
    100 TB table with 10⁵–10⁶ files the audit is a metadata-sized
    map, not a driver loop."""
    import pandas as pd

    x_lo, x_hi, y_lo, y_hi = box
    fdf = spark.createDataFrame(
        [(f,) for f in sorted(files)], "file string"
    ).repartition(max(1, min(len(files), 64)))
    schema = (
        "file string, row_group int, n_rows long, "
        "min_x long, max_x long, min_y long, max_y long, can_skip boolean"
    )

    def audit(batches):
        import pyarrow.parquet as pq

        for pdf in batches:
            rows = []
            for f in pdf["file"]:
                md = pq.ParquetFile(f).metadata
                idx = {
                    md.schema.column(i).name: i
                    for i in range(md.num_columns)
                }
                xi, yi = idx[x_col], idx[y_col]
                for g in range(md.num_row_groups):
                    rg = md.row_group(g)
                    sx = rg.column(xi).statistics
                    sy = rg.column(yi).statistics
                    skip = (
                        sx.max < x_lo
                        or sx.min >= x_hi
                        or sy.max < y_lo
                        or sy.min >= y_hi
                    )
                    rows.append(
                        (f, g, rg.num_rows, sx.min, sx.max,
                         sy.min, sy.max, skip)
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "file", "row_group", "n_rows",
                    "min_x", "max_x", "min_y", "max_y", "can_skip",
                ],
            )

    return fdf.mapInPandas(audit, schema)


def cell_stats(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 8,
    cell_shift: int = 10,
    box: tuple[int, int, int, int] | None = None,
) -> DataFrame:
    """Per-z-cell layout statistics. Rows are assigned to cell
    ``z >> cell_shift`` (each cell = one file a z-sorted range writer
    would produce, 2**cell_shift consecutive z codes); output is one
    row per non-empty cell with its row count and (x, y) bounding
    box. With ``box = (x_lo, x_hi, y_lo, y_hi)`` (half-open), adds
    ``can_skip``: TRUE iff the cell's min/max bounds alone prove no
    row matches — exactly the parquet footer test a scan applies.
    NULL keys are excluded (they sort to a dedicated file in a real
    writer)."""
    zc = z_value(
        F.col(x_col).cast("long"), F.col(y_col).cast("long"), bits
    )
    t = (
        df.where(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
        .select(
            F.col(x_col).cast("long").alias("__x"),
            F.col(y_col).cast("long").alias("__y"),
            F.shiftright(zc, cell_shift).alias("z_cell"),
        )
    )
    out = t.groupBy("z_cell").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("__x").alias("min_x"),
        F.max("__x").alias("max_x"),
        F.min("__y").alias("min_y"),
        F.max("__y").alias("max_y"),
    )
    if box is not None:
        x_lo, x_hi, y_lo, y_hi = box
        out = out.withColumn(
            "can_skip",
            (F.col("max_x") < x_lo)
            | (F.col("min_x") >= x_hi)
            | (F.col("max_y") < y_lo)
            | (F.col("min_y") >= y_hi),
        )
    return out
