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
