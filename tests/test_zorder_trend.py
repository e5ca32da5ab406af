"""Z-order layout (operators/zorder.py) and per-group OLS trend
(operators/trend.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from batch_processing_on_aws_spark.operators.trend import group_trend
from batch_processing_on_aws_spark.operators.zorder import (
    cell_stats,
    z_value,
    z_value_sql,
)


def _morton_ref(x: int, y: int, bits: int) -> int:
    out = 0
    for i in range(bits):
        out |= ((x >> i) & 1) << (2 * i)
        out |= ((y >> i) & 1) << (2 * i + 1)
    return out


def test_z_value_matches_reference_and_sql(spark):
    rng = np.random.default_rng(7)
    pts = [(int(a), int(b)) for a, b in rng.integers(0, 256, (200, 2))]
    df = spark.createDataFrame(pts, "x long, y long")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select(
            "x", "y", z_value(F.col("x"), F.col("y"), 8).alias("z")
        ).collect()
    }
    for (a, b), z in got.items():
        assert z == _morton_ref(a, b, 8)
    # the SQL twin is the same expression
    sql = {
        (r["x"], r["y"]): r["z"]
        for r in spark.createDataFrame(pts, "x long, y long")
        .selectExpr("x", "y", f"({z_value_sql('x', 'y', 8)}) AS z")
        .collect()
    }
    assert sql == got


def test_zorder_bounds_both_dims(spark):
    """The layout claim itself: cutting a z-sorted 32x32 grid into 16
    equal cells gives every cell a bounding box of 8x8 (both dims
    bounded), while the row-major sort gives full-width 32-wide boxes
    — so a box query prunes z-cells but not row-major files."""
    pts = [(x, y) for x in range(32) for y in range(32)]
    df = spark.createDataFrame(pts, "x long, y long")
    # 1024 z codes / 16 cells -> shift 6
    cells = cell_stats(df, "x", "y", bits=5, cell_shift=6).collect()
    assert len(cells) == 16
    for r in cells:
        assert r["n_rows"] == 64
        assert r["max_x"] - r["min_x"] == 7
        assert r["max_y"] - r["min_y"] == 7
    # row-major "files" of the same size: y-bounds stay full-width
    rm = (
        df.withColumn("file", (F.col("x") * 32 + F.col("y")) / 64)
        .withColumn("file", F.floor("file"))
        .groupBy("file")
        .agg(F.min("y").alias("min_y"), F.max("y").alias("max_y"))
        .collect()
    )
    assert all(r["max_y"] - r["min_y"] == 31 for r in rm)


def test_cell_stats_can_skip_is_exact(spark):
    """can_skip must be conservative-exact: TRUE iff no row of the
    cell falls inside the box (brute-force check)."""
    rng = np.random.default_rng(11)
    pts = [(int(a), int(b)) for a, b in rng.integers(0, 64, (500, 2))]
    df = spark.createDataFrame(pts, "x long, y long")
    box = (10, 30, 20, 40)
    rows = cell_stats(
        df, "x", "y", bits=6, cell_shift=6, box=box
    ).collect()
    from collections import defaultdict

    by_cell = defaultdict(list)
    for a, b in pts:
        by_cell[_morton_ref(a, b, 6) >> 6].append((a, b))
    for r in rows:
        hit = any(
            10 <= a < 30 and 20 <= b < 40 for a, b in by_cell[r["z_cell"]]
        )
        # min/max boxes on z-cells are tight enough here that the
        # footer test is exact, not merely conservative
        if r["can_skip"]:
            assert not hit
    # and the pruning is real: a selective box skips most cells
    assert sum(1 for r in rows if r["can_skip"]) >= len(rows) // 2


def test_group_trend_exact_line_and_degenerates(spark):
    rows = (
        [("lin", x, 3 * x + 2) for x in range(10)]
        + [("flat", x, 7) for x in range(5)]
        + [("one", 4, 9)]
    )
    df = spark.createDataFrame(rows, "g string, x long, y long")
    out = {r["g"]: r for r in group_trend(df, ["g"], "x", "y").collect()}
    assert out["lin"]["slope"] == 3.0
    assert out["lin"]["intercept"] == 2.0
    assert out["lin"]["r2"] == 1.0
    assert out["flat"]["slope"] == 0.0
    assert out["flat"]["r2"] is None          # zero y-variance
    assert out["one"]["slope"] is None        # zero x-variance
    assert out["one"]["n_points"] == 1


def test_group_trend_matches_numpy(spark):
    rng = np.random.default_rng(3)
    xs = rng.integers(0, 100, 200)
    ys = rng.integers(0, 1000, 200)
    df = spark.createDataFrame(
        [("g", int(a), int(b)) for a, b in zip(xs, ys)],
        "g string, x long, y long",
    )
    r = group_trend(df, ["g"], "x", "y").collect()[0]
    slope, intercept = np.polyfit(xs.astype(float), ys.astype(float), 1)
    assert r["slope"] == pytest.approx(slope, abs=1e-5)
    assert r["intercept"] == pytest.approx(intercept, abs=1e-4)
    corr = np.corrcoef(xs.astype(float), ys.astype(float))[0, 1]
    assert r["r2"] == pytest.approx(corr**2, abs=1e-5)


def test_group_trend_null_rows_excluded(spark):
    df = spark.createDataFrame(
        [("g", 0, 2), ("g", 1, 5), ("g", 2, 8), ("g", None, 99),
         ("g", 3, None)],
        "g string, x long, y long",
    )
    r = group_trend(df, ["g"], "x", "y").collect()[0]
    assert r["n_points"] == 3
    assert r["slope"] == 3.0


def test_zorder_write_real_file_skipping_beats_x_sort(spark, tmp_path):
    """The physical claim behind OPTIMIZE ZORDER: on a 64x64 grid, a
    y-band box query can skip most FILES of the z-clustered layout on
    parquet footer stats alone (every file covers an 8x8 block), while
    an x-sorted layout skips none (every x-stripe spans all of y).
    Footer statistics are read back with pyarrow — the audit measures
    what was WRITTEN, not the analytic cells."""
    import glob

    from pyspark.sql import functions as F

    from batch_processing_on_aws_spark.operators.zorder import (
        parquet_layout_audit,
        zorder_write,
    )

    grid = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    )
    zpath, xpath = str(tmp_path / "z"), str(tmp_path / "xsort")
    # bits=6 -> 12-bit z; cell_shift=6 -> 64 cells of 64 codes = 8x8 boxes
    zorder_write(grid, zpath, "x", "y", bits=6, cell_shift=6)
    (
        grid.repartitionByRange(64, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite").parquet(xpath)
    )
    box = (0, 64, 0, 8)  # all x, y in [0, 8)
    zfiles = glob.glob(f"{zpath}/**/*.parquet", recursive=True)
    xfiles = glob.glob(f"{xpath}/*.parquet")
    assert len(zfiles) == 64
    za = parquet_layout_audit(spark, zfiles, "x", "y", box)
    xa = parquet_layout_audit(spark, xfiles, "x", "y", box)
    # file-level skip: every row group of the file skippable
    z_skip = (
        za.groupBy("file").agg(F.min("can_skip").alias("s"))
        .where("s").count()
    )
    x_skip = (
        xa.groupBy("file").agg(F.min("can_skip").alias("s"))
        .where("s").count()
    )
    assert z_skip == 56  # all 8x8 blocks except the by=0 row of blocks
    assert x_skip == 0
    # layout is lossless: the written rows are exactly the grid
    back = spark.read.parquet(zpath).select("x", "y")
    assert back.count() == 64 * 64
    assert back.exceptAll(grid).count() == 0


def test_compact_zorder_by_clusters_within_bucket(spark, tmp_path):
    """compact(zorder_by=...) must stay content-identical AND leave
    each compacted bucket file physically sorted by the Morton code —
    the property that gives row-group pruning inside the file."""
    from pyspark.sql import functions as F

    from batch_processing_on_aws_spark.operators.versioned import (
        VersionedTable,
    )
    from batch_processing_on_aws_spark.operators.zorder import z_value

    vt = VersionedTable(str(tmp_path / "t"), keys=["id"], n_buckets=4)
    rows = [(i, i % 37, (i * 7) % 53) for i in range(400)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    vt.overwrite(df)
    vt.upsert(
        spark,
        spark.createDataFrame(rows[:100], "id long, x long, y long"),
    )
    before = {tuple(r) for r in vt.read(spark).select("id", "x", "y").collect()}
    v = vt.compact(spark, min_files=2, zorder_by=("x", "y"), z_bits=6)
    assert v is not None
    after = {tuple(r) for r in vt.read(spark, v).select("id", "x", "y").collect()}
    assert after == before
    # every compacted file is internally non-decreasing in z
    import os

    manifest = vt._manifest(v)["buckets"]
    parent_files = set()
    for fs in vt._manifest(v - 1)["buckets"].values():
        parent_files.update(fs)
    fresh = [
        os.path.join(vt.path, f)
        for fs in manifest.values()
        for f in fs
        if f not in parent_files
    ]
    assert fresh
    for f in fresh:
        zs = [
            r["z"]
            for r in spark.read.parquet(f)
            .select(
                z_value(
                    F.col("x").cast("long"), F.col("y").cast("long"), 6
                ).alias("z")
            )
            .collect()
        ]
        assert zs == sorted(zs), f
