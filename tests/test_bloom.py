"""Parquet bloom-filter layout (operators/bloom.py): pure-Python
xxhash64 vs the spec vectors AND vs Spark's JVM implementation, the
thrift footer walk, no-false-negatives, and the files-skipped
measurement (the point-lookup twin of the z-order 56-of-64 test)."""

import glob
import os
import struct

from pyspark.sql import functions as F

from batch_processing_on_aws_spark.operators.bloom import (
    _file_bloom_bitsets,
    bloom_probe_audit,
    bloom_write,
    sbbf_contains,
    xxhash64,
)


def test_xxhash64_spec_vectors():
    # canonical XXH64 vectors (xxHash reference implementation)
    assert xxhash64(b"") == 0xEF46DB3751D8E999
    assert xxhash64(b"a") == 0xD24EC4F1A98C6E5B
    assert xxhash64(b"abc") == 0x44BC2CF5AD770999
    # >32-byte input exercises the stripe loop
    assert xxhash64(b"x" * 100) != xxhash64(b"x" * 101)


def test_xxhash64_matches_spark_jvm(spark):
    """Spark's F.xxhash64 over a LONG column is XXH64(8-byte
    little-endian value, seed 42) — pinning the pure-Python hash to
    the JVM one means the audit's probe hashing can never drift from
    what a JVM parquet reader computes."""
    vals = [0, 1, -1, 42, 10**12, -(10**15), 2**63 - 1]
    df = spark.createDataFrame([(v,) for v in vals], "k long")
    got = {
        r["k"]: r["h"]
        for r in df.select("k", F.xxhash64("k").alias("h")).collect()
    }
    for v in vals:
        ours = xxhash64(struct.pack("<q", v), seed=42)
        # Spark returns a signed long
        assert got[v] == ours - (1 << 64) * (ours >> 63)


def _write(spark, path, n=2048, buckets=8, ndv=50_000):
    df = spark.range(n).selectExpr(
        "id * 7 AS k", f"CAST(id % {buckets} AS long) AS bucket"
    )
    bloom_write(df, path, "k", expected_ndv=ndv)
    return df


def test_no_false_negatives_and_absent_skips(spark, tmp_path):
    path = str(tmp_path / "bloomed")
    _write(spark, path)
    files = glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    assert len(files) == 8  # one file per bucket
    present = [7 * i for i in (0, 13, 500, 2047)]
    absent = [7 * 2048 + i for i in range(1, 9)] + [1, 3, 5]  # non-multiples
    audit = bloom_probe_audit(spark, files, "k", present + absent)
    rows = audit.collect()
    assert all(r["has_bloom"] for r in rows)
    by_probe: dict[int, list] = {}
    for r in rows:
        by_probe.setdefault(r["probe"], []).append(r)
    for p in present:
        # the bucket holding p must answer maybe (no false negatives)
        assert any(r["bloom_maybe"] for r in by_probe[p])
    for p in absent:
        # over-provisioned filter: every file skips an absent key
        assert not any(r["bloom_maybe"] for r in by_probe[p])


def test_point_lookup_skips_all_but_one_file(spark, tmp_path):
    """The files-skipped measurement: keys are disjoint across the 8
    bucket files, so a probe for a present key must read exactly ONE
    file — 7 of 8 skipped on the bitset alone (min/max stats could
    not skip any: every file spans the key range)."""
    path = str(tmp_path / "bloomed")
    _write(spark, path)
    files = glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    probe = 7 * 1234
    audit = bloom_probe_audit(spark, files, "k", [probe]).collect()
    assert sum(r["bloom_maybe"] for r in audit) == 1
    assert sum(not r["bloom_maybe"] for r in audit) == len(files) - 1
    # and min/max would NOT have skipped: id*7 spans all files
    import pyarrow.parquet as pq

    for f in files:
        st = pq.ParquetFile(f).metadata.row_group(0).column(0).statistics
        assert st.min <= probe <= st.max


def test_missing_bloom_reports_must_read(spark, tmp_path):
    """A file written WITHOUT the bloom option must surface
    has_bloom=false and bloom_maybe=true (a reader has to read it) —
    the audit doubles as a layout-regression check."""
    path = str(tmp_path / "plain")
    spark.range(100).selectExpr("id AS k").coalesce(1).write.parquet(path)
    files = glob.glob(os.path.join(path, "*.parquet"))
    rows = bloom_probe_audit(spark, files, "k", [5, 10**9]).collect()
    assert rows and all(
        (not r["has_bloom"]) and r["bloom_maybe"] for r in rows
    )


def test_footer_walk_matches_pyarrow_metadata(spark, tmp_path):
    """The hand-rolled thrift walk must agree with pyarrow on the
    structural facts pyarrow CAN see (row-group count and sizes);
    the bloom offsets are the part pyarrow 16 cannot."""
    import pyarrow.parquet as pq

    path = str(tmp_path / "bloomed")
    _write(spark, path, n=512)
    f = glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)[0]
    ours = _file_bloom_bitsets(f, "k")
    md = pq.ParquetFile(f).metadata
    assert len(ours) == md.num_row_groups
    for (g, n_rows, bitset), i in zip(ours, range(md.num_row_groups)):
        assert n_rows == md.row_group(i).num_rows
        assert bitset is not None and len(bitset) % 32 == 0


def test_sbbf_block_math():
    """A 1-block filter with one inserted key: the 8 salted bits must
    verify and a different key must (overwhelmingly) miss."""
    h = xxhash64(struct.pack("<q", 99))
    words = [0] * 8
    x = h & 0xFFFFFFFF
    salts = (
        0x47B6137B, 0x44974D91, 0x8824AD5B, 0xA2B7289D,
        0x705495C7, 0x2DF1424B, 0x9EFC4947, 0x5C6BFB31,
    )
    for i in range(8):
        words[i] |= 1 << (((x * salts[i]) & 0xFFFFFFFF) >> 27)
    bitset = struct.pack("<8I", *words)
    assert sbbf_contains(bitset, h)
    assert not sbbf_contains(bitset, xxhash64(struct.pack("<q", 100)))
