"""Parquet bloom-filter layout: write-side enablement + a
row-group-level membership audit — the point-lookup sibling of the
min/max z-order family (`operators/zorder.py`).

Min/max footer stats prune RANGE predicates; for equality probes on a
high-cardinality, unsorted key (dedup ids, join keys, user ids) they
prune nothing — every file's [min, max] spans the probe. The parquet
answer is the per-column SPLIT-BLOCK BLOOM FILTER (SBBF,
parquet-format BloomFilter.md; Putze et al. 2007 "Cache-, Hash- and
Space-Efficient Bloom Filters"): the writer inserts
xxhash64(plain-encoded value, seed=0) per distinct value, a reader
skips any row group whose filter answers "definitely absent".

This module makes that physical contract auditable in-engine:

- :func:`bloom_write` — one file per bucket (the ``zorder_write``
  layout discipline) with ``parquet.bloom.filter.enabled#<col>`` on
  the key. ``expected_ndv`` deliberately OVER-PROVISIONS the filter
  (bits-per-value scales with claimed NDV): a filter sized for 50k
  values holding ~2k has a false-positive rate that is zero for all
  practical purposes, which is what lets the membership audit pin
  ``bloom_maybe == exact membership`` hash-exact against a SQL
  oracle (an at-capacity filter answers "maybe" ~1% wrongly — the
  audit would still be sound, but not SQL-replayable).
- :func:`bloom_probe_audit` — a DISTRIBUTED audit (mapInPandas over
  the file list, exactly like ``parquet_layout_audit``): each task
  reads only the footer + the bloom bitsets (KBs, never data pages),
  parses the thrift-compact FileMetaData for the column's
  ``bloom_filter_offset``/``length``, and answers every probe with
  the spec's block-check. At a 10⁵-file table this is a
  metadata-sized map, not a driver loop.

The xxhash64 and thrift-compact readers are pure-Python
implementations of the PUBLIC specs (xxHash spec v0.7.x; Thrift
compact protocol; parquet-format.thrift) — no external packages.
xxhash64 is cross-checked against Spark's JVM ``F.xxhash64`` (same
algorithm, seed 42, little-endian long encoding) in
tests/test_bloom.py, so the Python and JVM sides can never drift
silently.

Reference scope: extension beyond the reference pipeline (plain
parquet writes, `airflow/dags/scripts/init-data-transformation.py:43`)
— the physical-layout story a 100-TB warehouse needs for point
lookups.
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# -- xxHash64 (pure Python, spec-exact) --------------------------------

_P1 = 11400714785074694791
_P2 = 14029467366897019727
_P3 = 1609587929392839161
_P4 = 9650029242287828579
_P5 = 2870177450012600261
_M64 = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def xxhash64(data: bytes, seed: int = 0) -> int:
    """XXH64 of ``data`` — the hash parquet bloom filters key on
    (seed 0 over the value's plain encoding)."""
    n = len(data)
    pos = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        while pos + 32 <= n:
            k1, k2, k3, k4 = struct.unpack_from("<QQQQ", data, pos)
            v1 = (_rotl((v1 + k1 * _P2) & _M64, 31) * _P1) & _M64
            v2 = (_rotl((v2 + k2 * _P2) & _M64, 31) * _P1) & _M64
            v3 = (_rotl((v3 + k3 * _P2) & _M64, 31) * _P1) & _M64
            v4 = (_rotl((v4 + k4 * _P2) & _M64, 31) * _P1) & _M64
            pos += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h = ((h ^ ((_rotl((v * _P2) & _M64, 31) * _P1) & _M64)) * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while pos + 8 <= n:
        (k,) = struct.unpack_from("<Q", data, pos)
        h = (_rotl(h ^ ((_rotl((k * _P2) & _M64, 31) * _P1) & _M64), 27) * _P1 + _P4) & _M64
        pos += 8
    if pos + 4 <= n:
        (k,) = struct.unpack_from("<I", data, pos)
        h = (_rotl(h ^ ((k * _P1) & _M64), 23) * _P2 + _P3) & _M64
        pos += 4
    while pos < n:
        h = (_rotl(h ^ ((data[pos] * _P5) & _M64), 11) * _P1) & _M64
        pos += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


# -- split-block bloom filter check (parquet-format spec) ---------------

_SALT = (
    0x47B6137B, 0x44974D91, 0x8824AD5B, 0xA2B7289D,
    0x705495C7, 0x2DF1424B, 0x9EFC4947, 0x5C6BFB31,
)
_M32 = (1 << 32) - 1


def sbbf_contains(bitset: bytes, h: int) -> bool:
    """Spec block-check: block = top-32-bits of the hash scaled into
    the block count; within the 256-bit block, bit i of word i is
    (x * salt[i]) >> 27 for x = the low 32 hash bits."""
    n_blocks = len(bitset) // 32
    block = ((h >> 32) * n_blocks) >> 32
    x = h & _M32
    words = struct.unpack_from("<8I", bitset, block * 32)
    for i in range(8):
        bit = ((x * _SALT[i]) & _M32) >> 27
        if not (words[i] >> bit) & 1:
            return False
    return True


# -- minimal thrift compact-protocol reader -----------------------------
# Just enough of the PUBLIC Thrift compact spec to walk parquet's
# FileMetaData / BloomFilterHeader: varints, zigzag ints, binary,
# lists, nested structs; every other type is skipped structurally.

_CT_STOP, _CT_TRUE, _CT_FALSE = 0, 1, 2
_CT_BYTE, _CT_I16, _CT_I32, _CT_I64, _CT_DOUBLE = 3, 4, 5, 6, 7
_CT_BINARY, _CT_LIST, _CT_SET, _CT_MAP, _CT_STRUCT = 8, 9, 10, 11, 12


def _varint(buf: bytes, pos: int) -> tuple[int, int]:
    out = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7


def _zigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _read_value(buf: bytes, pos: int, ctype: int):
    if ctype in (_CT_TRUE, _CT_FALSE):
        # only reachable as a LIST element type; one byte per element
        return buf[pos] == 1, pos + 1
    if ctype == _CT_BYTE:
        return buf[pos], pos + 1
    if ctype in (_CT_I16, _CT_I32, _CT_I64):
        n, pos = _varint(buf, pos)
        return _zigzag(n), pos
    if ctype == _CT_DOUBLE:
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if ctype == _CT_BINARY:
        n, pos = _varint(buf, pos)
        return buf[pos : pos + n], pos + n
    if ctype in (_CT_LIST, _CT_SET):
        head = buf[pos]
        pos += 1
        size = (head >> 4) & 0x0F
        etype = head & 0x0F
        if size == 15:
            size, pos = _varint(buf, pos)
        out = []
        for _ in range(size):
            v, pos = _read_value(buf, pos, etype)
            out.append(v)
        return out, pos
    if ctype == _CT_MAP:
        size, pos = _varint(buf, pos)
        if size == 0:
            return {}, pos
        kv = buf[pos]
        pos += 1
        ktype, vtype = (kv >> 4) & 0x0F, kv & 0x0F
        out = {}
        for _ in range(size):
            k, pos = _read_value(buf, pos, ktype)
            v, pos = _read_value(buf, pos, vtype)
            out[k] = v
        return out, pos
    if ctype == _CT_STRUCT:
        return _read_struct(buf, pos)
    raise ValueError(f"unknown thrift compact type {ctype}")


def _read_struct(buf: bytes, pos: int) -> tuple[dict, int]:
    """Parse one struct into {field_id: value}. Bool fields carry the
    value in the type nibble; everything else parses by type."""
    out: dict[int, object] = {}
    last_id = 0
    while True:
        head = buf[pos]
        pos += 1
        if head == _CT_STOP:
            return out, pos
        delta = (head >> 4) & 0x0F
        ctype = head & 0x0F
        if delta == 0:
            n, pos = _varint(buf, pos)
            fid = _zigzag(n)
        else:
            fid = last_id + delta
        last_id = fid
        if ctype == _CT_TRUE:
            out[fid] = True
        elif ctype == _CT_FALSE:
            out[fid] = False
        else:
            out[fid], pos = _read_value(buf, pos, ctype)
    # unreachable


# parquet-format.thrift field ids used below
_FMD_ROW_GROUPS = 4
_RG_COLUMNS, _RG_NUM_ROWS = 1, 3
_CC_META_DATA = 3
_CMD_PATH_IN_SCHEMA = 3
_CMD_BLOOM_OFFSET, _CMD_BLOOM_LENGTH = 14, 15
_BFH_NUM_BYTES = 1


def _file_bloom_bitsets(path: str, key_col: str) -> list[tuple[int, int, bytes | None]]:
    """Per row group: (row_group index, num_rows, bloom bitset bytes
    for ``key_col`` or None when the column carries no filter). Reads
    footer + bitsets only (seeks, never data pages)."""
    with open(path, "rb") as f:
        f.seek(-8, 2)
        tail = f.read(8)
        if tail[4:] != b"PAR1":
            raise ValueError(f"{path}: not a parquet file")
        md_len = struct.unpack("<I", tail[:4])[0]
        f.seek(-8 - md_len, 2)
        fmd, _ = _read_struct(f.read(md_len), 0)
        out = []
        for g, rg in enumerate(fmd.get(_FMD_ROW_GROUPS, [])):
            bitset = None
            for cc in rg.get(_RG_COLUMNS, []):
                cmd = cc.get(_CC_META_DATA)
                if cmd is None:
                    continue
                parts = [p.decode() for p in cmd.get(_CMD_PATH_IN_SCHEMA, [])]
                if ".".join(parts) != key_col:
                    continue
                off = cmd.get(_CMD_BLOOM_OFFSET)
                if off is None:
                    continue
                length = cmd.get(_CMD_BLOOM_LENGTH)
                f.seek(off)
                if length is not None:
                    blob = f.read(length)
                    header, hpos = _read_struct(blob, 0)
                    bitset = blob[hpos : hpos + header[_BFH_NUM_BYTES]]
                else:  # pre-1.13 writers: header first, then sized bitset
                    blob = f.read(64)
                    header, hpos = _read_struct(blob, 0)
                    num = header[_BFH_NUM_BYTES]
                    f.seek(off + hpos)
                    bitset = f.read(num)
            out.append((g, rg.get(_RG_NUM_ROWS, 0), bitset))
        return out


# -- engine operators ---------------------------------------------------


def bloom_write(
    df: DataFrame,
    path: str,
    key_col: str,
    bucket_col: str = "bucket",
    expected_ndv: int = 50_000,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` one-file-per-bucket with an (over-provisioned,
    see module docstring) bloom filter on ``key_col`` — the
    point-lookup layout: a probe for one key touches one bucket's
    file and its filter answers before any data page is read. Same
    shuffle shape as ``zorder_write``: one repartition on the bucket
    id, parallel writes, no global sort."""
    (
        df.repartition(F.col(bucket_col))
        .write.mode(mode)
        .option(f"parquet.bloom.filter.enabled#{key_col}", "true")
        .option(f"parquet.bloom.filter.expected.ndv#{key_col}", str(expected_ndv))
        .partitionBy(bucket_col)
        .parquet(path)
    )


def bloom_probe_audit(
    spark,
    files: list[str],
    key_col: str,
    probes: list[int],
) -> DataFrame:
    """For every (file, row group, probe): would the key column's
    bloom filter let a reader SKIP this row group for ``probe``?
    ``bloom_maybe=false`` is a guaranteed skip (bloom filters have no
    false negatives); ``true`` means "must read". Probes are int64
    keys, hashed exactly as parquet readers do (xxhash64 seed 0 over
    the 8-byte little-endian plain encoding).

    Distributed like ``parquet_layout_audit``: the file list
    parallelizes, each task seeks footer + bitset only. Files whose
    key column carries no bloom filter report ``bloom_maybe=true``
    for every probe (a reader must read them) with
    ``has_bloom=false`` so the audit also catches layout regressions
    where the write option silently dropped."""
    import pandas as pd

    probe_list = [int(p) for p in probes]
    fdf = spark.createDataFrame(
        [(f,) for f in sorted(files)], "file string"
    ).repartition(max(1, min(len(files), 64)))
    schema = (
        "file string, row_group int, n_rows long, probe long, "
        "has_bloom boolean, bloom_maybe boolean"
    )

    def audit(batches):
        hashes = [
            (p, xxhash64(struct.pack("<q", p))) for p in probe_list
        ]
        for pdf in batches:
            rows = []
            for fpath in pdf["file"]:
                for g, n_rows, bitset in _file_bloom_bitsets(fpath, key_col):
                    for p, h in hashes:
                        maybe = (
                            True if bitset is None
                            else sbbf_contains(bitset, h)
                        )
                        rows.append(
                            (fpath, g, n_rows, p, bitset is not None, maybe)
                        )
            yield pd.DataFrame(
                rows,
                columns=[
                    "file", "row_group", "n_rows", "probe",
                    "has_bloom", "bloom_maybe",
                ],
            )

    return fdf.mapInPandas(audit, schema)
