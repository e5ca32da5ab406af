"""Scan operators (SURVEY.md §2.1, S1-S4, S7).

The reference's scans are one-liners with schema inference
(reference: init-data-transformation.py:23,48;
journey-data-transformation.py:28,57). Here every scan takes an
explicit schema by default — at 100 TB, inference means an extra full
pass over CSV and nondeterministic column types. Filters/projections
applied after these readers push down to the parquet scan via Catalyst
(verify with ``df.explain('formatted')`` → ``PushedFilters`` /
``ReadSchema``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import TABLE_NAMES, TESTDATA


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """S4 — parquet scan (reference: journey-data-transformation.py:57)."""
    return spark.read.parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    infer: bool = False,
    mode: str = "FAILFAST",
    corrupt_col: str | None = None,
) -> DataFrame:
    """S1/S2 — CSV scan with header (reference: journey-data-transformation.py:28).

    Globs work as in the reference (``raw/cycling-journey/*/*``), but at
    scale prefer a partitioned table + partition pruning (SURVEY.md §4).
    ``infer=True`` reproduces the reference's dev behavior; never in prod.

    Malformed-row policy is explicit (the reference, with inference on,
    silently nulls bad cells): default FAILFAST — a 100 TB ingest that
    silently drops rows is a correctness incident, not a convenience.
    ``mode='PERMISSIVE'`` with ``corrupt_col`` quarantines instead:
    bad rows land with the raw line preserved in ``corrupt_col`` so the
    pipeline can route them to a dead-letter table and continue —
    requires an explicit ``schema`` (the corrupt column is appended to
    it here).
    """
    reader = spark.read.option("header", True).option("mode", mode)
    if corrupt_col is not None:
        if schema is None:
            raise ValueError("corrupt_col requires an explicit schema")
        schema = T.StructType(
            [*schema.fields, T.StructField(corrupt_col, T.StringType(), True)]
        )
        reader = reader.option("columnNameOfCorruptRecord", corrupt_col)
    if schema is not None:
        reader = reader.schema(schema)
    elif infer:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    explode_field: str | None = None,
) -> DataFrame:
    """S3/S7 — JSON scan, optionally unnesting an array-of-struct field.

    The reference flattens the weather envelope's ``days`` array in
    driver-side Python before Spark ever sees it
    (reference: init_0_ingestion_to_s3_dag.py:41-55). In-engine this is
    ``explode`` + struct star-expansion, which runs distributed and
    keeps the raw file as the source of truth.
    """
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.json(path)
    if explode_field is not None:
        df = df.select(F.explode(F.col(explode_field)).alias("_d")).select("_d.*")
    return df


def read_orc(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
) -> DataFrame:
    """ORC scan — same columnar pushdown/pruning contract as parquet
    (both are Catalyst file sources with predicate pushdown and column
    pruning), for lakes standardized on ORC. Not used by the reference
    (its lake is CSV→parquet) but part of the engine's source matrix;
    round-trip + pushdown covered in tests/test_sources.py."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def read_text(
    spark: SparkSession,
    path: str,
    whole: bool = False,
) -> DataFrame:
    """Plain-text corpus scan: one row per line (``whole=False``) or
    per file (``whole=True``), single ``value: string`` column — the
    raw-ingest front door for line-delimited document dumps before any
    structure exists. Distributed file source (splittable per-line
    mode), so a 100-TB text dump parallelizes like any other scan."""
    # NB: must be the reader-method kwarg — the text source does not
    # pick up a same-named .option() for this flag.
    return spark.read.text(path, wholetext=whole)


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
) -> DataFrame:
    """Opaque-media ingestion via Spark's built-in ``binaryFile``
    source: (path, modificationTime, length, content) with the payload
    as a ``binary`` column — the scan that feeds
    ``operators/multimodal.py`` (decode/feature-extract over
    ``mapInPandas``). ``glob`` filters by filename pattern
    (``pathGlobFilter``), e.g. ``"*.ppm"``. Files are NOT splittable
    (each is one row), so parallelism = file count; at 100 TB that is
    millions of objects, which is exactly the right unit."""
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one synthetic testdata table with its declared schema.

    The schema is asserted (names + order), not re-inferred: parquet
    carries its own types, so we read natively and verify against the
    registry to fail fast on drift.
    """
    if name not in TESTDATA:
        raise KeyError(f"unknown table {name!r}; known: {TABLE_NAMES}")
    # events.parquet carries INT64 TIMESTAMP(NANOS), which Spark rejects
    # outright unless nanosAsLong is on. The conf is a runtime SQL conf,
    # so set it here rather than relying on the session having been
    # built by session.get_spark — callers (the correctness driver, a
    # notebook) may hand us a plain SparkSession.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # Timestamp columns arrive differently depending on how the fixture
    # was written and on session confs; normalize every declared
    # TimestampType field to TIMESTAMP (with session tz = UTC, see
    # session.py) so downstream expressions (unix_micros, window, ASOF
    # arithmetic) see one type:
    #   - INT64 TIMESTAMP(NANOS) → long under nanosAsLong → truncate to
    #     micros (the same ns → us conversion DuckDB/Arrow apply);
    #   - TIMESTAMP(MICROS) without isAdjustedToUTC → TIMESTAMP_NTZ
    #     under inferTimestampNTZ → cast, exact under the UTC session tz.
    for field in TESTDATA[name].fields:
        if not isinstance(field.dataType, T.TimestampType):
            continue
        arrived = df.schema[field.name].dataType
        if isinstance(arrived, T.LongType):
            df = df.withColumn(
                field.name, F.timestamp_micros(F.expr(f"{field.name} div 1000"))
            )
        elif isinstance(arrived, T.TimestampNTZType):
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
    expected = [f.name for f in TESTDATA[name].fields]
    if df.columns != expected:
        raise ValueError(f"{name}: columns {df.columns} != declared {expected}")
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES
) -> dict[str, DataFrame]:
    """Register every testdata table as a temp view for the SQL entry
    point (reference: journey-data-transformation.py:60-61)."""
    dfs = load_tables(spark, sf_dir, names)
    for n, df in dfs.items():
        df.createOrReplaceTempView(n)
    return dfs


def from_pandas(spark: SparkSession, pdf, schema=None) -> DataFrame:
    """S8 — pandas → Spark interop (reference:
    notebook/data-exploration/Exploration.ipynb cells 4, 14, where the
    exploration path loads CSV / nested-JSON days into a
    ``pd.DataFrame``). Goes through ``createDataFrame`` with Arrow
    enabled (session.py turns on
    ``spark.sql.execution.arrow.pyspark.enabled``), so the transfer is
    one zero-copy Arrow batch per partition, not row pickling.

    Dev/exploration-scale only by design: the input lives on the
    driver. Anything bigger than a notebook sample should land as
    parquet and come in through :func:`read_parquet`.
    """
    return spark.createDataFrame(pdf, schema=schema)


def to_pandas(df: DataFrame, limit: int | None = 100_000):
    """S8 — Spark → pandas for driver-side exploration. Arrow-batched
    collect (same conf as :func:`from_pandas`).

    ``limit`` is a guard, not a sample: collecting an unbounded 100-TB
    frame onto the driver is the classic notebook OOM, so the default
    caps the transfer and loudly refuses anything over it. Pass
    ``limit=None`` only when the frame is already a small aggregate.
    """
    if limit is None:
        return df.toPandas()
    # single pass: collect limit+1 rows and refuse on overflow — a
    # separate count() would execute the whole plan twice
    pdf = df.limit(limit + 1).toPandas()
    if len(pdf) > limit:
        raise ValueError(
            f"to_pandas: more than limit={limit} rows; aggregate or "
            "sample first, or pass limit=None to force"
        )
    return pdf
