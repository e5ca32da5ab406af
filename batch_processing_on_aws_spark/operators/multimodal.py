"""Multimodal columns (extension surface, M8).

Images/audio/video ride through the engine as opaque ``binary``
columns plus typed metadata structs — the pattern public large-scale
training pipelines use (parquet/webdataset shards of bytes + metadata).
All Spark-side plumbing here is real and tested: schemas, Arrow-batched
``mapInPandas`` operators, partition sizing. The codec step itself
(JPEG decode, audio resample, video frame-sample) is STUBBED behind
``_decode_stub`` because the media libraries are not in this
container — swap the stub for PIL/torchaudio/pyav calls in production;
the batch shapes and signatures do not change.

Scale notes: media rows are big (MBs), so operators cap Arrow batch
sizes via ``spark.sql.execution.arrow.maxRecordsPerBatch`` and avoid
any driver collection; repartitioning is by size not row count
(``files.maxPartitionBytes`` governs the scan side).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), True),       # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("data", T.BinaryType(), True),        # opaque payload
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, sha256 string, "
    "feat array<float>, decode_ok boolean"
)


def _decode_stub(data: bytes | None, kind: str | None) -> list[float]:
    """STUB for the real codec: deterministic 8-dim 'feature' derived
    from the payload hash so tests are reproducible. Replace with a
    real decode + model forward pass in production.

    Raising ``NotImplementedError`` for unknown kinds keeps the
    contract honest: unsupported media fails loudly, not silently.
    """
    if kind not in ("image", "audio", "video"):
        raise NotImplementedError(f"no codec for kind={kind!r}")
    if not data:
        return [0.0] * 8
    h = hashlib.sha256(data).digest()
    return [b / 255.0 for b in h[:8]]


def extract_media_features(df: DataFrame, batch_rows: int = 256) -> DataFrame:
    """Arrow-batched feature extraction over a media table.

    ``mapInPandas`` streams column batches through Python — one
    (de)serialization per batch, not per row. ``batch_rows`` bounds
    peak memory per batch for MB-sized payloads (set
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` to match when the
    payloads are large).
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, ok = [], []
            for data, kind in zip(pdf["data"], pdf["kind"]):
                try:
                    feats.append(_decode_stub(data, kind))
                    ok.append(True)
                except NotImplementedError:
                    feats.append([0.0] * 8)
                    ok.append(False)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(d) if d is not None else 0 for d in pdf["data"]],
                    "sha256": [
                        hashlib.sha256(d).hexdigest() if d is not None else None
                        for d in pdf["data"]
                    ],
                    "feat": feats,
                    "decode_ok": ok,
                }
            )

    return df.mapInPandas(extract, schema=FEATURE_SCHEMA)


def media_dedup_by_content(df: DataFrame) -> DataFrame:
    """Exact media dedup on payload hash — JVM-side sha2 over the
    binary column, no Python. Returns one keeper per distinct payload."""
    from .dedup import dedup_deterministic

    hashed = df.withColumn("sha256", F.sha2(F.col("data"), 256))
    return dedup_deterministic(hashed, ["sha256"], [F.col("media_id").asc()])
