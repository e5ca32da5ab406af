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


FRAME_SCHEMA = "media_id long, frame_idx int, frame_bytes binary, frame_sha string"


def sample_frames(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Video frame sampling: each media row fans out to ``n_frames``
    rows — the 1→N Arrow batch shape every frame-level pipeline needs
    (``mapInPandas`` may yield more rows than it consumes; Spark just
    streams the longer batches).

    STUB codec (media libs not in this container): a "frame" is the
    i-th of ``n_frames`` contiguous byte slices of the payload —
    deterministic integer arithmetic, so a SQL oracle can reproduce
    every frame hash. Swap the slicing for pyav keyframe extraction in
    production; the schema, fan-out shape, and batch bounds stay.

    Rows with empty/NULL payloads emit no frames (nothing to decode);
    payloads shorter than ``n_frames`` emit empty trailing frames —
    both loud, documented edges, not silent drops of whole batches.
    """
    if n_frames <= 0:
        raise ValueError(f"n_frames must be positive, got {n_frames}")

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "frame_bytes": [], "frame_sha": []}
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                if data is None or len(data) == 0:
                    continue
                length = len(data)
                for i in range(n_frames):
                    chunk = data[i * length // n_frames : (i + 1) * length // n_frames]
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["frame_bytes"].append(bytes(chunk))
                    out["frame_sha"].append(hashlib.sha256(bytes(chunk)).hexdigest())
            yield pd.DataFrame(out)

    return df.mapInPandas(sample, schema=FRAME_SCHEMA)


def resize_media(df: DataFrame, width: int, height: int) -> DataFrame:
    """Binary→binary media transform (decode → resize → re-encode),
    schema-preserving plus a ``resized`` flag. STUB: the payload
    passes through untouched and only the metadata is rewritten —
    the real PIL/ffmpeg call drops in where noted without changing
    the batch shape or output schema.
    """
    out_schema = T.StructType(
        [*MEDIA_SCHEMA.fields, T.StructField("resized", T.BooleanType(), True)]
    )

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas, resized = [], []
            for data, meta in zip(pdf["data"], pdf["meta"]):
                if data is None:
                    metas.append(meta)
                    resized.append(False)
                    continue
                # REAL CODEC GOES HERE: decode(data) → resize → encode
                m = dict(meta) if meta is not None else {}
                m["width"], m["height"] = width, height
                metas.append(m)
                resized.append(True)
            out = pdf.copy()
            out["meta"] = metas
            out["resized"] = resized
            yield out

    return df.mapInPandas(resize, schema=out_schema)
