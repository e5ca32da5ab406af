from batch_processing_on_aws_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    extract_media_features,
    media_dedup_by_content,
)


def _media(spark):
    rows = [
        (1, "image", "image/jpeg", b"\xff\xd8fakejpeg", (640, 480, None)),
        (2, "audio", "audio/wav", b"RIFFfakewav", (None, None, 1200)),
        (3, "image", "image/jpeg", b"\xff\xd8fakejpeg", (640, 480, None)),  # dup of 1
        (4, "hologram", "x/unknown", b"??", (None, None, None)),  # unsupported kind
        (5, "image", "image/png", None, (None, None, None)),  # missing payload
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_feature_extraction_batch_shape(spark):
    out = {r["media_id"]: r for r in extract_media_features(_media(spark)).collect()}
    assert len(out) == 5
    # identical payloads → identical features and hashes
    assert out[1]["feat"] == out[3]["feat"]
    assert out[1]["sha256"] == out[3]["sha256"]
    assert out[1]["decode_ok"] and len(out[1]["feat"]) == 8
    # unsupported kind fails loudly per-row, not per-job
    assert out[4]["decode_ok"] is False
    # missing payload decodes to the zero vector
    assert out[5]["feat"] == [0.0] * 8 and out[5]["sha256"] is None
    assert out[2]["n_bytes"] == len(b"RIFFfakewav")


def test_media_dedup_by_content(spark):
    kept = {r["media_id"] for r in media_dedup_by_content(_media(spark)).collect()}
    # 1 and 3 share a payload → lowest id (1) kept
    assert 1 in kept and 3 not in kept
    assert kept == {1, 2, 4, 5}
