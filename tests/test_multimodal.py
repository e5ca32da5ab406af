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


def test_sample_frames_fan_out_and_edges(spark):
    """1→N fan-out: every non-empty payload yields exactly n_frames
    slices that reassemble to the original; empty/NULL payloads yield
    nothing."""
    from batch_processing_on_aws_spark.operators.multimodal import sample_frames

    rows = [
        (1, "video", None, bytearray(b"abcdefghij"), None),
        (2, "video", None, bytearray(b""), None),
        (3, "video", None, None, None),
        (4, "video", None, bytearray(b"xy"), None),  # shorter than n_frames
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = sample_frames(df, n_frames=4).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r.media_id, []).append(r)
    assert set(by_id) == {1, 4}
    f1 = sorted(by_id[1], key=lambda r: r.frame_idx)
    assert [bytes(r.frame_bytes) for r in f1] == [b"ab", b"cde", b"fg", b"hij"]
    assert b"".join(bytes(r.frame_bytes) for r in sorted(
        by_id[4], key=lambda r: r.frame_idx)) == b"xy"

    import pytest as _pytest

    with _pytest.raises(ValueError, match="n_frames"):
        sample_frames(df, n_frames=0)


def test_resize_media_rewrites_meta_only(spark):
    from batch_processing_on_aws_spark.operators.multimodal import resize_media

    rows = [
        (1, "image", "image/jpeg", bytearray(b"payload"), (640, 480, None)),
        (2, "image", "image/jpeg", None, (10, 10, None)),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r.media_id: r for r in resize_media(df, 224, 224).collect()}
    assert (out[1].meta.width, out[1].meta.height) == (224, 224)
    assert bytes(out[1].data) == b"payload"  # stub passes bytes through
    assert out[1].resized is True
    assert out[2].resized is False
    assert (out[2].meta.width, out[2].meta.height) == (10, 10)
