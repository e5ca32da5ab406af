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


def test_resize_media_real_transform(spark):
    import numpy as np

    from batch_processing_on_aws_spark.operators.multimodal import (
        decode_image,
        resize_media,
    )

    # 4x4 grayscale PGM with distinct pixels: resize to 2x2 must pick
    # the index-map nearest neighbors (0,2)x(0,2) -> values 0,2,8,10
    src = bytes(range(16))
    pgm = b"P5 4 4 255\n" + src
    # 2x2 color PPM upscaled to 4x4: each pixel replicates 2x2
    rgb = bytes(
        [255, 0, 0, 0, 255, 0,
         0, 0, 255, 9, 9, 9]
    )
    ppm = b"P6 2 2 255\n" + rgb
    rows = [
        (1, "image", "image/x-portable-graymap", bytearray(pgm), (4, 4, None)),
        (2, "image", "image/x-portable-pixmap", bytearray(ppm), (2, 2, None)),
        (3, "audio", "audio/wav", bytearray(b"not an image"), (None, None, 7)),
        (4, "image", "image/jpeg", None, (10, 10, None)),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)

    out = {r.media_id: r for r in resize_media(df, 2, 2).collect()}
    assert out[1].resized is True
    assert out[1].mime == "image/x-portable-graymap"
    assert (out[1].meta.width, out[1].meta.height) == (2, 2)
    arr = decode_image(bytes(out[1].data))
    assert arr.shape == (2, 2, 1)
    assert arr[:, :, 0].tolist() == [[0, 2], [8, 10]]

    up = {r.media_id: r for r in resize_media(df, 4, 4).collect()}
    assert up[2].resized is True
    assert up[2].mime == "image/x-portable-pixmap"
    arr2 = decode_image(bytes(up[2].data))
    assert arr2.shape == (4, 4, 3)
    # 2x blow-up: kron of the source with ones((2,2))
    src_arr = np.frombuffer(rgb, dtype=np.uint8).reshape(2, 2, 3)
    expect = np.kron(src_arr, np.ones((2, 2, 1), dtype=np.uint8))
    assert (arr2 == expect).all()

    # undecodable + NULL payloads pass through untouched, loudly
    assert out[3].resized is False
    assert bytes(out[3].data) == b"not an image"
    assert out[3].mime == "audio/wav"
    assert out[3].meta.duration_ms == 7
    assert out[4].resized is False
    assert out[4].data is None
    assert (out[4].meta.width, out[4].meta.height) == (10, 10)


def test_resize_media_aspect_and_roundtrip(spark):
    import numpy as np

    from batch_processing_on_aws_spark.operators.multimodal import (
        decode_image,
        encode_pnm,
        resample_nearest,
        resize_media,
    )

    # non-integral downscale 7x5 -> 3x2 follows (i*src)//dst exactly
    src = np.arange(35, dtype=np.uint8).reshape(5, 7, 1)
    pgm = encode_pnm(src)
    assert decode_image(pgm).tolist() == src.tolist()  # PNM round-trip
    df = spark.createDataFrame(
        [(1, "image", "image/x-portable-graymap", bytearray(pgm), (7, 5, None))],
        MEDIA_SCHEMA,
    )
    out = resize_media(df, 3, 2).collect()[0]
    got = decode_image(bytes(out.data))
    ys = (np.arange(2) * 5) // 2
    xs = (np.arange(3) * 7) // 3
    assert got.tolist() == src[np.ix_(ys, xs)].tolist()
    assert resample_nearest(src, 3, 2).tolist() == got.tolist()
    # RGBA/gray+alpha inputs drop alpha on encode
    rgba = np.arange(16, dtype=np.uint8).reshape(2, 2, 4)
    assert decode_image(encode_pnm(rgba)).shape == (2, 2, 3)
    ga = np.arange(8, dtype=np.uint8).reshape(2, 2, 2)
    assert decode_image(encode_pnm(ga)).shape == (2, 2, 1)


# ------------------------------------------------------- real codec


def _ppm(w, h, pixels):
    """Binary P6 with a comment line (exercises header tokenizer)."""
    return b"P6\n# fixture\n%d %d\n255\n" % (w, h) + bytes(pixels)


def _bmp24(w, h, rows_top_down):
    """Uncompressed 24bpp BI_RGB BMP, bottom-up rows, 4-byte padding.
    ``rows_top_down``: list of rows, each a list of (r, g, b)."""
    stride = (w * 3 + 3) & ~3
    raster = b""
    for row in reversed(rows_top_down):  # file stores bottom-up
        line = b"".join(bytes((b_, g, r)) for (r, g, b_) in row)
        raster += line + b"\x00" * (stride - len(line))
    off = 54
    header = (
        b"BM"
        + (off + len(raster)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(raster).to_bytes(4, "little")
        + b"\x00" * 16
    )
    return header + raster


def test_decode_ppm_values():
    from batch_processing_on_aws_spark.operators.multimodal import decode_image

    # 2x2 RGB: red, green / blue, white
    px = [255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255]
    arr = decode_image(_ppm(2, 2, px))
    assert arr.shape == (2, 2, 3)
    assert arr[0, 0].tolist() == [255, 0, 0]
    assert arr[0, 1].tolist() == [0, 255, 0]
    assert arr[1, 0].tolist() == [0, 0, 255]
    assert arr[1, 1].tolist() == [255, 255, 255]


def test_decode_bmp_values_padding_and_flip():
    from batch_processing_on_aws_spark.operators.multimodal import decode_image

    # 3x2 image: top row red/green/blue, bottom row black/gray/white.
    rows = [
        [(255, 0, 0), (0, 255, 0), (0, 0, 255)],
        [(0, 0, 0), (128, 128, 128), (255, 255, 255)],
    ]
    arr = decode_image(_bmp24(3, 2, rows))
    assert arr.shape == (2, 3, 3)
    assert arr[0, 0].tolist() == [255, 0, 0]      # top-left red (unflipped)
    assert arr[1, 1].tolist() == [128, 128, 128]
    assert arr[1, 2].tolist() == [255, 255, 255]


def test_decode_rejects_garbage():
    import pytest

    from batch_processing_on_aws_spark.operators.multimodal import decode_image

    for bad in (b"", b"\xff\xd8fakejpeg", b"P6\n2 2\n999\n" + b"\x00" * 12,
                b"BM" + b"\x00" * 10):
        with pytest.raises(ValueError):
            decode_image(bad)


def test_extract_features_real_dims_for_decodable_images(spark):
    ppm = _ppm(4, 2, [10] * 24)
    bmp = _bmp24(3, 2, [[(1, 2, 3)] * 3, [(4, 5, 6)] * 3])
    rows = [
        (1, "image", "image/x-ppm", bytearray(ppm), (None, None, None)),
        (2, "image", "image/bmp", bytearray(bmp), (None, None, None)),
        (3, "image", "image/jpeg", bytearray(b"\xff\xd8notdecodable"), (None, None, None)),
        (4, "audio", "audio/wav", bytearray(b"RIFFxx"), (None, None, None)),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in extract_media_features(df).collect()}
    assert (out[1]["width"], out[1]["height"], out[1]["channels"]) == (4, 2, 3)
    assert (out[2]["width"], out[2]["height"], out[2]["channels"]) == (3, 2, 3)
    # real pixel stats, not hash noise: uniform 10-valued PPM
    assert abs(out[1]["feat"][3] - 10 / 255) < 1e-6  # mean
    assert out[1]["feat"][:3] == [4.0, 2.0, 3.0]
    # non-decodable image falls back to the stub: no dims, still ok
    assert out[3]["width"] is None and out[3]["decode_ok"] is True
    assert out[4]["width"] is None and len(out[4]["feat"]) == 8


def _wav_bytes(freq=440.0, rate=8000, seconds=0.5, channels=1, bits=16,
               amp=0.5):
    import struct

    import numpy as np

    n = int(rate * seconds)
    t = np.arange(n) / rate
    mono = amp * np.sin(2 * np.pi * freq * t)
    frames = np.tile(mono[:, None], (1, channels))
    if bits == 16:
        raw = (frames * 32767).astype("<i2").tobytes()
    else:
        raw = ((frames * 127) + 128).astype("u1").tobytes()
    block_align = channels * bits // 8
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * block_align,
                      block_align, bits)
    body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(raw)) + raw)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def test_decode_wav_sine_values():
    import numpy as np

    from batch_processing_on_aws_spark.operators.multimodal import decode_wav

    samples, rate = decode_wav(_wav_bytes(channels=2))
    assert rate == 8000
    assert samples.shape == (4000, 2)
    # 0.5-amplitude sine: RMS = 0.5/sqrt(2), peak ~0.5
    assert abs(np.sqrt((samples[:, 0] ** 2).mean()) - 0.3536) < 0.01
    assert abs(np.abs(samples).max() - 0.5) < 0.01
    # 8-bit path decodes to the same signal at lower precision
    s8, _ = decode_wav(_wav_bytes(bits=8))
    assert abs(np.sqrt((s8[:, 0] ** 2).mean()) - 0.3536) < 0.02


def test_decode_wav_rejects_non_pcm():
    import pytest

    from batch_processing_on_aws_spark.operators.multimodal import decode_wav

    with pytest.raises(ValueError):
        decode_wav(b"RIFFfakewav")  # truncated, no chunks
    with pytest.raises(ValueError):
        decode_wav(b"\xff\xd8not audio at all, nope")


def test_extract_features_real_audio(spark):
    """A real PCM WAV payload yields true duration/rate/RMS features
    through the Arrow batch path; a fake 'RIFF' payload falls back to
    the hash stub without failing the row."""
    rows = [
        (10, "audio", "audio/wav", _wav_bytes(seconds=2.0), (None, None, 2000)),
        (11, "audio", "audio/wav", b"RIFFfakewav", (None, None, 99)),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in extract_media_features(df).collect()}
    real = out[10]
    assert real["decode_ok"] and real["channels"] == 1
    assert abs(real["feat"][0] - 2.0) < 1e-6      # duration seconds
    assert real["feat"][1] == 8000.0              # sample rate
    assert abs(real["feat"][3] - 0.3536) < 0.01   # RMS
    stub = out[11]
    assert stub["decode_ok"] and stub["channels"] is None


# ------------------------------------------------- perceptual hash


def test_dhash_reference_and_resize():
    """dhash_hex against a brute-force reference on a LARGER image
    (exercises the index-map nearest-neighbor downscale, which the
    registry's 9x8 identity-grid oracle deliberately does not)."""
    import numpy as np

    from batch_processing_on_aws_spark.operators.multimodal import dhash_hex

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (40, 55, 3), dtype=np.uint8)
    a = img.astype(np.int64)
    gray = (299 * a[:, :, 0] + 587 * a[:, :, 1] + 114 * a[:, :, 2]) // 1000
    ys = [(i * 40) // 8 for i in range(8)]
    xs = [(i * 55) // 9 for i in range(9)]
    v = 0
    for y in ys:
        for j in range(8):
            v = (v << 1) | int(gray[y][xs[j + 1]] > gray[y][xs[j]])
    assert dhash_hex(img) == format(v, "016x")


def test_dhash_perceptual_properties():
    """The property that makes dHash a NEAR-dup key: a uniform
    brightness shift keeps the hash identical (gradients unchanged),
    while an unrelated image differs in many bits."""
    import numpy as np

    from batch_processing_on_aws_spark.operators.multimodal import dhash_hex

    rng = np.random.default_rng(9)
    img = rng.integers(30, 200, (32, 32, 3), dtype=np.uint8)
    brighter = np.clip(img.astype(np.int64) + 20, 0, 255).astype(np.uint8)
    assert dhash_hex(img) == dhash_hex(brighter)
    other = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    d = bin(int(dhash_hex(img), 16) ^ int(dhash_hex(other), 16)).count("1")
    assert d > 10


def test_perceptual_hash_formats_and_failures(spark):
    """Same content through PGM and BMP must hash identically (codec-
    independent fingerprint); undecodable payloads yield decode_ok
    False with NULL hash."""
    import numpy as np

    from batch_processing_on_aws_spark.operators.multimodal import (
        dhash_hex,
        decode_image,
        perceptual_hash,
    )

    rng = np.random.default_rng(13)
    gray_rows = rng.integers(0, 256, (8, 9), dtype=np.uint8)
    # gray BMP: r=g=b so Rec.601 luma == the gray value
    bmp = _bmp24(
        9, 8, [[(int(v),) * 3 for v in row] for row in gray_rows]
    )
    pgm = b"P5 9 8 255\n" + bytes(int(v) for row in gray_rows for v in row)
    assert dhash_hex(decode_image(pgm)) == dhash_hex(decode_image(bmp))
    rows = [(1, pgm), (2, bmp), (3, b"\x89PNG not decodable")]
    df = spark.createDataFrame(rows, "media_id long, data binary")
    out = {r["media_id"]: r for r in perceptual_hash(df).collect()}
    assert out[1]["phash"] == out[2]["phash"] is not None
    assert out[3]["decode_ok"] is False and out[3]["phash"] is None


def test_media_neardup_pairs_planted_twins(spark):
    """Banded Hamming pairing over dHash codes: planted perceptual
    twins (brightness-shifted and 2x-resized copies — dHash-invariant
    by construction) must ALL pair at hamming 0; a few-bit perturbed
    copy pairs within the radius; an unrelated image pairs with
    nothing. The pigeonhole guarantee (Hamming <= 3 => >= 1 of 4
    16-bit chunks identical) makes recall on the planted set exact,
    not probabilistic."""
    import numpy as np

    from batch_processing_on_aws_spark.operators.multimodal import (
        decode_image,
        dhash_hex,
        media_neardup_pairs,
        perceptual_hash,
    )

    rng = np.random.default_rng(21)
    base = rng.integers(0, 128, (16, 18), dtype=np.uint8)  # headroom: +64 safe

    def pgm(img):
        h, w = img.shape
        return (f"P5 {w} {h} 255\n").encode() + bytes(
            int(v) for row in img for v in row
        )

    bright = (base + 64).astype(np.uint8)
    resized = np.kron(base, np.ones((2, 2), dtype=np.uint8))  # 32x36 2x blow-up
    # perturb: force-flip grid bit (0,0) — grid cells are pixels
    # [0, 0] and [0, 2] on the 16x18 canvas — in whichever direction
    # INVERTS the base's comparison; the collateral bit (0,1) may also
    # flip, keeping total distance within the radius
    pert = base.copy().astype(np.int64)
    if base[0, 2] > base[0, 0]:
        pert[0, 0], pert[0, 2] = 127, 0
    else:
        pert[0, 0], pert[0, 2] = 0, 127
    pert = pert.astype(np.uint8)
    other = rng.integers(0, 256, (16, 18), dtype=np.uint8)
    imgs = {1: base, 2: bright, 3: resized, 4: pert, 5: other}
    # sanity on the planted geometry before the distributed run
    h = {k: dhash_hex(decode_image(pgm(v))) for k, v in imgs.items()}
    assert h[1] == h[2] == h[3]
    d14 = bin(int(h[1], 16) ^ int(h[4], 16)).count("1")
    d15 = bin(int(h[1], 16) ^ int(h[5], 16)).count("1")
    assert 1 <= d14 <= 3 and d15 > 3

    df = spark.createDataFrame(
        [(k, bytearray(pgm(v))) for k, v in imgs.items()],
        "media_id long, data binary",
    )
    pairs = {
        (r["media_id_a"], r["media_id_b"]): r["hamming"]
        for r in media_neardup_pairs(perceptual_hash(df)).collect()
    }
    assert pairs[(1, 2)] == pairs[(1, 3)] == pairs[(2, 3)] == 0
    assert (1, 4) in pairs and 1 <= pairs[(1, 4)] <= 3
    assert pairs[(2, 4)] == pairs[(1, 4)]  # twin pairs identically
    assert not any(5 in p for p in pairs)  # unrelated image: no pairs


def test_media_neardup_pairs_null_hash_and_radius(spark):
    """NULL phashes (undecodable payloads) are excluded, and the
    Hamming radius is enforced exactly: a pair at distance
    max_hamming+1 that still shares a chunk must be verified OUT."""
    from batch_processing_on_aws_spark.operators.multimodal import (
        media_neardup_pairs,
    )

    rows = [
        (1, "00000000000000ff"),
        (2, "00000000000000f0"),  # hamming 4 from 1, shares 3 chunks: OUT
        (3, "00000000000000fe"),  # hamming 1 from 1, 3 from 2: both IN
        (4, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, phash string")
    got = {
        (r["media_id_a"], r["media_id_b"]): r["hamming"]
        for r in media_neardup_pairs(df).collect()
    }
    assert got == {(1, 3): 1, (2, 3): 3}


def test_media_neardup_star_cap_on_viral_clique(spark):
    """The exact-dup-clique escape hatch: 40 identical hashes in one
    corpus would mint C(40,2)=780 pairs uncapped; with the cap binding
    they collapse to 39 star edges from the min id — still one
    connected component for a CC consumer — while uncapped remains the
    exact contract and natural near-dups pair regardless."""
    from batch_processing_on_aws_spark.operators.multimodal import (
        media_neardup_pairs,
    )

    viral = [(i, "deadbeefdeadbeef") for i in range(40)]
    other = [(100, "00000000000000ff"), (101, "00000000000000fe")]
    df = spark.createDataFrame(viral + other, "media_id long, phash string")
    capped = media_neardup_pairs(df, max_bucket_size=10).collect()
    star = {(r["media_id_a"], r["media_id_b"]) for r in capped
            if r["media_id_b"] < 100}
    assert star == {(0, i) for i in range(1, 40)}  # 39 edges, not 780
    assert all(r["hamming"] == 0 for r in capped if r["media_id_b"] < 100)
    assert ((100, 101) in {(r["media_id_a"], r["media_id_b"])
                           for r in capped})  # natural pair unaffected
    uncapped = media_neardup_pairs(df, max_bucket_size=None).collect()
    assert len([r for r in uncapped if r["media_id_b"] < 100]) == 780
    dropped = media_neardup_pairs(
        df, max_bucket_size=10, oversized="drop"
    ).collect()
    assert [r for r in dropped if r["media_id_b"] < 100] == []


# ------------------------------------------------------------------ PNG

def _encode_png(arr, filters):
    """Reference encoder: forward-filter each row with the given
    per-row filter types (cycled), deflate, wrap in chunks — so the
    decoder must invert every filter to round-trip."""
    import struct
    import zlib

    import numpy as np

    h, w, c = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    raw = bytearray()
    prev = np.zeros(w * c, dtype=np.int32)
    for y in range(h):
        row = arr[y].reshape(-1).astype(np.int32)
        ft = filters[y % len(filters)]
        raw.append(ft)
        for j in range(w * c):
            left = int(row[j - c]) if j >= c else 0
            up = int(prev[j])
            ul = int(prev[j - c]) if j >= c else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = left
            elif ft == 2:
                pred = up
            elif ft == 3:
                pred = (left + up) >> 1
            else:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc) else (
                    up if pb <= pc else ul
                )
            raw.append((int(row[j]) - pred) & 0xFF)
        prev = row

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_decode_png_roundtrip_all_filters_all_colortypes():
    import numpy as np

    from batch_processing_on_aws_spark.operators.multimodal import (
        decode_image,
        decode_png,
    )

    rng = np.random.RandomState(42)
    for c in (1, 2, 3, 4):
        arr = rng.randint(0, 256, size=(7, 5, c), dtype=np.uint8)
        # every filter type exercised, including rows where left/up
        # neighbors matter
        png = _encode_png(arr, filters=[0, 1, 2, 3, 4])
        got = decode_png(png)
        assert got.shape == arr.shape
        assert (got == arr).all(), c
        # and through the dispatching front door
        assert (decode_image(png) == arr).all()


def test_decode_png_multi_idat_and_rejections():
    import struct
    import zlib

    import numpy as np
    import pytest

    from batch_processing_on_aws_spark.operators.multimodal import (
        decode_png,
    )

    arr = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
    png = _encode_png(arr, filters=[0])
    # split the single IDAT into two chunks: decoders must concat
    sig, rest = png[:8], png[8:]
    ln = struct.unpack(">I", rest[:4])[0]
    ihdr_chunk = rest[: 12 + ln]
    rest2 = rest[12 + ln:]
    ln2 = struct.unpack(">I", rest2[:4])[0]
    idat_body = rest2[8 : 8 + ln2]
    iend = rest2[12 + ln2:]

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    two = (
        sig + ihdr_chunk + chunk(b"IDAT", idat_body[:5])
        + chunk(b"IDAT", idat_body[5:]) + iend
    )
    assert (decode_png(two) == arr).all()

    with pytest.raises(ValueError, match="signature"):
        decode_png(b"\x89PNG\r\n\x1a!" + png[8:])
    # 16-bit depth rejected
    bad_ihdr = struct.pack(">IIBBBBB", 4, 2, 16, 2, 0, 0, 0)
    bad = sig + chunk(b"IHDR", bad_ihdr) + chunk(b"IDAT", idat_body) + iend
    with pytest.raises(ValueError, match="unsupported"):
        decode_png(bad)
    # interlaced rejected
    bad_ihdr = struct.pack(">IIBBBBB", 4, 2, 8, 2, 0, 0, 1)
    bad = sig + chunk(b"IHDR", bad_ihdr) + chunk(b"IDAT", idat_body) + iend
    with pytest.raises(ValueError, match="interlace"):
        decode_png(bad)
    # truncated raster rejected
    short = zlib.compress(b"\x00" * 5)
    bad = sig + ihdr_chunk + chunk(b"IDAT", short) + iend
    with pytest.raises(ValueError, match="length mismatch"):
        decode_png(bad)


def test_audio_features_known_wave_and_stub(spark):
    import struct

    import numpy as np

    from batch_processing_on_aws_spark.operators.multimodal import (
        audio_features,
    )

    # a 100 Hz square wave at 8 kHz: 40 samples/half-period, 160
    # samples = 2 periods -> 3 sign flips; amplitude 1000
    vals = []
    for i in range(160):
        vals.append(1000 if (i // 40) % 2 == 0 else -1000)
    raw = np.array(vals, dtype="<i2").tobytes()
    wav = (
        b"RIFF" + struct.pack("<I", 36 + len(raw)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"data" + struct.pack("<I", len(raw)) + raw
    )
    df = spark.createDataFrame(
        [(1, bytearray(wav)), (2, bytearray(b"not audio"))],
        "media_id long, data binary",
    )
    out = {r["media_id"]: r for r in audio_features(df).collect()}
    ok = out[1]
    assert ok["decode_ok"] and ok["n_frames"] == 160
    assert ok["sample_rate"] == 8000 and ok["duration_ms"] == 20
    assert ok["peak_abs"] == 1000
    assert ok["energy"] == 160 * 1000 * 1000
    assert ok["zero_crossings"] == 3
    bad = out[2]
    assert bad["decode_ok"] is False and bad["energy"] is None


# ------------------------------------------------------------------ JPEG

# Annex K standard luminance Huffman tables (encoder side only — the
# decoder parses whatever DHT the stream carries)
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _huff_codes(bits, vals):
    codes, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[vals[k]] = (ln, code)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code, length):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc, self.n = 0, 0

    def align(self):
        while self.n:
            self.put(1, 1)  # pad with 1s per spec


def _encode_jpeg(w, h, comps, qtables, restart_interval=0):
    """Minimal baseline JFIF encoder for test fixtures.

    comps: list of {"blocks": {(by,bx): [64 zigzag quantized ints]},
    "h":, "v":, "tq":}; qtables: {tq: [64 zigzag ints]}. Uses the
    Annex K luminance tables for every component (legal, if
    suboptimal, for chroma)."""
    import struct

    dc = _huff_codes(_DC_BITS, _DC_VALS)
    ac = _huff_codes(_AC_BITS, _AC_VALS)

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    for tq, q in qtables.items():
        out += seg(0xDB, bytes([tq]) + bytes(q))
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for i, c in enumerate(comps):
        sof += bytes([i + 1, (c["h"] << 4) | c["v"], c["tq"]])
    out += seg(0xC0, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS))
    out += seg(0xC4, bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([len(comps)])
    for i in range(len(comps)):
        sos += bytes([i + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    bw = _BitWriter()
    pred = [0] * len(comps)
    mcu_count, rst = 0, 0

    def put_coeff(codes, val, extra_bits=None):
        ln, code = codes
        bw.put(code, ln)

    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                bw.align()
                bw.out += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk = c["blocks"].get(
                            (my * c["v"] + by, mx * c["h"] + bx), [0] * 64
                        )
                        diff = blk[0] - pred[ci]
                        pred[ci] = blk[0]
                        t = abs(diff).bit_length()
                        bw.put(*reversed(dc[t]))
                        if t:
                            v = diff if diff > 0 else diff + (1 << t) - 1
                            bw.put(v, t)
                        run = 0
                        for k in range(1, 64):
                            v = blk[k]
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                bw.put(*reversed(ac[0xF0]))
                                run -= 16
                            s = abs(v).bit_length()
                            bw.put(*reversed(ac[(run << 4) | s]))
                            bw.put(v if v > 0 else v + (1 << s) - 1, s)
                            run = 0
                        if run:
                            bw.put(*reversed(ac[0x00]))  # EOB
            mcu_count += 1
    bw.align()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def _ref_idct_pixels(zig_blocks, q, nbx, nby, w, h):
    """Independent reference: dequantize + explicit-loop IDCT +
    level shift + round-half-up + clip, per block grid."""
    import math

    import numpy as np

    out = np.zeros((nby * 8, nbx * 8), dtype=np.uint8)
    zz = [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
    for (by, bx), blk in zig_blocks.items():
        F = np.zeros((8, 8))
        for k in range(64):
            F[zz[k] // 8][zz[k] % 8] = blk[k] * q[k]
        for y in range(8):
            for x in range(8):
                s = 0.0
                for u in range(8):
                    for v in range(8):
                        cu = 1 / math.sqrt(2) if u == 0 else 1.0
                        cv = 1 / math.sqrt(2) if v == 0 else 1.0
                        s += (
                            cu * cv / 4 * F[u][v]
                            * math.cos((2 * y + 1) * u * math.pi / 16)
                            * math.cos((2 * x + 1) * v * math.pi / 16)
                        )
                out[by * 8 + y][bx * 8 + x] = int(
                    min(255, max(0, math.floor(s + 128.5)))
                )
    return out[:h, :w]


def test_decode_jpeg_dc_only_exact():
    """DC-only grayscale blocks with an all-8s quant table decode to
    exactly clip(dc + 128) — the analytic hook the golden oracle
    uses."""
    from batch_processing_on_aws_spark.operators.multimodal import (
        decode_jpeg,
    )

    q = [8] * 64
    blocks = {}
    vals = {}
    for by in range(2):
        for bx in range(3):
            g = (by * 3 + bx) * 40 + 7  # 7, 47, ..., 207
            blocks[(by, bx)] = [g - 128] + [0] * 63
            vals[(by, bx)] = g
    data = _encode_jpeg(
        24, 16, [{"blocks": blocks, "h": 1, "v": 1, "tq": 0}], {0: q}
    )
    arr = decode_jpeg(data)
    assert arr.shape == (16, 24, 1)
    for (by, bx), g in vals.items():
        block = arr[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8, 0]
        assert (block == g).all(), (by, bx, g, block[0, 0])


def test_decode_jpeg_ac_coefficients_match_reference():
    """General AC path (runs, ZRL, EOB) against an independent
    explicit-loop IDCT."""
    import random

    from batch_processing_on_aws_spark.operators.multimodal import (
        decode_jpeg,
    )

    rng = random.Random(20260815)
    q = [16] + [max(1, (i * 7) % 24) for i in range(1, 64)]
    blocks = {}
    for by in range(2):
        for bx in range(2):
            blk = [0] * 64
            blk[0] = rng.randint(-60, 60)
            for _ in range(6):
                blk[rng.randint(1, 63)] = rng.randint(-30, 30)
            blk[63] = rng.choice([0, 5])  # exercise long runs / ZRL
            blocks[(by, bx)] = blk
    data = _encode_jpeg(
        16, 16, [{"blocks": blocks, "h": 1, "v": 1, "tq": 0}], {0: q}
    )
    got = decode_jpeg(data)[:, :, 0]
    want = _ref_idct_pixels(blocks, q, 2, 2, 16, 16)
    assert (got == want).all()


def test_decode_jpeg_420_color_and_crop():
    """3-component 4:2:0: MCU interleave, chroma replication
    upsample, BT.601 conversion, and non-multiple-of-16 crop."""
    import numpy as np

    from batch_processing_on_aws_spark.operators.multimodal import (
        decode_jpeg,
    )

    q = [8] * 64
    # luma: 2x2 blocks per MCU, DC-only; chroma: one block each
    yb = {
        (by, bx): [(by * 2 + bx) * 30 - 90] + [0] * 63
        for by in range(2)
        for bx in range(2)
    }
    cb = {(0, 0): [20] + [0] * 63}
    cr = {(0, 0): [-40] + [0] * 63}
    data = _encode_jpeg(
        12,
        10,
        [
            {"blocks": yb, "h": 2, "v": 2, "tq": 0},
            {"blocks": cb, "h": 1, "v": 1, "tq": 0},
            {"blocks": cr, "h": 1, "v": 1, "tq": 0},
        ],
        {0: q},
    )
    arr = decode_jpeg(data)
    assert arr.shape == (10, 12, 3)
    # top-left pixel: Y = -90+128 = 38, Cb = 20+128 = 148, Cr = -40+128 = 88
    y0, cb0, cr0 = 38.0, 148.0 - 128.0, 88.0 - 128.0
    want = [
        int(min(255, max(0, np.floor(v + 0.5))))
        for v in (
            y0 + 1.402 * cr0,
            y0 - 0.344136 * cb0 - 0.714136 * cr0,
            y0 + 1.772 * cb0,
        )
    ]
    assert list(arr[0, 0]) == want


def test_decode_jpeg_restart_markers():
    from batch_processing_on_aws_spark.operators.multimodal import (
        decode_jpeg,
    )

    q = [8] * 64
    blocks = {
        (0, bx): [bx * 20 - 60] + [0] * 63 for bx in range(4)
    }
    data = _encode_jpeg(
        32, 8, [{"blocks": blocks, "h": 1, "v": 1, "tq": 0}], {0: q},
        restart_interval=1,
    )
    assert b"\xff\xd0" in data or b"\xff\xd1" in data
    arr = decode_jpeg(data)
    for bx in range(4):
        assert (arr[:, bx * 8 : bx * 8 + 8, 0] == bx * 20 - 60 + 128).all()


def test_decode_jpeg_rejections_and_analyze_wiring(spark):
    import pytest as _pytest

    from batch_processing_on_aws_spark.operators.multimodal import (
        decode_image,
        decode_jpeg,
        extract_media_features,
    )

    with _pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x00\x01")
    # progressive frame marker (SOF2) is rejected loudly
    q = [8] * 64
    data = bytearray(
        _encode_jpeg(
            8, 8, [{"blocks": {(0, 0): [0] * 64}, "h": 1, "v": 1,
                    "tq": 0}], {0: q}
        )
    )
    idx = data.find(b"\xff\xc0")
    data[idx + 1] = 0xC2
    with _pytest.raises(ValueError, match="frame type"):
        decode_jpeg(bytes(data))
    # decode_image dispatches on the FFD8 magic
    good = _encode_jpeg(
        8, 8, [{"blocks": {(0, 0): [10] + [0] * 63}, "h": 1, "v": 1,
                "tq": 0}], {0: q}
    )
    assert decode_image(good).shape == (8, 8, 1)
    # and the Spark feature extractor reports true dimensions
    df = spark.createDataFrame(
        [(1, "image", good)], "media_id long, kind string, data binary"
    )
    row = extract_media_features(df).collect()[0]
    assert (row["width"], row["height"], row["channels"]) == (8, 8, 1)
    assert row["decode_ok"] is True
    assert row["feat"][3] == _pytest.approx((10 + 128) / 255.0)


# ---------------------------------------------------------------- AVI/MJPEG


def _build_avi(frames, width, height, fps_num=25, fps_den=1,
               handler=b"MJPG", compression=b"MJPG", stream_no=0,
               extra_audio_stream=False):
    """Minimal AVI/RIFF writer for test fixtures: LIST hdrl (avih +
    strl/strh/strf) + LIST movi of ##dc chunks, even-byte padding."""
    import struct

    def chunk(fourcc, body):
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def lst(ltype, body):
        return chunk(b"LIST", ltype + body)

    strh = (
        b"vids" + handler
        + struct.pack("<IHHIII", 0, 0, 0, 0, fps_den, fps_num)
        + struct.pack("<IIIII", 0, len(frames), 0, 0, 0)
        + struct.pack("<hhhh", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24, compression, 0, 0, 0, 0, 0
    )
    strl = lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    if extra_audio_stream:
        auds = (
            b"auds" + b"\x00" * 4
            + struct.pack("<IHHIII", 0, 0, 0, 0, 1, 8000)
            + struct.pack("<IIIII", 0, 0, 0, 0, 1)
            + struct.pack("<hhhh", 0, 0, 0, 0)
        )
        wavefmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
        strl += lst(b"strl", chunk(b"strh", auds) + chunk(b"strf", wavefmt))
    avih = (
        struct.pack(
            "<IIIIIIIIII",
            1000000 * fps_den // fps_num, 0, 0, 0x10,
            len(frames), 0, 2 if extra_audio_stream else 1, 0,
            width, height,
        )
        + b"\x00" * 16
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + strl)
    movi = lst(
        b"movi",
        b"".join(chunk(b"%02ddc" % stream_no, f) for f in frames),
    )
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _dc_jpeg(w, h, dc_of_block):
    """DC-only grayscale baseline JPEG with an all-8s quant table:
    block (by,bx) decodes to exactly clip(dc+128)."""
    nbx, nby = (w + 7) // 8, (h + 7) // 8
    blocks = {
        (by, bx): [dc_of_block(bx, by)] + [0] * 63
        for by in range(nby)
        for bx in range(nbx)
    }
    return _encode_jpeg(
        w, h, [{"blocks": blocks, "h": 1, "v": 1, "tq": 0}], {0: [8] * 64}
    )


def test_parse_avi_roundtrip_and_padding():
    from batch_processing_on_aws_spark.operators.multimodal import parse_avi

    f0 = _dc_jpeg(16, 8, lambda bx, by: 10 * bx + by)
    f1 = f0 + b"\x00"  # force odd payload length → pad byte exercised
    if len(f1) % 2 == 0:
        f1 = _dc_jpeg(16, 8, lambda bx, by: 3 * bx - by)
        if len(f1) % 2 == 0:
            f1 += b"\x00"
    f2 = _dc_jpeg(16, 8, lambda bx, by: bx - 2 * by)
    avi = _build_avi([f0, f1, f2], 16, 8, fps_num=30, fps_den=1001)
    vid = parse_avi(avi)
    assert (vid["width"], vid["height"]) == (16, 8)
    assert (vid["fps_num"], vid["fps_den"]) == (30, 1001)
    assert vid["n_frames"] == 3
    assert vid["frames"] == [f0, f1, f2]
    # audio stream alongside: video chunks still found, audio ignored
    avi2 = _build_avi([f0, f2], 16, 8, extra_audio_stream=True)
    assert parse_avi(avi2)["frames"] == [f0, f2]


def test_parse_avi_rejections():
    import pytest as _pytest

    from batch_processing_on_aws_spark.operators.multimodal import parse_avi

    f0 = _dc_jpeg(8, 8, lambda bx, by: 1)
    with _pytest.raises(ValueError, match="RIFF/AVI"):
        parse_avi(b"RIFFxxxxWAVE")
    with _pytest.raises(ValueError, match="no video"):
        parse_avi(_build_avi([], 8, 8)[:12])  # header only, no streams
    # non-MJPG codec rejected loudly
    with _pytest.raises(ValueError, match="only MJPG"):
        parse_avi(
            _build_avi([f0], 8, 8, handler=b"DIB ", compression=b"\x00" * 4)
        )
    # MJPG frame that is not a JPEG payload
    with _pytest.raises(ValueError, match="SOI"):
        parse_avi(_build_avi([b"nota jpeg!"], 8, 8))
    # truncated chunk inside movi
    avi = _build_avi([f0], 8, 8)
    with _pytest.raises(ValueError, match="truncated"):
        parse_avi(avi[:-4])
    # no frames at all
    with _pytest.raises(ValueError, match="no video frames"):
        parse_avi(_build_avi([], 8, 8))


def test_sample_frames_real_container(spark):
    from batch_processing_on_aws_spark.operators.multimodal import sample_frames

    frames = [
        _dc_jpeg(8, 8, lambda bx, by, k=k: (k * 7) % 100) for k in range(10)
    ]
    avi = _build_avi(frames, 8, 8)
    short = _build_avi(frames[:2], 8, 8)
    rows = [
        (1, "video", None, bytearray(avi), None),
        (2, "video", None, bytearray(short), None),
        (3, "video", None, bytearray(b"abcdefghij"), None),  # stub path
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = sample_frames(df, n_frames=4).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["media_id"], []).append(r)
    # real container: evenly spaced distinct container frame indices
    got = sorted((r["frame_idx"], bytes(r["frame_bytes"])) for r in by_id[1])
    assert [i for i, _ in got] == [0, 2, 5, 7]
    assert all(b == frames[i] for i, b in got)
    # 2-frame video: 2 distinct rows, not 4 duplicates
    assert sorted(r["frame_idx"] for r in by_id[2]) == [0, 1]
    # non-AVI payload keeps the byte-slice stub contract
    assert sorted(r["frame_idx"] for r in by_id[3]) == [0, 1, 2, 3]
    assert b"".join(
        bytes(r["frame_bytes"])
        for r in sorted(by_id[3], key=lambda r: r["frame_idx"])
    ) == b"abcdefghij"


def test_video_frame_phash_exact(spark):
    import numpy as np

    from batch_processing_on_aws_spark.operators.multimodal import (
        dhash_hex,
        video_frame_phash,
    )

    def gray(f, bx, by):
        return (f * 17 + bx * 11 + by * 13) % 256

    frames = [
        _dc_jpeg(72, 64, lambda bx, by, f=f: gray(f, bx, by) - 128)
        for f in range(6)
    ]
    avi = _build_avi(frames, 72, 64, fps_num=25, fps_den=1)
    # one valid AVI whose frame 2 is corrupt past the SOI marker
    bad = _build_avi([frames[0], b"\xff\xd8garbage", frames[2]], 72, 64)
    rows = [
        (1, "video", None, bytearray(avi), None),
        (2, "video", None, bytearray(b"not a container"), None),
        (3, "video", None, bytearray(bad), None),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = video_frame_phash(df, n_frames=3).collect()
    got = {(r["media_id"], r["frame_idx"]): r for r in out}
    # video 1: sampled frames 0,2,4 at the exact 25fps clock
    for f in (0, 2, 4):
        r = got[(1, f)]
        px = np.zeros((64, 72, 1), dtype=np.uint8)
        for by in range(8):
            for bx in range(9):
                px[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8, 0] = gray(
                    f, bx, by
                )
        assert r["phash"] == dhash_hex(px)
        assert r["ts_ms"] == f * 40
        assert (r["width"], r["height"]) == (72, 64)
        assert r["decode_ok"] is True
    # non-container payload: one loud decode_ok=false row
    r2 = [r for r in out if r["media_id"] == 2]
    assert len(r2) == 1 and r2[0]["decode_ok"] is False
    assert r2[0]["frame_idx"] is None and r2[0]["phash"] is None
    # corrupt FRAME: per-frame failure, siblings still hash
    assert got[(3, 1)]["decode_ok"] is False and got[(3, 1)]["phash"] is None
    assert got[(3, 0)]["decode_ok"] is True
    assert got[(3, 0)]["phash"] == got[(1, 0)]["phash"]


def test_video_neardup_pairs_planted(spark):
    from batch_processing_on_aws_spark.operators.multimodal import (
        video_neardup_pairs,
    )

    rows = []
    # v1 and v2 share 3 frame hashes; v3 shares only 1 with v1
    for f, h in enumerate(["aa", "bb", "cc"]):
        rows.append((1, f, h))
        rows.append((2, f, h))
    rows.append((3, 0, "aa"))
    rows.append((3, 1, "zz"))
    rows.append((3, 2, None))  # NULL hashes never pair
    # a boilerplate hash present in MANY videos is df-capped out
    for v in range(10, 20):
        rows.append((v, 0, "hot"))
        rows.append((v, 1, f"uniq{v}"))
    df = spark.createDataFrame(rows, "media_id long, frame_idx int, phash string")
    out = video_neardup_pairs(df, min_shared=2, max_hash_videos=5)
    pairs = {(r["media_id_a"], r["media_id_b"]): r["shared_frames"]
             for r in out.collect()}
    assert pairs == {(1, 2): 3}
    # with the cap lifted the hot-hash videos pair up (1 shared each)
    out2 = video_neardup_pairs(df, min_shared=1, max_hash_videos=1000)
    pairs2 = {(r["media_id_a"], r["media_id_b"]): r["shared_frames"]
              for r in out2.collect()}
    assert pairs2[(1, 3)] == 1 and pairs2[(2, 3)] == 1
    assert pairs2[(10, 11)] == 1 and len(pairs2) == 3 + 45


# ------------------------------------------------------------ audio WHT fp


def _wav_from_i16(samples, rate=8000):
    """Mono 16-bit PCM WAV from a list/array of int16 sample values."""
    import struct

    import numpy as np

    raw = np.asarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(raw)) + raw)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def _ref_wht_fp(samples, window=64, n_bits=32):
    """Reference fingerprint: per-window natural-order WHT neighbor
    compares, straight from the definition."""
    fps = []
    n_windows = len(samples) // window
    for w in range(n_windows):
        x = samples[w * window : (w + 1) * window]
        mags = []
        for k in range(1, n_bits + 2):
            c = sum(
                (1 if bin(k & n).count("1") % 2 == 0 else -1) * x[n]
                for n in range(window)
            )
            mags.append(abs(c))
        code = 0
        for b in range(n_bits):
            code = (code << 1) | (1 if mags[b] > mags[b + 1] else 0)
        fps.append(format(code, f"0{(n_bits + 3) // 4}x"))
    return fps


def test_audio_wht_fingerprint_matches_reference(spark):
    import numpy as np

    from batch_processing_on_aws_spark.operators.multimodal import (
        audio_wht_fingerprint,
    )

    rng = [((i * 2654435761) % 4001) - 2000 for i in range(192)]  # 3 windows
    rows = [
        (1, bytearray(_wav_from_i16(rng))),
        (2, b"not a wav"),
        (3, _wav_from_i16(rng[:10])),  # shorter than one window
    ]
    df = spark.createDataFrame(rows, "media_id long, data binary")
    got = {
        (r["media_id"], r["window_idx"]): r
        for r in audio_wht_fingerprint(df).collect()
    }
    want = _ref_wht_fp(rng)
    assert len(want) == 3
    for w, fp in enumerate(want):
        r = got[(1, w)]
        assert r["fp"] == fp and r["n_windows"] == 3 and r["decode_ok"]
    bad = got[(2, None)]
    assert bad["decode_ok"] is False and bad["fp"] is None
    short = got[(3, None)]
    assert short["decode_ok"] is True and short["n_windows"] == 0
    assert short["fp"] is None
    # numpy path really used int64 (no silent float drift)
    assert all(isinstance(v, str) for v in want)


def test_audio_wht_fingerprint_volume_invariant(spark):
    from batch_processing_on_aws_spark.operators.multimodal import (
        audio_wht_fingerprint,
    )

    base = [(((i * 48271) % 1999) - 999) * 2 for i in range(128)]  # even
    half = [v // 2 for v in base]
    df = spark.createDataFrame(
        [(1, _wav_from_i16(base)), (2, _wav_from_i16(half))],
        "media_id long, data binary",
    )
    out = audio_wht_fingerprint(df).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["media_id"], {})[r["window_idx"]] = r["fp"]
    assert by_id[1] == by_id[2]


def test_audio_wht_fingerprint_validation(spark):
    import pytest as _pytest

    from batch_processing_on_aws_spark.operators.multimodal import (
        audio_wht_fingerprint,
    )

    df = spark.createDataFrame([(1, b"")], "media_id long, data binary")
    with _pytest.raises(ValueError, match="power of two"):
        audio_wht_fingerprint(df, window=60)
    with _pytest.raises(ValueError, match="n_bits"):
        audio_wht_fingerprint(df, window=64, n_bits=63)


def test_audio_neardup_pairs_shared_windows_and_cap(spark):
    from batch_processing_on_aws_spark.operators.multimodal import (
        audio_neardup_pairs,
    )

    # synthetic fingerprint rows: clips 1/2 share two windows, clip 3
    # shares only one with clip 1; 'hot' is shared by everyone and
    # must be dropped by the cap
    rows = [
        (1, 0, "aa"), (1, 1, "bb"), (1, 2, "hot"), (1, 3, "cc"),
        (2, 0, "aa"), (2, 1, "bb"), (2, 2, "hot"),
        (3, 0, "cc"), (3, 1, "hot"),
        (4, 0, "hot"),
    ]
    df = spark.createDataFrame(rows, "media_id long, window_idx int, fp string")
    got = {
        (r["media_id_a"], r["media_id_b"]): r["shared_windows"]
        for r in audio_neardup_pairs(df, min_shared=2, max_hash_clips=3).collect()
    }
    assert got == {(1, 2): 2}
    # with the threshold at 1 and no cap pressure, the cc pair appears
    got1 = {
        (r["media_id_a"], r["media_id_b"]): r["shared_windows"]
        for r in audio_neardup_pairs(df, min_shared=1, max_hash_clips=3).collect()
    }
    assert got1 == {(1, 2): 2, (1, 3): 1}


def test_resample_audio_integer_kernel(spark):
    """resample_audio: identity ratio returns the exact samples,
    2:1 downsample picks every other sample (r=0 everywhere), a
    fractional ratio matches the reference integer lerp, and
    undecodable payloads pass through flagged."""
    import numpy as np

    from batch_processing_on_aws_spark.operators.multimodal import (
        decode_wav,
        resample_audio,
    )

    src = [((i * 2654435761) % 4001) - 2000 for i in range(256)]
    rows = [
        (1, bytearray(_wav_from_i16(src))),
        (2, b"mp3-ish junk"),
    ]
    df = spark.createDataFrame(rows, "media_id long, data binary")

    def samples_of(data):
        s, rate = decode_wav(bytes(data))
        return np.rint(s[:, 0] * 32768.0).astype(np.int64).tolist(), rate

    # identity: same rate out == exact same samples
    ident = {r["media_id"]: r for r in resample_audio(df, 8000).collect()}
    got, rate = samples_of(ident[1]["data"])
    assert rate == 8000 and got == src
    assert ident[1]["n_frames_in"] == ident[1]["n_frames_out"] == 256
    assert ident[2]["resampled"] is False
    assert bytes(ident[2]["data"]) == b"mp3-ish junk"

    # 2:1 downsample: every other sample, no interpolation residue
    half = {r["media_id"]: r for r in resample_audio(df, 4000).collect()}
    got, rate = samples_of(half[1]["data"])
    assert rate == 4000 and got == src[::2]

    # fractional 4:3 ratio: reference integer lerp
    frac = {r["media_id"]: r for r in resample_audio(df, 6000).collect()}
    got, rate = samples_of(frac[1]["data"])
    assert rate == 6000 and len(got) == 192
    want = []
    for j in range(192):
        num = j * 8000
        i0, r = divmod(num, 6000)
        i1 = min(i0 + 1, 255)
        u0, u1 = src[i0] + 32768, src[i1] + 32768
        want.append((u0 * (6000 - r) + u1 * r) // 6000 - 32768)
    assert got == want
