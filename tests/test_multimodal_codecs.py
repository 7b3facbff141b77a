"""Real multimodal codec operators: BMP/PPM decode + BGSV frame sampling.

The decoders are pure Python against fully-public format specs, so the
goldens here are independent reimplementations (struct-level byte walks in
the test, not shared helpers) plus hand-pinned fixtures.
"""

import hashlib
import struct

import pytest
from pyspark.sql import functions as F

from biggraphite_spark.operators.multimodal import (
    decode_image,
    encode_bmp,
    encode_video,
    frame_sample,
    synthesize_bmp_media,
    synthesize_media,
    synthesize_video_media,
)


def test_bmp_roundtrip_including_row_padding():
    # width 3 -> 9-byte rows, padded to 12 on disk: the classic BMP gotcha
    rgb = bytes(range(3 * 2 * 3))  # 3x2 image, distinct byte per channel
    payload = encode_bmp(3, 2, rgb)
    assert payload[:2] == b"BM"
    # independent decode: bottom-up rows, BGR channel order, 4-byte stride
    (offset,) = struct.unpack_from("<I", payload, 10)
    stride = 12
    got = bytearray()
    for y in (0, 1):  # top-down output; the file stores the bottom row first
        row = payload[offset + (1 - y) * stride :][: 3 * 3]
        for x in range(3):
            b, g, r = row[x * 3 : x * 3 + 3]
            got += bytes((r, g, b))
    assert bytes(got) == rgb


def test_decode_image_bmp_and_ppm(spark):
    rgb = bytes((x * 7) % 256 for x in range(4 * 4 * 3))
    bmp = encode_bmp(4, 4, rgb)
    ppm = b"P6\n# a comment\n4 4\n255\n" + rgb
    media = spark.createDataFrame(
        [
            (1, bytearray(bmp), ("image", "bmp", 4, 4, None)),
            (2, bytearray(ppm), ("image", "ppm", 4, 4, None)),
            (3, bytearray(b"garbage"), ("image", "bmp", 4, 4, None)),
            (4, bytearray(b"x"), ("image", "jpeg", 4, 4, None)),
        ],
        "media_id long, content binary, meta struct<media_type:string,format:string,width:int,height:int,duration_ms:long>",
    )
    rows = {r["media_id"]: r for r in decode_image(media).collect()}
    # both real decoders agree with the source pixels
    for mid in (1, 2):
        assert rows[mid]["error"] is None
        assert (rows[mid]["width"], rows[mid]["height"]) == (4, 4)
        assert bytes(rows[mid]["pixels"]) == rgb
    # corrupt payload and unsupported format -> error rows, stage survives
    assert rows[3]["error"] and rows[3]["pixels"] is None
    assert "unsupported format" in rows[4]["error"]


def test_decode_image_on_synthesized_corpus(spark):
    """End-to-end on driver data: synthesize real BMPs from documents, decode
    them, and pin against an independent md5-stream golden."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(20)
    decoded = decode_image(synthesize_bmp_media(docs)).collect()
    assert len(decoded) == 20
    texts = {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()}
    for r in decoded:
        assert r["error"] is None
        # golden: same pixel contract, recomputed from the raw text here
        seed = texts[r["media_id"]].encode()
        buf = bytearray()
        counter = 0
        while len(buf) < 8 * 8 * 3:
            buf += hashlib.md5(seed + counter.to_bytes(4, "little")).digest()
            counter += 1
        assert bytes(r["pixels"]) == bytes(buf[: 8 * 8 * 3])


def test_fake_jpeg_payloads_yield_error_rows_not_failures(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(5)
    rows = decode_image(synthesize_media(docs)).collect()
    assert len(rows) == 5
    assert all("unsupported format" in r["error"] for r in rows)


def test_frame_sample_cadence_and_decode(spark):
    # 6 frames x 250ms; sampling every 500ms keeps t=0,500,1000 -> idx 0,2,4
    rgb = bytes(12 * [7])
    frames = [(250, encode_bmp(2, 2, rgb)) for _ in range(6)]
    media = spark.createDataFrame(
        [(9, bytearray(encode_video(frames)), ("video", "bgsv", 2, 2, 1500))],
        "media_id long, content binary, meta struct<media_type:string,format:string,width:int,height:int,duration_ms:long>",
    )
    out = sorted(
        (r["frame_idx"], r["t_ms"]) for r in frame_sample(media, 500).collect()
    )
    assert out == [(0, 0), (2, 500), (4, 1000)]
    # sampled frames are themselves decodable images
    sampled = frame_sample(media, 500).select(
        F.col("frame_idx").cast("long").alias("media_id"),
        "content",
        F.struct(
            F.lit("image").alias("media_type"),
            F.lit("bmp").alias("format"),
            F.lit(2).alias("width"),
            F.lit(2).alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )
    decoded = decode_image(sampled).collect()
    assert len(decoded) == 3 and all(bytes(r["pixels"]) == rgb for r in decoded)


def test_frame_sample_bad_container_and_validation(spark):
    media = spark.createDataFrame(
        [(1, bytearray(b"not a video"), ("video", "bgsv", 2, 2, 0))],
        "media_id long, content binary, meta struct<media_type:string,format:string,width:int,height:int,duration_ms:long>",
    )
    rows = frame_sample(media, 100).collect()
    assert len(rows) == 1 and rows[0]["error"]
    with pytest.raises(ValueError):
        frame_sample(media, 0)


def test_synthesized_video_samples_deterministically(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(3)
    vids = synthesize_video_media(docs, n_frames=4, frame_ms=250)
    a = sorted(
        (r["media_id"], r["frame_idx"], r["t_ms"])
        for r in frame_sample(vids, 500).collect()
    )
    # every_ms=500 over 4x250ms frames keeps idx 0 and 2 per video
    assert a == sorted(
        (mid, idx, idx * 250)
        for mid in [r["media_id"] for r in vids.select("media_id").collect()]
        for idx in (0, 2)
    )


def test_wav_roundtrip_independent_byte_walk():
    from biggraphite_spark.operators.multimodal import _decode_wav, encode_wav

    pcm = struct.pack("<8h", 0, 1000, -1000, 32767, -32768, 5, -5, 0)
    payload = encode_wav(8000, 1, pcm)
    # independent RIFF walk: fixed offsets for the minimal writer layout
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    assert payload[12:16] == b"fmt " and struct.unpack_from("<I", payload, 16)[0] == 16
    fmt, ch, rate = struct.unpack_from("<HHI", payload, 20)
    assert (fmt, ch, rate) == (1, 1, 8000)
    assert payload[36:40] == b"data"
    assert payload[44:] == pcm
    rate2, ch2, samples = _decode_wav(payload)
    assert (rate2, ch2) == (8000, 1)
    assert samples == [0, 1000, -1000, 32767, -32768, 5, -5, 0]


def test_wav_decode_tolerates_extra_chunks_and_rejects_bad():
    from biggraphite_spark.operators.multimodal import _decode_wav, encode_wav

    pcm = struct.pack("<2h", 7, -7)
    base = encode_wav(4000, 1, pcm)
    # splice a LIST chunk between WAVE and fmt : decoder must skip it
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    spliced = base[:12] + extra + base[12:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    assert _decode_wav(spliced)[2] == [7, -7]
    with pytest.raises(ValueError):
        _decode_wav(b"RIFFxxxxAVI ")
    with pytest.raises(ValueError):
        _decode_wav(b"garbage")


def test_audio_features_match_plain_python_golden(spark):
    import math

    from biggraphite_spark.operators.multimodal import (
        audio_features,
        decode_audio,
        encode_wav,
    )

    samples = [0, 1000, -2000, 3000, -32768, 32767, 0, -1]
    media = spark.createDataFrame(
        [
            (1, bytearray(encode_wav(8000, 1, struct.pack("<8h", *samples))),
             ("audio", "wav", None, None, 1)),
            (2, bytearray(b"garbage"), ("audio", "wav", None, None, None)),
        ],
        "media_id long, content binary, meta struct<media_type:string,format:string,width:int,height:int,duration_ms:long>",
    )
    decoded = decode_audio(media)
    rows = {r["media_id"]: r for r in decoded.collect()}
    assert rows[1]["samples"] == samples and rows[1]["sample_rate"] == 8000
    assert rows[2]["error"] is not None
    feats = {r["media_id"]: r for r in audio_features(decoded).collect()}
    assert list(feats) == [1]  # error rows dropped
    f = feats[1]
    # independent plain-Python golden
    assert f["duration_ms"] == len(samples) * 1000 // 8000
    assert f["peak"] == 32768
    assert f["rms"] == round(math.sqrt(sum(s * s for s in samples) / len(samples)), 4)
    crossings = sum(
        1 for a, b in zip(samples, samples[1:]) if (a >= 0) != (b >= 0)
    )
    assert f["zero_crossings"] == crossings


def test_resize_nearest_neighbor_matches_python_golden(spark):
    from biggraphite_spark.operators.multimodal import (
        decode_image,
        resize_image,
        synthesize_bmp_media,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(4)
    decoded = decode_image(synthesize_bmp_media(docs, width=8, height=8))
    out = {r["media_id"]: r for r in resize_image(decoded, 4, 4).collect()}
    src = {r["media_id"]: r["pixels"] for r in decoded.collect()}
    for mid, pix in src.items():
        golden = []
        for ty in range(4):
            for tx in range(4):
                sy, sx = ty * 8 // 4, tx * 8 // 4
                base = (sy * 8 + sx) * 3
                golden.extend(pix[base : base + 3])
        assert out[mid]["pixels"] == golden
        assert (out[mid]["width"], out[mid]["height"]) == (4, 4)


def test_resize_rejects_bad_dims(spark):
    from biggraphite_spark.operators.multimodal import decode_image, resize_image, synthesize_bmp_media

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(1)
    decoded = decode_image(synthesize_bmp_media(docs))
    with pytest.raises(ValueError):
        resize_image(decoded, 0, 4)


def test_image_ahash_matches_python_golden(spark):
    from biggraphite_spark.operators.multimodal import (
        decode_image,
        image_ahash,
        synthesize_bmp_media,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(6)
    texts = {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()}
    out = {
        r["media_id"]: r["ahash"]
        for r in image_ahash(decode_image(synthesize_bmp_media(docs))).collect()
    }
    assert len(out) == 6
    for mid, text in texts.items():
        seed = text.encode()
        buf = bytearray()
        counter = 0
        while len(buf) < 192:
            buf += hashlib.md5(seed + counter.to_bytes(4, "little")).digest()
            counter += 1
        px = bytes(buf[:192])
        gray = [(px[i * 3] + px[i * 3 + 1] + px[i * 3 + 2]) / 3 for i in range(64)]
        mean = sum(gray) / 64
        h = 0
        for g in gray:
            h = ((h << 1) | (1 if g >= mean else 0)) & 0xFFFFFFFFFFFFFFFF
        if h >= 1 << 63:
            h -= 1 << 64
        assert out[mid] == h
    # identical images hash identically; the population is not constant
    assert len(set(out.values())) > 1
