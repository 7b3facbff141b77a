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
