"""Multimodal columns: opaque binary payloads + typed metadata, processed
through Arrow-batched pandas stages.

Beyond-reference operators.  Images/audio/video are carried as
``binary`` columns with a typed metadata struct; all per-item compute runs
in ``mapInPandas`` (one Arrow batch per call, vectorized across the batch).
``decode_image`` really decodes (pure-Python 24bpp BMP + P6 PPM codecs —
formats simple enough to need no external library); ``frame_sample`` really
demuxes a deterministic length-prefixed frame container (BGSV).  Compressed
formats (JPEG/PNG, mp4) would slot into the same per-format dispatch with a
library import; the Spark-side shape — schema, batch iteration, error rows,
partition sizing — is identical and fully tested here.

Scale notes: binary payloads dominate row size — keep
``spark.sql.files.maxPartitionBytes`` at the default 128 MB so a scan task
holds a few hundred images, and never collect() a media column.  The
mapInPandas stages are pure per-row transforms: no shuffle at all.
"""

from __future__ import annotations

import hashlib
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: typed metadata carried next to every payload
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image/audio/video
        T.StructField("format", T.StringType()),  # jpeg/wav/mp4/...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType()),
        T.StructField("meta", MEDIA_META_SCHEMA),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("crc32", T.LongType()),
        T.StructField("entropy_proxy", T.DoubleType()),
        T.StructField("head_hash", T.StringType()),
    ]
)


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Deterministic fake media table from the documents corpus: the UTF-8
    bytes of each text stand in for an encoded payload (stable, no external
    libs), with metadata derived from doc fields."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("content"),
        F.struct(
            F.lit("image").alias("media_type"),
            F.lit("fake-jpeg").alias("format"),
            (F.col("n_chars") % 640 + 1).cast("int").alias("width"),
            (F.col("n_chars") % 480 + 1).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched byte-level featurization — the working mapInPandas stage.

    Deterministic per payload: size, crc32, a distinct-byte entropy proxy,
    and an md5 of the first 64 bytes.  A real image featurizer replaces the
    body; the batch shape, schema and partition behaviour stay identical.
    """

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": content.map(len).astype("int64"),
                    "crc32": content.map(lambda b: zlib.crc32(b) & 0xFFFFFFFF).astype("int64"),
                    "entropy_proxy": content.map(
                        lambda b: len(set(b)) / 256.0 if len(b) else 0.0
                    ),
                    "head_hash": content.map(
                        lambda b: hashlib.md5(bytes(b[:64])).hexdigest()
                    ),
                }
            )

    return media.mapInPandas(featurize, FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# Pure-Python codecs: 24-bit uncompressed BMP + binary PPM (P6).
#
# These two formats are fully specified by public documentation and simple
# enough to decode with the stdlib, which makes ``decode_image`` a REAL
# operator in this container (no imaging library needed).  Compressed formats
# (JPEG/PNG) would slot into the same dispatch with a library import — the
# Spark-side shape does not change.
# ---------------------------------------------------------------------------

import struct


def encode_bmp(width: int, height: int, rgb: bytes) -> bytes:
    """Minimal 24bpp bottom-up BMP writer (BITMAPINFOHEADER).  ``rgb`` is
    row-major top-down R,G,B triplets — exactly what :func:`_decode_bmp`
    returns — so encode->decode round-trips bit-exactly."""
    if len(rgb) != width * height * 3:
        raise ValueError("rgb length != width*height*3")
    pad = (-(width * 3)) % 4
    rows = []
    for y in range(height - 1, -1, -1):  # bottom-up storage
        row = bytearray()
        for x in range(width):
            i = (y * width + x) * 3
            row += bytes((rgb[i + 2], rgb[i + 1], rgb[i]))  # BGR on disk
        rows.append(bytes(row) + b"\x00" * pad)
    pixel_data = b"".join(rows)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixel_data), 2835, 2835, 0, 0
    )
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(pixel_data), 0, 0, 14 + 40)
    return header + info + pixel_data


def _decode_bmp(payload: bytes) -> tuple[int, int, bytes]:
    """(width, height, top-down RGB bytes) from a 24bpp uncompressed BMP."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (offset,) = struct.unpack_from("<I", payload, 10)
    hdr_size, width, height = struct.unpack_from("<Iii", payload, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP variant (bpp={bpp}, compression={compression})")
    bottom_up = height > 0
    height = abs(height)
    pad = (-(width * 3)) % 4
    stride = width * 3 + pad
    out = bytearray(width * height * 3)
    for row in range(height):
        y = (height - 1 - row) if bottom_up else row
        src = offset + row * stride
        for x in range(width):
            b, g, r = payload[src + x * 3 : src + x * 3 + 3]
            dst = (y * width + x) * 3
            out[dst], out[dst + 1], out[dst + 2] = r, g, b
    return width, height, bytes(out)


def _decode_ppm(payload: bytes) -> tuple[int, int, bytes]:
    """(width, height, RGB bytes) from a binary PPM (P6, maxval 255)."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # header: P6, whitespace-separated width/height/maxval, comments allowed
    fields: list[int] = []
    i = 2
    while len(fields) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        fields.append(int(payload[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    width, height, maxval = fields
    if maxval != 255:
        raise ValueError("only maxval=255 PPM supported")
    rgb = payload[i : i + width * height * 3]
    if len(rgb) != width * height * 3:
        raise ValueError("truncated PPM payload")
    return width, height, rgb


_IMAGE_DECODERS = {"bmp": _decode_bmp, "ppm": _decode_ppm}

DECODE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("pixels", T.ArrayType(T.IntegerType())),  # top-down RGB triplets
        T.StructField("error", T.StringType()),
    ]
)


def decode_image(media: DataFrame) -> DataFrame:
    """Decode BMP/PPM payloads to pixel arrays in an Arrow-batched stage.

    Input MEDIA_SCHEMA rows; output one row per item: (media_id, width,
    height, pixels as row-major top-down RGB ints, error).  Undecodable
    payloads (unknown format, corrupt bytes) yield an error row instead of
    failing the stage — at 100 TB a sweep must survive bad items.  Pure
    per-row transform: no shuffle, binary never leaves the executor.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content, fmt in zip(
                pdf["media_id"], pdf["content"], pdf["meta"].map(lambda m: m["format"])
            ):
                decoder = _IMAGE_DECODERS.get(str(fmt).lower())
                if decoder is None:
                    rows.append((mid, None, None, None, f"unsupported format: {fmt}"))
                    continue
                try:
                    w, h, rgb = decoder(bytes(content))
                    rows.append((mid, w, h, list(rgb), None))
                except (ValueError, IndexError, struct.error) as e:
                    rows.append((mid, None, None, None, str(e)))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "pixels", "error"]
            )

    return media.mapInPandas(decode, DECODE_SCHEMA)


def synthesize_bmp_media(docs: DataFrame, width: int = 8, height: int = 8) -> DataFrame:
    """Deterministic real-BMP media table from the documents corpus: each
    doc's md5 stream seeds the pixel bytes, encoded through
    :func:`encode_bmp` — so ``decode_image`` exercises the full
    encode->decode path on driver-provided data with zero external deps."""
    n = width * height * 3

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                seed = str(text).encode()
                buf = bytearray()
                counter = 0
                while len(buf) < n:
                    buf += hashlib.md5(seed + counter.to_bytes(4, "little")).digest()
                    counter += 1
                rows.append((doc_id, encode_bmp(width, height, bytes(buf[:n]))))
            yield pd.DataFrame(rows, columns=["media_id", "content"])

    payloads = docs.select("doc_id", "text").mapInPandas(
        build, "media_id long, content binary"
    )
    return payloads.select(
        "media_id",
        "content",
        F.struct(
            F.lit("image").alias("media_type"),
            F.lit("bmp").alias("format"),
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


# ---------------------------------------------------------------------------
# Video: a deterministic length-prefixed frame container ("BGSV").
#
# Real containers (mp4/mkv) need codec libraries; the container below is the
# same *shape* — header + per-frame (duration, payload) records — so the
# sampling operator's plumbing (parse on executor, explode to one row per
# sampled frame) is the production shape, with the demux swapped out.
# ---------------------------------------------------------------------------

VIDEO_MAGIC = b"BGSV"


def encode_video(frames: list[tuple[int, bytes]]) -> bytes:
    """Pack (duration_ms, payload) frames: magic, frame count, then
    length-prefixed records."""
    out = [VIDEO_MAGIC, struct.pack("<I", len(frames))]
    for dur_ms, payload in frames:
        out.append(struct.pack("<II", dur_ms, len(payload)))
        out.append(payload)
    return b"".join(out)


def _demux_video(payload: bytes) -> list[tuple[int, int, bytes]]:
    """[(frame_idx, start_ms, frame_payload)] from a BGSV container."""
    if payload[:4] != VIDEO_MAGIC:
        raise ValueError("not a BGSV container")
    (n,) = struct.unpack_from("<I", payload, 4)
    frames = []
    pos, t = 8, 0
    for idx in range(n):
        dur_ms, size = struct.unpack_from("<II", payload, pos)
        pos += 8
        frames.append((idx, t, payload[pos : pos + size]))
        if len(frames[-1][2]) != size:
            raise ValueError("truncated frame")
        pos += size
        t += dur_ms
    return frames


def synthesize_video_media(
    docs: DataFrame,
    n_frames: int = 4,
    frame_ms: int = 250,
    width: int = 4,
    height: int = 4,
) -> DataFrame:
    """Deterministic BGSV video table: each doc becomes ``n_frames`` BMP
    frames (md5-seeded like :func:`synthesize_bmp_media`, frame index mixed
    into the seed) at a fixed per-frame duration."""
    n = width * height * 3

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                frames = []
                for f in range(n_frames):
                    seed = str(text).encode() + b"|frame|" + f.to_bytes(4, "little")
                    buf = bytearray()
                    counter = 0
                    while len(buf) < n:
                        buf += hashlib.md5(seed + counter.to_bytes(4, "little")).digest()
                        counter += 1
                    frames.append((frame_ms, encode_bmp(width, height, bytes(buf[:n]))))
                rows.append((doc_id, encode_video(frames)))
            yield pd.DataFrame(rows, columns=["media_id", "content"])

    payloads = docs.select("doc_id", "text").mapInPandas(
        build, "media_id long, content binary"
    )
    return payloads.select(
        "media_id",
        "content",
        F.struct(
            F.lit("video").alias("media_type"),
            F.lit("bgsv").alias("format"),
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.lit(n_frames * frame_ms).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


# ---------------------------------------------------------------------------
# Audio: PCM16 WAV (RIFF/WAVE), fully specified and stdlib-decodable —
# ``decode_audio`` is a REAL operator like ``decode_image``.  Compressed
# codecs (mp3/opus) would slot into the same dispatch with a library import.
# ---------------------------------------------------------------------------


def encode_wav(sample_rate: int, channels: int, pcm16: bytes) -> bytes:
    """Minimal PCM16 WAV writer (RIFF + fmt + data); round-trips bit-exactly
    through :func:`_decode_wav`."""
    if len(pcm16) % (2 * channels):
        raise ValueError("pcm16 length not a whole number of frames")
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate, channels * 2, 16)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(pcm16)) + pcm16
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def _decode_wav(payload: bytes) -> tuple[int, int, list[int]]:
    """(sample_rate, channels, interleaved int16 samples) from a PCM16 WAV.
    Walks the chunk list, so extra chunks (LIST/INFO) before data are fine."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, sample_rate, channels, bits, data = 12, None, None, None, None
    while pos + 8 <= len(payload):
        cid, size = payload[pos : pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, channels, sample_rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if audio_fmt != 1 or bits != 16:
                raise ValueError(f"unsupported WAV variant (fmt={audio_fmt}, bits={bits})")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if sample_rate is None or data is None:
        raise ValueError("missing fmt or data chunk")
    if len(data) % 2:
        raise ValueError("odd data chunk length")
    return sample_rate, channels, list(struct.unpack(f"<{len(data) // 2}h", data))


AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("samples", T.ArrayType(T.IntegerType())),  # interleaved int16
        T.StructField("error", T.StringType()),
    ]
)


def decode_audio(media: DataFrame) -> DataFrame:
    """Decode PCM16 WAV payloads to sample arrays in an Arrow-batched stage;
    bad payloads yield error rows, mirroring :func:`decode_image`.  Feature
    math (RMS, zero crossings, duration) belongs DOWNSTREAM in built-in
    higher-order functions — only the byte-format parse needs Python."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                try:
                    rate, ch, samples = _decode_wav(bytes(content))
                    rows.append((mid, rate, ch, samples, None))
                except (ValueError, IndexError, struct.error) as e:
                    rows.append((mid, None, None, None, str(e)))
            yield pd.DataFrame(
                rows, columns=["media_id", "sample_rate", "channels", "samples", "error"]
            )

    return media.mapInPandas(decode, AUDIO_SCHEMA)


def audio_features(decoded: DataFrame) -> DataFrame:
    """Per-item audio features over :func:`decode_audio` output — entirely
    JVM-side higher-order functions (no Python): duration from the frame
    count, RMS via an aggregate fold, peak amplitude, and zero-crossing
    count via zip_with of the sample array against its own tail."""
    n = F.size("samples")
    frames = n / F.col("channels")
    sum_sq = F.aggregate(
        "samples", F.lit(0.0), lambda a, x: a + x.cast("double") * x.cast("double")
    )
    crossings = F.aggregate(
        F.zip_with(
            F.slice("samples", F.lit(1), F.greatest(n - 1, F.lit(0))),
            F.slice("samples", F.lit(2), F.greatest(n - 1, F.lit(0))),
            lambda a, b: F.when((a >= 0) != (b >= 0), 1).otherwise(0),
        ),
        F.lit(0),
        lambda a, x: a + x,
    )
    return decoded.filter(F.col("error").isNull()).select(
        "media_id",
        "sample_rate",
        "channels",
        (frames * 1000.0 / F.col("sample_rate")).cast("long").alias("duration_ms"),
        F.round(F.sqrt(sum_sq / n), 4).alias("rms"),
        F.aggregate("samples", F.lit(0), lambda a, x: F.greatest(a, F.abs(x))).alias("peak"),
        crossings.alias("zero_crossings"),
    )


def synthesize_wav_media(
    docs: DataFrame, n_samples: int = 256, sample_rate: int = 8000
) -> DataFrame:
    """Deterministic mono PCM16 WAV table from the documents corpus (md5
    stream seeds the sample bytes, same scheme as :func:`synthesize_bmp_media`)."""
    n_bytes = n_samples * 2

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                seed = str(text).encode() + b"|wav"
                buf = bytearray()
                counter = 0
                while len(buf) < n_bytes:
                    buf += hashlib.md5(seed + counter.to_bytes(4, "little")).digest()
                    counter += 1
                rows.append((doc_id, encode_wav(sample_rate, 1, bytes(buf[:n_bytes]))))
            yield pd.DataFrame(rows, columns=["media_id", "content"])

    payloads = docs.select("doc_id", "text").mapInPandas(
        build, "media_id long, content binary"
    )
    return payloads.select(
        "media_id",
        "content",
        F.struct(
            F.lit("audio").alias("media_type"),
            F.lit("wav").alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(n_samples * 1000 // sample_rate).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def resize_image(decoded: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize over :func:`decode_image` output — a pure
    JVM-side projection (transform over a generated index sequence), no
    Python stage: each target pixel reads floor(y*h/out_h), floor(x*w/out_w)
    from the flat RGB array.  The expression shape a real image pipeline
    would hand to a library is the same; here the resample itself is simple
    enough to stay in Catalyst."""
    if out_w <= 0 or out_h <= 0:
        raise ValueError("output dimensions must be positive")
    # bind to the INPUT dataframe: the output select aliases lit(out_w) as
    # "width", and Spark's lateral column alias resolution would otherwise
    # rebind F.col("width") inside the transform to that literal
    w, h = decoded["width"], decoded["height"]

    def src_index(i):
        # i indexes the flat target array; recover (y, x, channel)
        c = i % 3
        px = (i / 3).cast("long")
        ty, tx = (px / out_w).cast("long"), px % out_w
        sy = (ty * h / F.lit(out_h)).cast("long")
        sx = (tx * w / F.lit(out_w)).cast("long")
        return (sy * w + sx) * 3 + c + 1  # element_at is 1-based

    pixels = F.transform(
        F.sequence(F.lit(0), F.lit(out_w * out_h * 3 - 1)),
        lambda i: F.element_at(decoded["pixels"], src_index(i).cast("int")),
    )
    return decoded.filter(F.col("error").isNull()).select(
        "media_id",
        F.lit(out_w).alias("width"),
        F.lit(out_h).alias("height"),
        pixels.alias("pixels"),
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("t_ms", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("error", T.StringType()),
    ]
)


def frame_sample(media: DataFrame, every_ms: int) -> DataFrame:
    """Sample one frame per ``every_ms`` window from BGSV video payloads.

    One output row per kept frame (the first frame at-or-after each sample
    point), carrying the frame payload so :func:`decode_image` can run
    directly on the result.  Bad containers yield an error row.  The fan-out
    happens executor-side inside mapInPandas — the container is parsed once
    per item and never shipped to the driver.
    """
    if every_ms <= 0:
        raise ValueError("every_ms must be positive")

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                try:
                    frames = _demux_video(bytes(content))
                except (ValueError, IndexError, struct.error) as e:
                    rows.append((mid, None, None, None, str(e)))
                    continue
                next_sample = 0
                for idx, t, payload in frames:
                    if t >= next_sample:
                        rows.append((mid, idx, t, payload, None))
                        next_sample = t - (t % every_ms) + every_ms
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "t_ms", "content", "error"]
            )

    return media.mapInPandas(sample, FRAME_SCHEMA)


def image_ahash(decoded: DataFrame) -> DataFrame:
    """Average-hash (aHash) perceptual fingerprint over :func:`decode_image`
    output — the classic near-duplicate image signal: grayscale each pixel
    (integer mean of R,G,B), threshold against the image's mean gray level,
    pack the resulting bits row-major into a 64-bit integer.  Hamming
    distance between hashes approximates visual similarity, so downstream
    dedup reuses the SimHash band-join machinery unchanged.

    Entirely JVM higher-order functions over the pixel array (no Python
    stage): one transform to gray, one aggregate for the mean, one fold to
    pack bits.  Per-row projection — no shuffle, scan-speed at any corpus
    size.  Images larger than 8x8 would be resized first
    (:func:`resize_image`); the bit budget caps at 64 pixels.
    """
    n_px = F.col("width") * F.col("height")
    gray = F.transform(
        F.sequence(F.lit(0), n_px - 1),
        lambda i: (
            F.element_at(F.col("pixels"), (i * 3 + 1).cast("int"))
            + F.element_at(F.col("pixels"), (i * 3 + 2).cast("int"))
            + F.element_at(F.col("pixels"), (i * 3 + 3).cast("int"))
        ).cast("long")
        / F.lit(3),
    )
    mean = F.aggregate(gray, F.lit(0.0), lambda a, x: a + x) / n_px
    # bind gray + mean once via a struct so the packing fold reads them as
    # lambda variables (bind_col pattern: no per-bit re-evaluation)
    packed = F.element_at(
        F.transform(
            F.array(F.struct(gray.alias("g"), mean.alias("m"))),
            lambda s: F.aggregate(
                F.sequence(F.lit(0), F.size(s["g"]) - 1),
                F.lit(0).cast("long"),
                # shiftleft/bitwiseOR, not acc*2+b: packing the 64th bit
                # overflows signed-long arithmetic under ANSI mode, while
                # the bit ops wrap into two's complement as intended
                lambda acc, i: F.shiftleft(acc, 1).bitwiseOR(
                    F.when(
                        F.element_at(s["g"], (i + 1).cast("int")) >= s["m"], 1
                    )
                    .otherwise(0)
                    .cast("long")
                ),
            ),
        ),
        1,
    )
    return decoded.filter(F.col("error").isNull()).select(
        "media_id",
        "width",
        "height",
        packed.alias("ahash"),
    )


def ahash_near_dups(
    hashed: DataFrame, bands: int = 4, max_hamming: int = 6
) -> DataFrame:
    """Near-duplicate image pairs over :func:`image_ahash` output — the
    Manku et al. 2007 band-blocking applied to the 64-bit perceptual hash:
    split each hash into ``bands`` equal bit-slices, candidates share at
    least one exact slice, verify with ``bit_count(xor)``.

    Pigeonhole guarantee: every pair within ``bands - 1`` flipped bits
    shares an untouched slice, so recall is exact below that distance;
    larger ``max_hamming`` values keep the same candidate set and verify
    more loosely (document the recall change when tuning).

    Scale shape: the corpus explodes to ``bands`` rows per image and
    self-joins on (band, slice) — the SimHash near-pair plan reused
    verbatim, bucket-local at scale when the table is written
    ``partitionBy(band, key)``.
    """
    if 64 % bands:
        raise ValueError("bands must divide 64")
    width = 64 // bands
    mask = (1 << width) - 1
    b = hashed.select(
        "media_id",
        "ahash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned("ahash", i * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("key"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("media_id", "ahash", "bk.band", "bk.key")
    x, y = b.alias("x"), b.alias("y")
    pairs = (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.key") == F.col("y.key"))
            & (F.col("x.media_id") < F.col("y.media_id")),
        )
        .select(
            F.col("x.media_id").alias("id_a"),
            F.col("y.media_id").alias("id_b"),
            F.bit_count(
                F.col("x.ahash").bitwiseXOR(F.col("y.ahash"))
            ).alias("hamming"),
        )
        .distinct()
    )
    return pairs.filter(F.col("hamming") <= max_hamming)
