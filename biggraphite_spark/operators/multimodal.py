"""Multimodal columns: opaque binary payloads + typed metadata, processed
through Arrow-batched pandas stages.

Beyond-reference operators.  Images/audio/video are carried as
``binary`` columns with a typed metadata struct; all per-item compute runs
in ``mapInPandas`` (one Arrow batch per call, vectorized across the batch).
The actual codec work (JPEG decode, resampling, frame extraction) needs
libraries this container doesn't ship, so those steps are STUBBED behind
``NotImplementedError`` with the Spark-side plumbing — schema, batch
iteration, partition sizing — real and tested; ``extract_features`` runs a
deterministic byte-level featurizer end-to-end as the working example.

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


def decode_image(media: DataFrame) -> DataFrame:
    """STUB: real pixel decode needs an imaging library not present in this
    container.  The contract when implemented: input MEDIA_SCHEMA rows,
    output (media_id, pixels array<int>, width, height) via a mapInPandas
    stage exactly shaped like :func:`extract_features`."""
    raise NotImplementedError(
        "image decode requires an imaging library (e.g. PIL) not shipped in "
        "this environment; plumbing contract documented here and exercised "
        "via extract_features"
    )


def frame_sample(media: DataFrame, every_ms: int) -> DataFrame:
    """STUB: video frame sampling — same contract as decode_image, one
    output row per sampled frame ((media_id, frame_idx, content))."""
    raise NotImplementedError(
        "video frame sampling requires a codec library not shipped in this "
        "environment"
    )
