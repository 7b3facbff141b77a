"""Independent oracle for the multimodal featurizer (mm_features).

DuckDB cannot express crc32 over blobs, so the driver's SQL gate records
mm_features rows-only.  This golden closes that gap: a from-scratch
plain-Python implementation (pyarrow read, binascii/hashlib — no Spark, no
shared code with operators/multimodal.py) recomputes every feature over the
same parquet and the full result sets must match row for row.
"""

import binascii
import hashlib

import pyarrow.parquet as pq

SF_DIR = "/root/testdata/sf0.001"


def _python_features(path: str) -> dict[int, tuple]:
    """Reference features straight from the parquet: the synthesize_media
    contract is 'payload = UTF-8 bytes of text', so the independent
    implementation starts from the raw text column."""
    table = pq.read_table(path, columns=["doc_id", "text"])
    out = {}
    for doc_id, text in zip(
        table.column("doc_id").to_pylist(), table.column("text").to_pylist()
    ):
        payload = text.encode("utf-8")
        out[doc_id] = (
            len(payload),
            binascii.crc32(payload) & 0xFFFFFFFF,
            (len(set(payload)) / 256.0) if payload else 0.0,
            hashlib.md5(payload[:64]).hexdigest(),
        )
    return out


def test_mm_features_matches_independent_python(spark):
    from biggraphite_spark.operators.multimodal import (
        extract_features,
        synthesize_media,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    feats = extract_features(synthesize_media(docs)).collect()
    want = _python_features(f"{SF_DIR}/documents.parquet")
    assert len(feats) == len(want)  # every doc produced exactly one row
    for r in feats:
        n_bytes, crc, entropy, head = want[r["media_id"]]
        assert r["n_bytes"] == n_bytes
        assert r["crc32"] == crc
        assert r["entropy_proxy"] == entropy  # exact: same float arithmetic
        assert r["head_hash"] == head


def test_twin_cache_keys_on_resolved_sf_dir(monkeypatch):
    # the sf_dir=None default must resolve BEFORE the memo boundary: an env
    # change mid-process serves SQL for the new scale factor, not stale SQL
    import oracle_twins as OT

    explicit = OT.mm_features_sql("/root/testdata/sf0.001")
    monkeypatch.setenv("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.001")
    assert OT.mm_features_sql() == explicit
    monkeypatch.setenv("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    assert OT.mm_features_sql() != explicit
