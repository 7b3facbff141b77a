"""Plain-Python oracle twins for the non-SQL-expressible contract queries.

The DuckDB oracle genuinely cannot express the BPE trainer (iterative) or
the multimodal codec pipelines (binary payloads through mapInPandas), so
those queries used to be driver-checked rows-only.  This module upgrades
them to full value checks: each ``*_sql`` function recomputes the expected
result with an INDEPENDENT plain-Python implementation — pyarrow + stdlib
only, no Spark, no ``biggraphite_spark`` imports — and returns it as a
literal ``SELECT ... FROM (VALUES ...)`` statement the driver's DuckDB
oracle can execute verbatim.

The twins mirror the pytest goldens (tests/test_bpe.py,
tests/test_multimodal_codecs.py): the BPE trainer is the textbook Sennrich
reference; the media twins pin the synthesize->encode->decode round-trip to
the md5-seed-stream definition, so any non-round-tripping codec bug changes
the pixels/samples and the hashes diverge.

Results are cached per sf_dir — the driver calls ``oracle_sql()`` once, but
local tooling (scripts/oracle_check.py, pytest) may call repeatedly.
"""

from __future__ import annotations

import functools
import hashlib
import math
import os
import struct
import zlib
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

EOW = "</w>"


def _sf_dir() -> str:
    # must match scripts/oracle_check.py's resolution; the round driver
    # compares at sf0.01, which is the default
    return os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


def _twin_cache(fn):
    """Per-sf_dir memoization that resolves the ``sf_dir=None`` default
    BEFORE the cache boundary: a bare ``lru_cache`` on ``fn(sf_dir=None)``
    would key on ``None`` and keep serving SQL computed against whatever
    ``$SPARK_GRAFT_ORACLE_SF_DIR`` was at first call — an env change
    mid-process would silently compare against the wrong scale factor."""
    cached = functools.lru_cache(maxsize=4)(fn)

    @functools.wraps(fn)
    def wrapper(sf_dir: str | None = None) -> str:
        return cached(sf_dir or _sf_dir())

    return wrapper


@functools.lru_cache(maxsize=4)
def _docs(sf_dir: str) -> tuple[tuple[int, str], ...]:
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return tuple(zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()))


@functools.lru_cache(maxsize=4)
def _embs(sf_dir: str) -> tuple[tuple[int, tuple[float, ...]], ...]:
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return tuple(
        zip(t.column("vec_id").to_pylist(),
            (tuple(v) for v in t.column("embedding").to_pylist()))
    )


def _md5_stream(seed: bytes, n: int) -> bytes:
    buf = bytearray()
    counter = 0
    while len(buf) < n:
        buf += hashlib.md5(seed + counter.to_bytes(4, "little")).digest()
        counter += 1
    return bytes(buf[:n])


def _round_half_up(x: float, scale: int) -> float:
    # Spark's F.round on doubles = BigDecimal(shortest-repr).setScale(HALF_UP)
    q = Decimal(1).scaleb(-scale)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


def _sql_lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, float):
        return repr(v)
    return str(v)


def _values_sql(rows: list[tuple], cols: list[tuple[str, str]]) -> str:
    """SELECT with per-column casts over a literal VALUES list.

    cols: [(name, duckdb_type)].  An empty rowset still needs a typed
    zero-row relation, so it becomes a WHERE FALSE over a single NULL row.
    """
    sel = ", ".join(f"CAST(c{i} AS {t}) AS {n}" for i, (n, t) in enumerate(cols))
    names = ", ".join(f"c{i}" for i in range(len(cols)))
    if not rows:
        nulls = ", ".join(["NULL"] * len(cols))
        return f"SELECT {sel} FROM (VALUES ({nulls})) t({names}) WHERE FALSE"
    body = ",\n".join("(" + ", ".join(_sql_lit(v) for v in r) + ")" for r in rows)
    return f"SELECT {sel} FROM (VALUES\n{body}\n) t({names})"


# ---------------------------------------------------------------------------
# Multimodal twins.  Constants mirror the contract queries in
# __spark_entry__.py (8x8 BMP, 4x4 resize, 4x250ms BGSV frames sampled every
# 500ms, 256-sample 8kHz mono WAV).
# ---------------------------------------------------------------------------


@_twin_cache
def mm_features_sql(sf_dir: str | None = None) -> str:
    rows = []
    for doc_id, text in _docs(sf_dir or _sf_dir()):
        b = text.encode("utf-8")
        rows.append(
            (
                doc_id,
                len(b),
                zlib.crc32(b) & 0xFFFFFFFF,
                len(set(b)) / 256.0 if b else 0.0,
                hashlib.md5(b[:64]).hexdigest(),
            )
        )
    return _values_sql(
        rows,
        [
            ("media_id", "BIGINT"),
            ("n_bytes", "BIGINT"),
            ("crc32", "BIGINT"),
            ("entropy_proxy", "DOUBLE"),
            ("head_hash", "VARCHAR"),
        ],
    )


_MM_DECODE_COLS = [
    ("media_id", "BIGINT"),
    ("width", "INTEGER"),
    ("height", "INTEGER"),
    ("n_px", "INTEGER"),
    ("px_sum", "BIGINT"),
    ("error", "VARCHAR"),
]


@_twin_cache
def mm_decode_sql(sf_dir: str | None = None) -> str:
    rows = []
    for doc_id, text in _docs(sf_dir or _sf_dir()):
        px = _md5_stream(text.encode(), 8 * 8 * 3)
        rows.append((doc_id, 8, 8, len(px), sum(px), None))
    return _values_sql(rows, _MM_DECODE_COLS)


@_twin_cache
def mm_resize_sql(sf_dir: str | None = None) -> str:
    rows = []
    for doc_id, text in _docs(sf_dir or _sf_dir()):
        px = _md5_stream(text.encode(), 8 * 8 * 3)
        out = []
        for ty in range(4):
            for tx in range(4):
                base = ((ty * 8 // 4) * 8 + (tx * 8 // 4)) * 3
                out.extend(px[base : base + 3])
        rows.append((doc_id, 4, 4, len(out), sum(out)))
    return _values_sql(rows, _MM_DECODE_COLS[:-1])


@_twin_cache
def mm_frames_sql(sf_dir: str | None = None) -> str:
    # 4 frames at 250ms sampled every 500ms keeps frame_idx 0 and 2; the
    # contract query re-keys rows as media_id*1000 + frame_idx before decode
    rows = []
    for doc_id, text in _docs(sf_dir or _sf_dir()):
        for idx in (0, 2):
            seed = text.encode() + b"|frame|" + idx.to_bytes(4, "little")
            px = _md5_stream(seed, 4 * 4 * 3)
            rows.append((doc_id * 1000 + idx, 4, 4, len(px), sum(px), None))
    return _values_sql(rows, _MM_DECODE_COLS)


@_twin_cache
def mm_audio_sql(sf_dir: str | None = None) -> str:
    rows = []
    for doc_id, text in _docs(sf_dir or _sf_dir()):
        raw = _md5_stream(text.encode() + b"|wav", 256 * 2)
        samples = struct.unpack("<256h", raw)
        rms = _round_half_up(math.sqrt(sum(s * s for s in samples) / 256), 4)
        crossings = sum(
            1 for a, b in zip(samples, samples[1:]) if (a >= 0) != (b >= 0)
        )
        rows.append(
            (
                doc_id,
                8000,
                1,
                256 * 1000 // 8000,
                rms,
                max((abs(s) for s in samples), default=0),
                crossings,
            )
        )
    return _values_sql(
        rows,
        [
            ("media_id", "BIGINT"),
            ("sample_rate", "INTEGER"),
            ("channels", "INTEGER"),
            ("duration_ms", "BIGINT"),
            ("rms", "DOUBLE"),
            ("peak", "INTEGER"),
            ("zero_crossings", "INTEGER"),
        ],
    )


# ---------------------------------------------------------------------------
# PCA twin: independent numpy replay of the exact-arithmetic PCA contract
# (operators/pca.py).  The sufficient statistics are int64 — any
# accumulation order yields the identical matrix, so a single-pass numpy
# matmul here equals Spark's per-partition partials bit for bit; both
# sides then run the same d×d eigensolve on the same exact inputs.
# ---------------------------------------------------------------------------

_PCA_QUANT = 1_000_000
_PCA_K = 2


@functools.lru_cache(maxsize=4)
def _pca_fit_twin(sf_dir: str):
    """(items, Q, comps, offsets, eigs) — the numpy replay of pca_fit."""
    import numpy as np

    items = _embs(sf_dir)
    Q = np.array(
        [[math.floor(float(x) * float(_PCA_QUANT)) for x in vec]
         for _, vec in items],
        dtype=np.int64,
    )
    n = len(Q)
    S = (Q.T @ Q).astype(np.float64)
    s = Q.sum(axis=0).astype(np.float64)
    cov = (S - np.outer(s, s) / n) / n
    evals, evecs = np.linalg.eigh(cov)
    d = Q.shape[1]
    mean = s / n
    comps = []
    offsets = []
    eigs = []
    for r in range(1, _PCA_K + 1):
        c = evecs[:, -r]
        pivot = int(np.argmax(np.abs(c)))
        if c[pivot] < 0:
            c = -c
        comps.append([float(x) for x in c])
        acc = 0.0
        for i in range(d):
            acc = acc + float(mean[i]) * float(c[i])
        offsets.append(acc / _PCA_QUANT)
        eigs.append(float(evals[-r]) / (_PCA_QUANT * _PCA_QUANT))
    return items, Q, comps, offsets, eigs


def _pca_scores(q, comps, offsets):
    """Left-to-right fold per component, same order as the Spark plan."""
    d = len(q)
    scores = []
    for c, off in zip(comps, offsets):
        acc = 0.0
        for i in range(d):
            acc = acc + float(int(q[i]) * c[i])
        scores.append(acc / _PCA_QUANT - off)
    return scores


@_twin_cache
def emb_pca_sql(sf_dir: str | None = None) -> str:
    items, Q, comps, offsets, _eigs = _pca_fit_twin(sf_dir or _sf_dir())
    rows = []
    for (vid, _), q in zip(items, Q):
        scores = _pca_scores(q, comps, offsets)
        rows.append(
            (vid, *(_round_half_up(x + 1.23e-9, 6) for x in scores))
        )
    return _values_sql(
        rows,
        [("vec_id", "BIGINT")]
        + [(f"pc{j}", "DOUBLE") for j in range(1, _PCA_K + 1)],
    )


@_twin_cache
def emb_whiten_sql(sf_dir: str | None = None) -> str:
    import numpy as np

    items, Q, comps, offsets, eigs = _pca_fit_twin(sf_dir or _sf_dir())
    scales = [1.0 / float(np.sqrt(ev + 1e-12)) for ev in eigs]
    rows = []
    for (vid, _), q in zip(items, Q):
        scores = _pca_scores(q, comps, offsets)
        rows.append(
            (
                vid,
                *(
                    _round_half_up(x * sc + 1.23e-9, 6)
                    for x, sc in zip(scores, scales)
                ),
            )
        )
    return _values_sql(
        rows,
        [("vec_id", "BIGINT")]
        + [(f"w{j}", "DOUBLE") for j in range(1, _PCA_K + 1)],
    )


# ---------------------------------------------------------------------------
# BPE twins: the textbook Sennrich trainer (same as tests/test_bpe.py) —
# whitespace words, </w> marker, greedy left-to-right in-word merge,
# (count DESC, pair ASC) tie-break.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=4)
def _python_bpe(sf_dir: str, n_merges: int = 10):
    freqs: Counter = Counter()
    for _doc_id, text in _docs(sf_dir):
        for w in text.split(" "):
            if w:
                freqs[w] += 1
    words = {w: tuple(list(w) + [EOW]) for w in freqs}
    for _rank in range(n_merges):
        pair_counts: Counter = Counter()
        for w, syms in words.items():
            f = freqs[w]
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] += f
        if not pair_counts:
            break
        (left, right), n = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < 2:
            break
        new_words = {}
        for w, syms in words.items():
            out: list[str] = []
            for s in syms:
                if out and out[-1] == left and s == right:
                    out[-1] = left + right
                else:
                    out.append(s)
            new_words[w] = tuple(out)
        words = new_words
    return freqs, words


@_twin_cache
def bpe_vocab_sql(sf_dir: str | None = None) -> str:
    sf = sf_dir or _sf_dir()
    freqs, words = _python_bpe(sf)
    vocab: Counter = Counter()
    for w, syms in words.items():
        for s in syms:
            vocab[s] += freqs[w]
    rows = sorted(vocab.items())
    return _values_sql(rows, [("symbol", "VARCHAR"), ("n", "BIGINT")])


@_twin_cache
def bpe_tokens_sql(sf_dir: str | None = None) -> str:
    sf = sf_dir or _sf_dir()
    _freqs, words = _python_bpe(sf)
    rows = []
    for doc_id, text in _docs(sf):
        ws = [w for w in text.split(" ") if w]
        if not ws:
            continue  # no words -> no join rows -> doc absent from the agg
        n_tokens = sum(len(words[w]) for w in ws)
        rows.append(
            (
                doc_id,
                len(ws),
                n_tokens,
                _round_half_up(n_tokens / len(ws), 6),
            )
        )
    return _values_sql(
        rows,
        [
            ("doc_id", "BIGINT"),
            ("n_words", "BIGINT"),
            ("n_tokens", "BIGINT"),
            ("tokens_per_word", "DOUBLE"),
        ],
    )


def _ahash(text: str) -> int:
    # mirrors image_ahash: integer-sum/3 grayscale, left-fold mean, MSB-first
    # bit packing into a SIGNED long (two's complement) — same fold order as
    # Spark's aggregate(), so the float comparisons are bit-identical
    px = _md5_stream(text.encode(), 8 * 8 * 3)
    gray = [(px[i * 3] + px[i * 3 + 1] + px[i * 3 + 2]) / 3 for i in range(64)]
    acc = 0.0
    for g in gray:
        acc = acc + g
    mean = acc / 64
    h = 0
    for g in gray:
        h = ((h << 1) | (1 if g >= mean else 0)) & 0xFFFFFFFFFFFFFFFF
    if h >= 1 << 63:
        h -= 1 << 64
    return h


@_twin_cache
def mm_ahash_sql(sf_dir: str | None = None) -> str:
    rows = [
        (doc_id, 8, 8, _ahash(text)) for doc_id, text in _docs(sf_dir or _sf_dir())
    ]
    return _values_sql(
        rows,
        [
            ("media_id", "BIGINT"),
            ("width", "INTEGER"),
            ("height", "INTEGER"),
            ("ahash", "BIGINT"),
        ],
    )


@_twin_cache
def mm_ahash_neardups_sql(sf_dir: str | None = None) -> str:
    # mirrors ahash_near_dups over the duplicated-corpus contract query:
    # every doc_id % 7 == 0 re-enters as doc_id + 1_000_000 (an exact-dup
    # image), candidates share a 16-bit hash slice, hamming <= 6 verifies
    from collections import defaultdict

    items = list(_docs(sf_dir or _sf_dir()))
    items += [(doc_id + 1_000_000, text) for doc_id, text in items if doc_id % 7 == 0]
    hashes = {mid: _ahash(text) for mid, text in items}
    buckets: dict = defaultdict(list)
    for mid, h in hashes.items():
        hu = h & 0xFFFFFFFFFFFFFFFF
        for band in range(4):
            buckets[(band, (hu >> (band * 16)) & 0xFFFF)].append(mid)
    cand = set()
    for ids in buckets.values():
        ids.sort()
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                cand.add((ids[i], ids[j]))
    rows = []
    for a, b in sorted(cand):
        ham = bin((hashes[a] ^ hashes[b]) & 0xFFFFFFFFFFFFFFFF).count("1")
        if ham <= 6:
            rows.append((a, b, ham))
    return _values_sql(
        rows,
        [("id_a", "BIGINT"), ("id_b", "BIGINT"), ("hamming", "INTEGER")],
    )
