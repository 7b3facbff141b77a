"""Deterministic corpus sampling and training-sequence packing.

Beyond-reference operators for the training-data pipeline: reproducible
stratified subsampling (the "keep 30% of lang=X" step of corpus mixing) and
concat-and-chunk sequence packing (assigning documents to fixed-token-budget
training sequences).

Determinism contract: sampling decisions hash the document id with md5 and
compare the first 8 hex chars lexicographically against a per-stratum
threshold — lowercase fixed-width hex ordering equals numeric ordering, the
same portable-hash trick as operators/dedup.py, so the DuckDB oracle (and
any other engine) reproduces the exact sample bit-for-bit.  No rand(), no
seed plumbing, stable under re-runs and repartitioning.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: default per-language keep rates for the demo query — corpus mixing tables
#: are always caller-supplied in practice
DEFAULT_RATES: dict[str, float] = {"en": 0.5, "de": 0.75, "es": 0.25}


def rate_to_hex_threshold(rate: float) -> str:
    """Map a keep-rate in [0, 1] to the 8-hex-char threshold such that
    ``md5(id)[:8] < threshold`` keeps ~rate of uniformly-hashed ids."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate!r}")
    return f"{int(rate * 0xFFFFFFFF):08x}"


def _hash_key(doc_id: Column) -> Column:
    return F.substring(F.md5(doc_id.cast("string")), 1, 8)


def stratified_sample(
    docs: DataFrame,
    rates: Mapping[str, float] | None = None,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic stratified sampling: keep each document iff the hex
    hash of its id falls under its stratum's threshold.  Strata absent from
    ``rates`` are dropped (rate 0) — the corpus-mixing contract.

    One codegen'd filter over the scan; at 100 TB this runs at parquet scan
    speed with the stratum filter pushed into the row-group stats when the
    table is partitioned by stratum.
    """
    table = DEFAULT_RATES if rates is None else dict(rates)
    key = _hash_key(F.col(id_col))
    decision = None
    for stratum, rate in table.items():
        cond = (F.col(stratum_col) == stratum) & (
            key < rate_to_hex_threshold(rate)
        )
        decision = cond if decision is None else decision | cond
    if decision is None:
        decision = F.lit(False)
    return docs.filter(decision).select(
        id_col, stratum_col, key.alias("sample_key")
    )


def pack_sequences(
    docs: DataFrame,
    budget: int,
    token_col: Column | None = None,
    group_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Concat-and-chunk sequence packing: documents are concatenated in
    ``id_col`` order within each ``group_col`` stream and sliced into
    fixed-``budget`` training sequences.

    Emits, per document: its stream, sequence number, offset inside the
    sequence, and token count.  A document whose tokens straddle a boundary
    belongs to the sequence where it starts (standard GPT-style packing —
    the chunker, not the operator, splits the text).  ``token_col`` defaults
    to the whitespace token count of ``text``.

    One window (exclusive running sum) per stream — with the corpus
    partitioned by the group column this is a per-partition sort, no global
    shuffle.
    """
    toks = (
        F.size(F.split(F.col("text"), " ")) if token_col is None else token_col
    ).cast("long")
    w = (
        Window.partitionBy(group_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offset = F.coalesce(F.sum(toks).over(w), F.lit(0))
    return docs.select(
        id_col,
        F.col(group_col).alias("stream"),
        toks.alias("n_tokens"),
        F.floor(offset / budget).cast("long").alias("seq_id"),
        (offset % budget).cast("long").alias("seq_offset"),
    )


def quota_sample(
    docs: DataFrame,
    quotas: Mapping[str, int],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """EXACT-size stratified sample: per stratum, keep the ``n`` documents
    with the smallest md5 hash keys (deterministic "random" order, doc-id
    tie-break).  Strata absent from ``quotas`` are dropped.

    Where :func:`stratified_sample` keeps an EXPECTED fraction (pure
    filter, scan-speed), quota sampling pins exact output sizes — the
    contract data-mixing specs are usually written in ("exactly 10M
    English docs").  Shape: one per-stratum window; the rank<=n filter
    compiles to Spark's WindowGroupLimit, so each partition retains only
    its top-n candidates before the shuffle — the distributed top-k, not
    a full sort.
    """
    key = _hash_key(F.col(id_col))
    w = Window.partitionBy(stratum_col).orderBy(key, F.col(id_col).asc())
    quota = None
    for stratum, n in quotas.items():
        quota = (F.when if quota is None else quota.when)(
            F.col(stratum_col) == stratum, F.lit(int(n))
        )
    if quota is None:
        return docs.select(
            F.col(id_col), F.col(stratum_col), key.alias("sample_key")
        ).filter(F.lit(False))
    return (
        docs.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= quota)
        .select(id_col, stratum_col, key.alias("sample_key"))
    )


def weighted_sample(
    docs: DataFrame,
    weight_col: str,
    n: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis & Spirakis 2006):
    each row draws a deterministic md5-uniform u ∈ (0, 1] and competes
    with priority u^(1/w); the global top-``n`` priorities win.  Inclusion
    probability is proportional to weight, and the same corpus always
    yields the same sample — the reproducibility contract a training-data
    release needs.

    Determinism across engines: u = (h32+1)/2^32 is exact (dyadic), and
    the ONLY libm call (pow) is immediately rounded to the 6-decimal
    lattice with the documented paired tie-breaker before ranking, with
    the doc id as the total-order tie-break — a last-ulp pow disagreement
    cannot reorder the lattice.  Shape: scan-speed priority projection +
    one global top-n (TakeOrdered, no full sort).
    """
    h = F.conv(_hash_key(F.col(id_col)), 16, 10).cast("long")
    u = (h + F.lit(1)) / F.lit(float(1 << 32))
    pri = F.round(
        F.pow(u, F.lit(1.0) / F.col(weight_col).cast("double")) + 1.23e-9, 6
    )
    # orderBy+limit = TakeOrdered: each partition keeps its local top-n
    # and only n rows reach the driver-side merge — a global row_number
    # window would instead move EVERY row to one partition
    return (
        docs.select(
            F.col(id_col), F.col(weight_col), pri.alias("priority")
        )
        .orderBy(F.desc("priority"), F.col(id_col).asc())
        .limit(n)
    )
