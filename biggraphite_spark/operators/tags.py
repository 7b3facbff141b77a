"""Tag-based series search (``seriesByTag``) — the graphite TagDB surface.

The reference ships ``plugins/tags.py:21-179`` (``BigGraphiteTagDB``) with
every method stubbed to ``[]``; the only specification is the docstrings
(``tags.py:40-56`` for the matcher grammar, ``:80-148`` for the tag/value
listings).  This module implements those documented semantics Spark-first:

- **Carbon tag format**: a tagged series is ``path;tag1=val1;tag2=val2``.
  The path itself is exposed as the implicit tag ``name`` (graphite
  convention), and the canonical form sorts tags by key.
- **Matchers** (``tags.py:40-56``)::

      tag=spec    tag value exactly matches spec
      tag!=spec   tag value does not exactly match spec
      tag=~spec   tag value matches the regular expression spec
      tag!=~spec  tag value does not match the regular expression spec

  Regular expressions are anchored at the start of the value (re.match
  semantics).  Any spec that matches an empty value also matches series
  that don't have that tag — implemented by evaluating every matcher
  against ``coalesce(tags[tag], '')``, which makes the missing-tag rule
  fall out of the empty-string case with no special-casing.  At least one
  spec must require a non-empty value, else the query is rejected
  (``InvalidArgumentError``), exactly as the docstring demands.

Everything row-shaped is a Column expression over a ``map<string,string>``
tags column: matcher conjunctions compile to one ``filter()`` (predicate
pushdown applies to any materialized tag columns), and the tag/value
listings are a single ``explode`` + hash aggregation — both scale as plain
shuffle-on-key plans at 100-TB catalog sizes.
"""

from __future__ import annotations

import re
import threading

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..model import InvalidArgumentError

#: matcher grammar from the reference docstring (tags.py:40-56); the key may
#: not contain ``;``/``!``/``=``, the op is one of  = != =~ !=~, the spec is
#: everything after (may be empty)
_SPEC_RE = re.compile(r"^([^;!=]+)(!?=~?)([^;]*)$")

#: Regex matchers execute JVM-side (``rlike`` = java.util.regex), but are
#: validated and empty-match-probed with Python ``re``.  The two dialects
#: agree on the common subset graphite queries use; constructs that are
#: valid in Python but absent or different in Java would pass validation
#: and then blow up (or diverge) inside the executor, so they are rejected
#: up front: named groups/backrefs ``(?P...)``, comments ``(?#...)``,
#: conditionals ``(?(...)``, and ``\Z`` (end-of-string in Python, but
#: before-final-newline in Java, where Python's meaning is spelled ``\z``).
_PY_ONLY_RE = re.compile(r"\(\?P|\(\?#|\(\?\(|\\Z")


def parse_tag_spec(spec: str) -> tuple[str, str, str]:
    """Parse one ``tag<op>spec`` string into ``(tag, op, spec)``.

    Raises InvalidArgumentError on malformed input (empty tag, unknown op).
    """
    m = _SPEC_RE.match(spec)
    if m is None:
        raise InvalidArgumentError(f"invalid tag spec {spec!r}")
    tag, op, value = m.group(1), m.group(2), m.group(3)
    if op in ("=~", "!=~"):
        try:
            re.compile(value)
        except re.error as ex:
            raise InvalidArgumentError(f"invalid regex in {spec!r}: {ex}")
        m2 = _PY_ONLY_RE.search(value)
        if m2:
            raise InvalidArgumentError(
                f"unsupported regex construct {m2.group(0)!r} in {spec!r}: "
                "only the Python/Java-common regex subset is accepted "
                "(matching runs on the JVM)"
            )
    return tag, op, value


def _matches_empty(op: str, spec: str) -> bool:
    """Would this matcher accept a series that lacks the tag entirely?

    The empty string stands in for "tag absent" (tags.py:47-48)."""
    if op == "=":
        return spec == ""
    if op == "!=":
        return spec != ""
    if op == "=~":
        return re.match(spec, "") is not None
    return re.match(spec, "") is None  # !=~


def parse_tag_specs(specs: list[str]) -> list[tuple[str, str, str]]:
    """Parse + validate a spec list: ≥1 spec must require a non-empty value
    (tags.py:50 — otherwise the query would match the whole catalog)."""
    if not specs:
        raise InvalidArgumentError("at least one tag spec is required")
    parsed = [parse_tag_spec(s) for s in specs]
    if all(_matches_empty(op, sp) for _, op, sp in parsed):
        raise InvalidArgumentError(
            "at least one tag spec must require a non-empty value"
        )
    return parsed


def spec_predicate(tag: str, op: str, spec: str, tags_col: str = "tags") -> Column:
    """One matcher as a Column predicate over a map<string,string> column.

    ``coalesce(tags[tag], '')`` realizes the missing-tag-behaves-as-empty
    rule; ``=~`` anchors at the start only (re.match semantics, tags.py:52).
    """
    val = F.coalesce(F.col(tags_col).getItem(tag), F.lit(""))
    if op == "=":
        return val == spec
    if op == "!=":
        return val != spec
    anchored = "^(?:" + spec + ")"
    if op == "=~":
        return val.rlike(anchored)
    return ~val.rlike(anchored)  # !=~


def specs_predicate(specs: list[str], tags_col: str = "tags") -> Column:
    """Validated conjunction of every matcher in ``specs``."""
    pred = None
    for tag, op, spec in parse_tag_specs(specs):
        p = spec_predicate(tag, op, spec, tags_col)
        pred = p if pred is None else (pred & p)
    return pred


# ---------------------------------------------------------------------------
# Series-string <-> (path, tags) codecs
# ---------------------------------------------------------------------------

def parse_series(series: str) -> tuple[str, dict[str, str]]:
    """Split ``path;k=v;...`` into path + tag dict (pure Python; used by
    canonicalization and tests).  The implicit ``name`` tag is NOT added
    here — it belongs to the query-time view, not the stored string."""
    parts = [p for p in series.split(";") if p != ""]
    if not parts or "=" in parts[0]:
        raise InvalidArgumentError(f"invalid series {series!r}: missing path")
    path = parts[0]
    tags: dict[str, str] = {}
    for p in parts[1:]:
        k, sep, v = p.partition("=")
        if not sep or not k:
            raise InvalidArgumentError(f"invalid tag {p!r} in series {series!r}")
        tags[k] = v  # last assignment wins, like graphite's dict build
    return path, tags


def format_series(path: str, tags: dict[str, str]) -> str:
    """Canonical tagged form: tags sorted by key (graphite TaggedSeries)."""
    return path + "".join(
        f";{k}={v}" for k, v in sorted(tags.items()) if k != "name"
    )


def canonicalize_series(series: str) -> str:
    """``tag_series`` semantics (tags.py:150-156): upsert is a no-op for a
    derived catalog, so this returns the canonicalized series name."""
    path, tags = parse_series(series)
    return format_series(path, tags)


class TagStore:
    """Writable TagDB: the upsert half of the reference surface
    (``tag_series`` / ``tag_multi_series`` / ``del_series``,
    tags.py:149-179 — stubbed there; real here).

    Backing is a parquet directory of canonical series strings.  The write
    shapes are the 100-TB-safe ones:

    - **tag_series / tag_multi_series** — canonicalize, then LEFT-ANTI
      against the existing store and APPEND only the genuinely-new names.
      Upsert-by-append is sound because the row is the canonical string
      itself: two upserts of the same series are byte-identical, so
      "update" degenerates to "already present".  No rewrite of existing
      data, one broadcast-able anti-join.
    - **del_series** — the rare path: rewrite-without (staging dir + swap),
      the same tombstone-free compaction any immutable-file store uses.
    """

    def __init__(self, spark, path: str):
        self.spark = spark
        self.path = path
        # serialize mutations: two concurrent upserts would each anti-join
        # against the same pre-write snapshot and append the same new
        # series twice (HTTP tag writes arrive on ThreadingHTTPServer
        # threads); a process-local lock is the right scope for a
        # single-writer store — multi-writer deployments front this with a
        # queue, as the reference does for carbon ingestion
        self._write_lock = threading.Lock()

    def _existing(self) -> DataFrame:
        try:
            return self.spark.read.parquet(self.path).select("series")
        except Exception:  # first write: empty store
            from pyspark.sql.types import StringType, StructField, StructType

            return self.spark.createDataFrame(
                [], StructType([StructField("series", StringType())])
            )

    def series(self) -> DataFrame:
        """The stored catalog, tag-parsed and query-ready."""
        return with_tags(self._existing())

    def tag_multi_series(self, series: list[str]) -> list[str]:
        """Upsert a batch; returns the canonical forms (reference
        tag_multi_series contract)."""
        canon = [canonicalize_series(s) for s in series]
        new = self.spark.createDataFrame(
            [(s,) for s in canon], "series string"
        ).dropDuplicates(["series"])
        with self._write_lock:
            # the STORE is the big side: find the already-present subset by
            # broadcasting the (small) batch at it, then anti-join the batch
            # against that (≤ batch-sized) result — both joins broadcast the
            # small side, and the store is scanned once, never shuffled
            present = self._existing().join(
                F.broadcast(new), "series", "left_semi"
            )
            delta = new.join(F.broadcast(present), "series", "left_anti")
            delta.write.mode("append").parquet(self.path)
        return canon

    def tag_series(self, series: str) -> str:
        return self.tag_multi_series([series])[0]

    def del_series(self, series: list[str]) -> bool:
        canon = {canonicalize_series(s) for s in series}
        with self._write_lock:
            kept = self._existing().filter(~F.col("series").isin(*canon))
            self._rewrite(kept)
        return True

    def _rewrite(self, df: DataFrame, partitions: int | None = None) -> None:
        """Staged rewrite: write to a sibling dir, then swap — readers never
        see a half-written store.  Must be called under the write lock."""
        staging = self.path.rstrip("/") + ".staging"
        out = df if partitions is None else df.repartition(partitions)
        # the staging write fully materializes the plan while self.path
        # still exists; only then is the old dir swapped out
        out.write.mode("overwrite").parquet(staging)
        import shutil

        shutil.rmtree(self.path, ignore_errors=True)
        shutil.move(staging, self.path)

    #: target rows per compacted parquet file — small enough to broadcast
    #: slices, large enough that a year of churn is a handful of files
    _COMPACT_ROWS_PER_FILE = 4_000_000

    def compact(self, target_files: int | None = None) -> int:
        """Fold the append-accreted file set back into a few dense files.

        Every upsert batch appends its delta as new parquet part-files, so
        a year of tag churn accretes thousands of tiny files even though
        the ROWS never duplicate (the anti-join guarantees that) — the
        classic small-files problem.  Compaction is the standard immutable-
        store answer: read, repartition to ``ceil(rows / 4M)`` files (or
        ``target_files``), staged rewrite.  Returns the file count written.
        """
        with self._write_lock:
            existing = self._existing()
            if target_files is None:
                n = existing.count()
                target_files = max(1, -(-n // self._COMPACT_ROWS_PER_FILE))
            self._rewrite(existing, partitions=target_files)
        return target_files


def with_tags(df: DataFrame, series_col: str = "series") -> DataFrame:
    """Add ``path`` and ``tags`` (map, incl. implicit ``name`` -> path) to a
    DataFrame of tagged series strings.  Pure Column expressions: split on
    ``;``, key = text before the first ``=``, value = text after it."""
    parts = F.split(F.col(series_col), ";")
    path = F.element_at(parts, 1)
    pairs = F.filter(
        F.slice(parts, 2, F.greatest(F.size(parts) - 1, F.lit(0))),
        lambda p: p.contains("="),
    )
    entries = F.transform(
        pairs,
        lambda p: F.struct(
            F.substring_index(p, "=", 1).alias("key"),
            F.regexp_replace(p, r"^[^=]*=", "").alias("value"),
        ),
    )
    # drop any explicit 'name' tag so the implicit one can't collide under
    # ANSI map_concat duplicate-key checking
    entries = F.filter(entries, lambda e: e.getField("key") != F.lit("name"))
    # duplicate tag keys (e.g. 'm;k=1;k=2') resolve to the LAST occurrence,
    # matching parse_series' dict build — without this, map_from_entries
    # throws under the default mapKeyDedupPolicy=EXCEPTION, and one
    # malformed catalog entry would fail every /tags query
    entries = F.filter(
        entries,
        lambda e, i: ~F.exists(
            F.slice(entries, i + F.lit(2), F.size(entries)),
            lambda later: later.getField("key") == e.getField("key"),
        ),
    )
    tags = F.map_concat(
        F.create_map(F.lit("name"), path), F.map_from_entries(entries)
    )
    return df.withColumn("path", path).withColumn("tags", tags)


# ---------------------------------------------------------------------------
# Query surface
# ---------------------------------------------------------------------------

def find_series(tagged: DataFrame, specs: list[str],
                series_col: str = "series") -> DataFrame:
    """``find_series`` (tags.py:33-56): matching canonical paths, sorted.

    ``tagged`` must carry a ``tags`` map column (see :func:`with_tags`).
    One filter over the catalog — Catalyst folds the conjunction into the
    scan; no join, no shuffle beyond the final sort.
    """
    return (
        tagged.filter(specs_predicate(specs))
        .select(F.col(series_col).alias("series"))
        .orderBy("series")
    )


def list_tags(tagged: DataFrame, tag_filter: str | None = None,
              limit: int | None = None) -> DataFrame:
    """``list_tags`` (tags.py:80-99): distinct tag names (+ series counts,
    the "additional keys may be returned" allowance), optionally filtered
    by an unanchored regex.  ``limit`` mirrors the reference signature's
    ``limit=None`` argument (applied after the sort, like graphite-web)."""
    out = (
        tagged.select(F.explode(F.map_keys("tags")).alias("tag"))
        .groupBy("tag")
        .agg(F.count("*").cast("long").alias("series_count"))
    )
    if tag_filter:
        out = out.filter(F.col("tag").rlike(tag_filter))
    out = out.orderBy("tag")
    return out.limit(limit) if limit else out


def tag_values(tagged: DataFrame, tag: str | None = None,
               value_filter: str | None = None,
               limit: int | None = None) -> DataFrame:
    """``get_tag`` / ``list_values`` (tags.py:101-148): per-(tag, value)
    series counts.  ``tag=None`` lists every tag's values (the get_tag
    response is one groupBy partition of this).  ``limit`` bounds the
    value list after the sort (reference ``get_tag``/``list_values``
    signatures)."""
    out = (
        tagged.select(F.explode("tags").alias("tag", "value"))
        .groupBy("tag", "value")
        .agg(F.count("*").cast("long").alias("series_count"))
    )
    if tag is not None:
        out = out.filter(F.col("tag") == tag)
    if value_filter:
        out = out.filter(F.col("value").rlike(value_filter))
    out = out.orderBy("tag", "value")
    return out.limit(limit) if limit else out


def auto_complete_tags(tagged: DataFrame, exprs: list[str] | None = None,
                       tag_prefix: str | None = None,
                       limit: int = 100) -> DataFrame:
    """graphite-web ``/tags/autoComplete/tags`` (tags/base.py
    auto_complete_tags): tag names present on series matching ``exprs``
    (all series when none), EXCLUDING tags the exprs already pin,
    prefix-filtered, sorted, limited (graphite's default limit is 100).
    One filter + one map_keys explode — no join."""
    src = tagged.filter(specs_predicate(list(exprs))) if exprs else tagged
    out = src.select(F.explode(F.map_keys("tags")).alias("tag")).distinct()
    if exprs:
        searched = sorted({parse_tag_spec(e)[0] for e in exprs})
        out = out.filter(~F.col("tag").isin(searched))
    if tag_prefix:
        out = out.filter(F.col("tag").startswith(tag_prefix))
    return out.orderBy("tag").limit(limit)


def auto_complete_values(tagged: DataFrame, tag: str,
                         exprs: list[str] | None = None,
                         value_prefix: str | None = None,
                         limit: int = 100) -> DataFrame:
    """graphite-web ``/tags/autoComplete/values``: distinct values of
    ``tag`` across series matching ``exprs`` (all series when none),
    prefix-filtered, sorted, limited."""
    src = tagged.filter(specs_predicate(list(exprs))) if exprs else tagged
    out = (
        src.select(F.col("tags").getItem(tag).alias("value"))
        .filter(F.col("value").isNotNull())
        .distinct()
    )
    if value_prefix:
        out = out.filter(F.col("value").startswith(value_prefix))
    return out.orderBy("value").limit(limit)
