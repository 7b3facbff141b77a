"""Prometheus / OpenMetrics exposition-text source.

Sibling of the carbon line protocol (``sources/carbon.py``, reference
plugins/carbon.py:178-230): the other plaintext metrics wire format a
graphite-compatible engine gets pointed at.  Format (public spec,
prometheus.io/docs/instrumenting/exposition_formats):

    # HELP http_requests_total The total number of HTTP requests.
    # TYPE http_requests_total counter
    http_requests_total{method="post",code="200"} 1027 1395066363000
    metric_without_labels 42

- ``#`` lines are comments/metadata — skipped;
- label values are quoted with ``\\``, ``\"`` and ``\n`` escapes (why the
  parser is a real tokenizer, not a regex);
- value may be ``+Inf``/``-Inf``/``NaN`` (NaN lands as null at the Arrow
  boundary — pyarrow treats float NaN as missing — which matches the
  engine's NaN-sentinel -> null point convention one stage early);
- the trailing timestamp is OPTIONAL and in MILLISECONDS.

Carbon semantics kept: malformed lines are dropped, never fatal.  The
parse runs in ``mapInPandas`` (Arrow-batched, same shape as the whisper
header parser — a line protocol with escape sequences is exactly the
"built-ins genuinely can't express it" case); everything after it is
plain columnar.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.names import sanitize_name_col

PARSED_SCHEMA = (
    "name string, labels map<string,string>, value double, ts_ms long"
)

_ESCAPES = {"\\": "\\", '"': '"', "n": "\n"}


def _parse_labels(s: str, i: int) -> tuple[dict[str, str], int] | None:
    """Parse ``{k="v",...}`` starting at the ``{``; returns (labels, next)
    or None on malformed input."""
    labels: dict[str, str] = {}
    i += 1
    while True:
        while i < len(s) and s[i] in " \t":
            i += 1
        if i < len(s) and s[i] == "}":
            return labels, i + 1
        j = i
        while j < len(s) and (s[j].isalnum() or s[j] in "_"):
            j += 1
        name = s[i:j]
        if not name or j >= len(s) or s[j] != "=":
            return None
        j += 1
        if j >= len(s) or s[j] != '"':
            return None
        j += 1
        out = []
        while j < len(s) and s[j] != '"':
            if s[j] == "\\" and j + 1 < len(s):
                out.append(_ESCAPES.get(s[j + 1], s[j + 1]))
                j += 2
            else:
                out.append(s[j])
                j += 1
        if j >= len(s):
            return None
        labels[name] = "".join(out)
        j += 1
        while j < len(s) and s[j] in " \t":
            j += 1
        if j < len(s) and s[j] == ",":
            i = j + 1
            continue
        if j < len(s) and s[j] == "}":
            return labels, j + 1
        return None


def _parse_line(line: str):
    """One exposition line -> (name, labels, value, ts_ms) or None."""
    s = line.strip()
    if not s or s.startswith("#"):
        return None
    i = 0
    while i < len(s) and (s[i].isalnum() or s[i] in "_:"):
        i += 1
    name = s[:i]
    if not name or name[0].isdigit():
        return None
    labels: dict[str, str] = {}
    if i < len(s) and s[i] == "{":
        parsed = _parse_labels(s, i)
        if parsed is None:
            return None
        labels, i = parsed
    rest = s[i:].split()
    if not rest or len(rest) > 2:
        return None
    try:
        value = float(rest[0])  # handles +Inf/-Inf/NaN per spec
    except ValueError:
        return None
    ts_ms = None
    if len(rest) == 2:
        try:
            ts_ms = int(rest[1])
        except ValueError:
            return None
    return name, labels, value, ts_ms


def parse_exposition(lines: DataFrame, line_col: str = "value") -> DataFrame:
    """Text DataFrame (one line per row) -> (name, labels, value, ts_ms).

    Malformed lines are dropped; comment/metadata lines are skipped.
    """
    import pandas as pd

    col = line_col

    def parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for line in pdf[col]:
                p = _parse_line(str(line))
                if p is not None:
                    rows.append(p)
            yield pd.DataFrame(
                rows, columns=["name", "labels", "value", "ts_ms"]
            )

    return lines.mapInPandas(parse, PARSED_SCHEMA)


def to_graphite_points(
    parsed: DataFrame, default_ts_s: int | None = None
) -> DataFrame:
    """Flatten (name, labels) into graphite dotted names and land the
    carbon point shape (name, ts unix-seconds, value).

    ``http_requests_total{method="post",code="200"}`` becomes
    ``http_requests_total.code.200.method.post`` — labels sorted by key so
    the flattening is deterministic, values sanitized through the same
    component rules as carbon names.  Samples without a timestamp take
    ``default_ts_s`` (the scrape time in a real pipeline) or are dropped
    when none is given.  All built-in expressions — the Python stays in
    the line parser.
    """
    flat = F.concat_ws(
        ".",
        F.col("name"),
        F.concat_ws(
            ".",
            F.flatten(
                F.transform(
                    F.array_sort(F.map_keys("labels")),
                    lambda k: F.array(k, F.element_at(F.col("labels"), k)),
                )
            ),
        ),
    )
    ts = (F.col("ts_ms") / 1000).cast("long")
    if default_ts_s is not None:
        ts = F.coalesce(ts, F.lit(default_ts_s).cast("long"))
    return (
        parsed.select(
            sanitize_name_col(flat).alias("name"),
            ts.alias("ts"),
            F.when(F.isnan("value"), None).otherwise(F.col("value")).alias("value"),
        )
        .filter(F.col("ts").isNotNull() & (F.col("name") != ""))
    )
