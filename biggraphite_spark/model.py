"""Pure-Python semantics kernel: Stage, Retention, Aggregator, window alignment.

Reimplements the *meaning* (not the code) of the reference data model:

- Stage / Retention string codecs and invariants
  (reference: biggraphite/metric.py:373-532, parse regex metric.py:386-388)
- stage selection + window alignment used by every read
  (reference: biggraphite/metric.py:593-623)
- the closed set of 5 aggregators, each with a final ``aggregate`` mode and a
  partial ``merge`` mode (reference: biggraphite/metric.py:197-370)
- metric-name hygiene + deterministic ids
  (reference: biggraphite/metric.py:106-194)

Everything here is plain Python with no Spark dependency: it is shared by the
engine (plan-time decisions), the Spark expression builders in
``functions/aggregators.py``, and the test suite (golden semantics tests).
"""

from __future__ import annotations

import hashlib
import math
import re
import uuid
from dataclasses import dataclass, field
from typing import Iterable, Optional, Sequence

NAN = float("nan")

# Namespace for deterministic metric ids (uuid5 over the metric name, like the
# reference's scheme at metric.py:157-178; the namespace UUID itself is ours).
_UUID_NAMESPACE = uuid.UUID("b5b69413-0b99-4e03-a7b3-0c6a1c7d5f20")

#: Maximum number of dot-separated name components the engine indexes as
#: dedicated catalog columns (reference: COMPONENTS_MAX_LEN=64 in
#: drivers/cassandra_common.py; 16 is plenty for the fixture corpora and keeps
#: the catalog narrow — raise if real data needs more).
COMPONENTS_MAX_LEN = 16

#: Maximum metrics a single glob may return before the engine raises
#: (reference: max_metrics_per_pattern=5000, drivers/cassandra.py:295).
MAX_METRICS_PER_PATTERN = 5000

#: Out-of-order ingest tolerance (reference: _OUT_OF_ORDER_S = 15 min,
#: drivers/cassandra.py:640) — used as the streaming watermark.
OUT_OF_ORDER_S = 15 * 60

#: Default retention: 1 day at 1s + 7 days at 1min (reference: metric.py:640).
DEFAULT_RETENTION_STR = "86400*1s:10080*60s"

#: Default xFilesFactor (reference: metric.py:641).
DEFAULT_XFILESFACTOR = 0.5


class InvalidArgumentError(ValueError):
    """Invalid stage/retention/glob argument (reference: accessor.py errors)."""


class TooManyMetrics(RuntimeError):
    """A glob matched more than MAX_METRICS_PER_PATTERN metrics."""


# ---------------------------------------------------------------------------
# Metric names
# ---------------------------------------------------------------------------

def components_from_name(name: str) -> list[str]:
    """Split a dot-separated metric name, dropping empty components.

    Reference: metric.py:181-194 (_components_from_name / sanitize).
    """
    return [c for c in name.split(".") if c != ""]


def sanitize_metric_name(name: str) -> str:
    """Strip empty components from a metric name (reference: metric.py:181-194)."""
    return ".".join(components_from_name(name))


def metric_id(name: str) -> str:
    """Deterministic id for a metric name.

    The reference derives a UUIDv5 from the name (metric.py:157-178).  We keep
    the same property (stable, collision-resistant, derived only from the
    name) via uuid5 over our own namespace.
    """
    return str(uuid.uuid5(_UUID_NAMESPACE, name))


def parent_name(name: str) -> str:
    """Name minus its last component; '' for top-level names.

    Reference: drivers/cassandra.py:1969,2054 (rpartition('.')).
    """
    return name.rpartition(".")[0]


# ---------------------------------------------------------------------------
# Stage & Retention
# ---------------------------------------------------------------------------

_STAGE_RE = re.compile(r"^(\d+)\*(\d+)s(_0|_aggr)?$")


@dataclass(frozen=True, order=False)
class Stage:
    """"Keep ``points`` points at ``precision`` seconds each."

    Reference: metric.py:373-508.  ``stage0`` marks the raw (non-aggregated)
    stage; aggregated stages carry (value, count) partials.
    """

    points: int
    precision: int
    stage0: bool = False

    def __post_init__(self) -> None:
        if self.points <= 0 or self.precision <= 0:
            raise InvalidArgumentError(
                f"invalid stage: points={self.points} precision={self.precision}"
            )

    @property
    def duration(self) -> int:
        """Seconds of data the stage keeps (points * precision)."""
        return self.points * self.precision

    @property
    def precision_ms(self) -> int:
        return self.precision * 1000

    @property
    def duration_ms(self) -> int:
        return self.duration * 1000

    # -- codecs ------------------------------------------------------------
    @classmethod
    def from_string(cls, s: str) -> "Stage":
        """Parse ``"{points}*{precision}s"`` with optional ``_0``/``_aggr``.

        Reference: metric.py:386-388 parse regex; suffix convention from the
        per-stage table naming at drivers/cassandra.py:1026-1033.
        """
        m = _STAGE_RE.match(s)
        if not m:
            raise InvalidArgumentError(f"invalid stage string: {s!r}")
        points, precision, suffix = int(m.group(1)), int(m.group(2)), m.group(3)
        return cls(points=points, precision=precision, stage0=(suffix == "_0"))

    def as_string(self, with_suffix: bool = False) -> str:
        base = f"{self.points}*{self.precision}s"
        if with_suffix:
            base += "_0" if self.stage0 else "_aggr"
        return base

    def __str__(self) -> str:  # pragma: no cover - convenience
        return self.as_string()

    @property
    def table_name(self) -> str:
        """Per-stage table name (reference: drivers/cassandra.py:1026-1033)."""
        suffix = "0" if self.stage0 else "aggr"
        return f"datapoints_{self.points}p_{self.precision}s_{suffix}"

    # -- time arithmetic ---------------------------------------------------
    def round_down(self, ts: int) -> int:
        """Align ``ts`` down to the stage precision (reference: metric.py:469-475)."""
        return (ts // self.precision) * self.precision

    def round_up(self, ts: int) -> int:
        """Align ``ts`` up to the stage precision (reference: utils.py:141-148)."""
        return -((-ts) // self.precision) * self.precision

    def step(self, ts: int) -> int:
        """Bucket index since epoch at this precision (reference: metric.py:440-449)."""
        return ts // self.precision

    def epoch(self, ts: int) -> int:
        """Index of the stage-duration window containing ts (metric.py:477-497)."""
        return ts // self.duration


@dataclass(frozen=True)
class Retention:
    """Ordered list of stages, finest first.

    Invariants (reference: metric.py:511-532): at least one stage; each
    precision an exact multiple of the previous; durations strictly
    increasing; the first stage is the raw stage0.
    """

    stages: tuple[Stage, ...]

    def __post_init__(self) -> None:
        if not self.stages:
            raise InvalidArgumentError("retention must have at least one stage")
        prev: Optional[Stage] = None
        for st in self.stages:
            if prev is not None:
                if st.precision % prev.precision != 0:
                    raise InvalidArgumentError(
                        f"stage precision {st.precision} not a multiple of {prev.precision}"
                    )
                if st.duration <= prev.duration:
                    raise InvalidArgumentError(
                        f"stage duration {st.duration} not increasing over {prev.duration}"
                    )
            prev = st

    @classmethod
    def from_string(cls, s: str) -> "Retention":
        """Parse ``"86400*1s:10080*60s"`` (reference: metric.py:550-565)."""
        if not s:
            raise InvalidArgumentError("empty retention string")
        parts = s.split(":")
        stages = []
        for i, p in enumerate(parts):
            st = Stage.from_string(p)
            stages.append(Stage(st.points, st.precision, stage0=(i == 0)))
        return cls(stages=tuple(stages))

    def as_string(self) -> str:
        return ":".join(st.as_string() for st in self.stages)

    def __str__(self) -> str:  # pragma: no cover - convenience
        return self.as_string()

    @property
    def stage0(self) -> Stage:
        return self.stages[0]

    @property
    def duration(self) -> int:
        return self.stages[-1].duration

    @property
    def points(self) -> int:
        """Total stored points across stages (used by `du`, command_du.py:47-74)."""
        return sum(st.points for st in self.stages)

    def find_stage_for_ts(self, searched: int, now: int) -> Stage:
        """Finest stage whose duration still covers ``searched`` relative to now.

        Reference: metric.py:593-604.  Falls back to the coarsest stage when
        nothing covers the searched timestamp.
        """
        for st in self.stages:
            if searched >= now - st.duration:
                return st
        return self.stages[-1]

    def align_time_window(
        self, start: int, end: int, now: int, shortest_duration: int = 0
    ) -> tuple[int, int, Stage]:
        """Clamp and align a read window; pick the stage to serve it.

        Reference: metric.py:606-623.  Semantics (verified against the golden
        rows in tests/test_accessor.py:163-178 of the reference):

        - end is clamped to now,
        - the stage is the finest one covering ``start`` (see
          find_stage_for_ts), optionally skipping stages shorter than
          ``shortest_duration``,
        - start is clamped to the stage's own horizon (now - duration),
        - start is rounded *down*, end rounded *up*, to the stage precision.
        """
        end = min(end, now)
        candidates = [s for s in self.stages if s.duration >= shortest_duration]
        if not candidates:
            candidates = [self.stages[-1]]
        stage = None
        for st in candidates:
            if start >= now - st.duration:
                stage = st
                break
        if stage is None:
            stage = candidates[-1]
        start = max(start, now - stage.duration)
        start = stage.round_down(start)
        end = stage.round_up(end)
        if end < start:
            # window entirely before the horizon collapses to empty
            # (reference guard, metric.py:621-622)
            end = start
        return start, end, stage


DEFAULT_RETENTION = Retention.from_string(DEFAULT_RETENTION_STR)


class MetricMetadata:
    """Per-metric configuration: aggregator + retention + xFilesFactor.

    Reference: metric.py:631-704; defaults metric.py:639-644 (average,
    86400*1s:10080*60s, 0.5).  Plain value object — the engine stores these
    as catalog columns, this class is the typed driver-side form.
    """

    def __init__(self, aggregator: "Aggregator | None" = None,
                 retention: "Retention | None" = None,
                 carbon_xfilesfactor: float = 0.5):
        self.aggregator = aggregator if aggregator is not None else Aggregator("average")
        self.retention = retention if retention is not None else DEFAULT_RETENTION
        self.carbon_xfilesfactor = carbon_xfilesfactor

    def as_string_dict(self) -> dict:
        """The reference's 3-key config map (metric.py:672-682)."""
        return {
            "aggregator": self.aggregator.name,
            "retention": self.retention.as_string(),
            "carbon_xfilesfactor": f"{self.carbon_xfilesfactor:f}",
        }

    @classmethod
    def from_string_dict(cls, d: dict) -> "MetricMetadata":
        return cls(
            Aggregator(d["aggregator"]) if "aggregator" in d else None,
            Retention.from_string(d["retention"]) if "retention" in d else None,
            float(d.get("carbon_xfilesfactor", 0.5)),
        )


# ---------------------------------------------------------------------------
# Aggregators
# ---------------------------------------------------------------------------

def _is_nan(v) -> bool:
    return v is None or (isinstance(v, float) and math.isnan(v))


class Aggregator:
    """The closed set of 5 aggregation functions, with both modes.

    Reference: metric.py:197-370.  ``aggregate`` collapses the (value, count)
    partials of one time bucket into the final scalar; ``merge`` combines
    partials from the same stage into a new partial.

    This pure-Python form exists for golden tests and driver-side use; the
    engine's hot path uses the equivalent Column expressions in
    ``functions/aggregators.py``.
    """

    NAMES = ("average", "total", "minimum", "maximum", "last")
    #: carbon-name aliases (reference: metric.py:197-209 / carbon validation)
    CARBON_NAMES = {"avg": "average", "sum": "total", "min": "minimum",
                    "max": "maximum", "last": "last", "average": "average",
                    "total": "total", "minimum": "minimum", "maximum": "maximum"}

    def __init__(self, name: str):
        name = self.CARBON_NAMES.get(name, name)
        if name not in self.NAMES:
            raise InvalidArgumentError(f"unknown aggregator: {name}")
        self.name = name

    # -- final mode --------------------------------------------------------
    def aggregate(self, values: Sequence[float], counts: Optional[Sequence[int]] = None,
                  newest_first: bool = True) -> float:
        """Collapse one bucket's values (newest first) to a scalar.

        Reference: metric.py:263-304; NaN entries are skipped, empty/all-NaN
        buckets yield NaN (metric.py:340-370).  For ``average`` the stored
        value is the running *sum* and ``counts`` carries the contributing
        point count — the division happens here, at read time
        (CASSANDRA_DESIGN.md:43).
        """
        if counts is None:
            counts = [1] * len(values)
        pairs = [(v, c) for v, c in zip(values, counts) if not _is_nan(v)]
        if not pairs:
            return NAN
        vs = [v for v, _ in pairs]
        cs = [c for _, c in pairs]
        if self.name == "average":
            total_count = sum(cs)
            return sum(vs) / total_count if total_count else NAN
        if self.name == "total":
            return sum(vs)
        if self.name == "minimum":
            return min(vs)
        if self.name == "maximum":
            return max(vs)
        # last: first non-NaN scanning newest-first (metric.py:286-292)
        ordered = vs if newest_first else list(reversed(vs))
        return ordered[0]

    # -- partial mode ------------------------------------------------------
    def merge(self, values: Sequence[float], counts: Optional[Sequence[int]] = None
              ) -> tuple[float, int]:
        """Combine same-stage partials (oldest->newest) into a new partial.

        Reference: metric.py:218-261.  average/total carry (sum, count) with
        division deferred; min/max keep the extremum; last keeps the newest
        non-NaN value.  The returned count is always the sum of counts.
        """
        if counts is None:
            counts = [1] * len(values)
        total_count = sum(c for v, c in zip(values, counts) if not _is_nan(v))
        vs = [v for v in values if not _is_nan(v)]
        if not vs:
            return NAN, 0
        if self.name in ("average", "total"):
            return sum(vs), total_count
        if self.name == "minimum":
            return min(vs), total_count
        if self.name == "maximum":
            return max(vs), total_count
        return vs[-1], total_count  # last: newest non-NaN

    def __repr__(self) -> str:  # pragma: no cover
        return f"Aggregator({self.name})"


# ---------------------------------------------------------------------------
# Misc shared helpers
# ---------------------------------------------------------------------------

def round_down(ts: int, multiple: int) -> int:
    """Round down to a multiple (reference: utils.py:141-148)."""
    return (ts // multiple) * multiple


def round_up(ts: int, multiple: int) -> int:
    """Round up to a multiple (reference: utils.py:141-148)."""
    return -((-ts) // multiple) * multiple
