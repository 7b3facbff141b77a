"""Stateful stage0 ring buffer as a custom streaming operator.

The watermark-based rollup in :mod:`.ingest` covers the common late-data
policy; this module is the faithful incremental port of the reference's
per-metric stage0 ring buffer (drivers/_downsampling.py:128-189) for users
who need its exact overwrite/expiry behavior, implemented with
``applyInPandasWithState`` (Arrow-batched, one state row per metric):

- slot replace: a point whose step is within the ``capacity`` most recent
  steps overwrites its slot unconditionally; an update is emitted only when
  the stored value changed (`_downsampling.py:183-186`);
- advance: a point newer than every seen step expires the
  ``min(delta, capacity)`` oldest slots — expired points are emitted as
  *final* (they feed coarser stages exactly once);
- too-old: a point at least ``capacity`` steps behind is silently dropped
  (`_downsampling.py:180` boundary — the reference logs nothing either);
- state TTL (T4): a metric idle past the timeout flushes its remaining
  slots as final and frees its state (`_downsampling.py:72-83` obsolete()).

The semantics kernel (:func:`feed_slots`) is pure Python so the golden tests
from the reference suite (tests/drivers/test_drivers_downsampling.py) run
without a streaming query; the streaming operator is a thin Arrow wrapper.

Scale: state is O(metrics x capacity) doubles, hash-partitioned by name
across executors by the state store — the same sharding the reference gets
from one Downsampler per carbon process.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..model import Stage

CAPACITY = 20  # reference default, drivers/_downsampling.py:35


def feed_slots(
    epoch: int | None,
    slots: dict[int, float],
    points: list[tuple[int, float]],
    precision: int,
    capacity: int = CAPACITY,
) -> tuple[int | None, list[tuple[int, float, bool]]]:
    """Feed points (arrival order) through the ring buffer.

    ``epoch`` is the newest step seen (None = empty buffer); ``slots`` maps
    live step -> value and is mutated in place.  Returns the new epoch and
    the emissions ``(ts, value, final)`` — final=True for expired slots,
    False for live updates, ordered expired-first like the reference's
    (updated, expired) pair.
    """
    updated: dict[int, float] = {}
    expired: list[tuple[int, float, bool]] = []
    for ts, value in points:
        step = ts // precision
        if epoch is None:
            epoch = step
        if step > epoch:
            # advance: expire the oldest min(delta, capacity) live slots
            cutoff = step - capacity
            for old in sorted(s for s in slots if s <= cutoff):
                expired.append((old * precision, slots.pop(old), True))
                updated.pop(old, None)
            epoch = step
            slots[step] = value
            updated[step] = value
        elif step > epoch - capacity:
            # slot replace; emit only on change (reference :183-186)
            if slots.get(step) != value:
                updated[step] = value
            slots[step] = value
        # else: older than the buffer window -> silently dropped (:180)
    live = [(s * precision, v, False) for s, v in sorted(updated.items())]
    return epoch, expired + live


def flush_slots(
    slots: dict[int, float], precision: int
) -> list[tuple[int, float, bool]]:
    """Emit every live slot as final (state-TTL flush / shutdown drain)."""
    return [(s * precision, v, True) for s, v in sorted(slots.items())]


OUTPUT_SCHEMA = "name string, ts long, value double, final boolean"
STATE_SCHEMA = "epoch long, steps array<long>, vals array<double>"


def downsample_stage0_stateful(
    points_stream: DataFrame,
    stage0: Stage,
    capacity: int = CAPACITY,
    idle_timeout_s: int | None = None,
) -> DataFrame:
    """The ring buffer as a streaming operator over (name, ts long, value).

    Output rows: (name, ts, value, final) — final rows are safe to fold into
    coarser stages; non-final rows are live re-emissions the sink should
    upsert (Delta MERGE / PointStore overwrite-by-partition).
    """
    import pandas as pd

    precision = stage0.precision

    def fn(key: tuple, pdfs: Iterator["pd.DataFrame"], state: GroupState):
        (name,) = key
        if state.exists:
            epoch, steps, vals = state.get
            slots = dict(zip(steps, vals))
        else:
            epoch, slots = None, {}

        if state.hasTimedOut:
            out = flush_slots(slots, precision)
            state.remove()
        else:
            points: list[tuple[int, float]] = []
            for pdf in pdfs:
                points.extend(
                    zip(pdf["ts"].astype("int64"), pdf["value"].astype("float64"))
                )
            epoch, out = feed_slots(epoch, slots, points, precision, capacity)
            state.update((epoch, list(slots.keys()), list(slots.values())))
            if idle_timeout_s is not None:
                state.setTimeoutDuration(idle_timeout_s * 1000)

        if out:
            yield pd.DataFrame(
                {
                    "name": [name] * len(out),
                    "ts": [ts for ts, _, _ in out],
                    "value": [v for _, v, _ in out],
                    "final": [f for _, _, f in out],
                }
            )

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_s is not None
        else GroupStateTimeout.NoTimeout
    )
    return points_stream.groupBy("name").applyInPandasWithState(
        fn, OUTPUT_SCHEMA, STATE_SCHEMA, "update", timeout
    )
