"""Stateful stage0 ring-buffer operator (streaming/stateful.py).

Kernel goldens mirror the behaviors the reference pins in
tests/drivers/test_drivers_downsampling.py (overwrite, eviction on advance,
out-of-order drop, capacity overflow); the streaming test drives the same
kernel through applyInPandasWithState end to end.
"""

import os

from pyspark.sql import functions as F

from biggraphite_spark.model import Stage
from biggraphite_spark.streaming.stateful import (
    downsample_stage0_stateful,
    feed_slots,
    flush_slots,
)


def run(points, precision=10, capacity=4, epoch=None, slots=None):
    slots = {} if slots is None else slots
    epoch, out = feed_slots(epoch, slots, points, precision, capacity)
    return epoch, slots, out


def test_slot_overwrite_emits_on_change_only():
    epoch, slots, out = run([(0, 1.0), (1, 2.0)])
    assert slots == {0: 2.0}
    assert out == [(0, 2.0, False)]  # one update, last write wins
    # same value again -> no emission at all
    epoch, slots, out = run([(5, 2.0)], epoch=epoch, slots=slots)
    assert out == []


def test_advance_expires_oldest_slots():
    epoch, slots, out = run([(0, 1.0), (10, 2.0), (20, 3.0), (30, 4.0)])
    assert len(slots) == 4
    # step 4 arrives: window (0..3] slides to (0..4], step 0 expires as final
    epoch, slots, out = run([(40, 5.0)], epoch=epoch, slots=slots)
    assert out == [(0, 1.0, True), (40, 5.0, False)]
    assert 0 not in slots and slots[4] == 5.0


def test_jump_beyond_capacity_expires_everything():
    epoch, slots, out = run([(0, 1.0), (10, 2.0)])
    epoch, slots, out = run([(1000, 9.0)], epoch=epoch, slots=slots)
    assert [(ts, v) for ts, v, f in out if f] == [(0, 1.0), (10, 2.0)]
    assert slots == {100: 9.0}


def test_too_old_point_silently_dropped():
    epoch, slots, out = run([(100, 1.0)])
    # capacity 4 at epoch step 10: anything at step <= 6 is outside the ring
    epoch, slots, out = run([(60, 7.0)], epoch=epoch, slots=slots)
    assert out == [] and 6 not in slots
    # but step 7 (exactly capacity-1 behind) still lands
    epoch, slots, out = run([(70, 8.0)], epoch=epoch, slots=slots)
    assert out == [(70, 8.0, False)]


def test_flush_emits_all_live_slots_final():
    epoch, slots, _ = run([(0, 1.0), (30, 4.0)])
    assert flush_slots(slots, 10) == [(0, 1.0, True), (30, 4.0, True)]


def test_stateful_streaming_matches_kernel(spark, tmp_path):
    """Two micro-batches through applyInPandasWithState reproduce the kernel:
    batch 2 overwrites a live slot and expires the oldest one."""
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    schema = "name string, ts long, value double"
    b1 = [("m", 0, 1.0), ("m", 10, 2.0), ("m", 20, 3.0), ("m", 30, 4.0), ("n", 0, 5.0)]
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("append").parquet(in_dir)

    stage0 = Stage.from_string("100*10s_0")
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(in_dir)
    out = downsample_stage0_stateful(stream, stage0, capacity=4)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("ring_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got1 = {
            (r["name"], r["ts"], r["value"], r["final"])
            for r in spark.sql("SELECT * FROM ring_out").collect()
        }
        assert got1 == {
            ("m", 0, 1.0, False), ("m", 10, 2.0, False),
            ("m", 20, 3.0, False), ("m", 30, 4.0, False),
            ("n", 0, 5.0, False),
        }

        b2 = [("m", 15, 9.0), ("m", 40, 6.0)]
        spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(in_dir)
        q.processAllAvailable()
        got2 = {
            (r["name"], r["ts"], r["value"], r["final"])
            for r in spark.sql("SELECT * FROM ring_out").collect()
        } - got1
        assert got2 == {
            ("m", 10, 9.0, False),  # slot overwrite, emitted slot-aligned
            ("m", 0, 1.0, True),    # oldest slot expired by the advance
            ("m", 40, 6.0, False),
        }
    finally:
        q.stop()
