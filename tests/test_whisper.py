"""Whisper connector: build a real .wsp tree, read it back distributed."""

import os
import shutil
import tempfile

import pytest

from biggraphite_spark.sources.whisper import (
    make_wsp,
    parse_wsp,
    whisper_metadata,
    whisper_points,
)


@pytest.fixture(scope="module")
def wsp_tree():
    root = tempfile.mkdtemp(prefix="wsp-")
    os.makedirs(os.path.join(root, "sys", "cpu"), exist_ok=True)
    blob_a = make_wsp(
        archives=[(60, 5), (300, 3)],
        points_by_archive=[
            [(60, 1.5), (120, 2.5), (180, 3.5)],
            [(300, 7.5)],
        ],
        aggregator="maximum",
        xff=0.25,
    )
    with open(os.path.join(root, "sys", "cpu", "load.wsp"), "wb") as f:
        f.write(blob_a)
    blob_b = make_wsp(
        archives=[(10, 4)],
        points_by_archive=[[(10, -1.0), (20, 0.0)]],
        aggregator="total",
    )
    with open(os.path.join(root, "sys", "mem.wsp"), "wb") as f:
        f.write(blob_b)
    yield root
    shutil.rmtree(root, ignore_errors=True)


def test_parse_wsp_roundtrip():
    blob = make_wsp([(60, 3)], [[(60, 1.0), (120, 2.0)]], aggregator="last", xff=0.9)
    meta, pts = parse_wsp(blob)
    assert meta["aggregator"] == "last"
    assert meta["retention"] == "3*60s"
    assert meta["xfilesfactor"] == pytest.approx(0.9)
    assert pts == [("3*60s", 60, 1.0), ("3*60s", 120, 2.0)]


def test_whisper_points_distributed(spark, wsp_tree):
    df = whisper_points(spark, wsp_tree)
    rows = {(r["name"], r["stage"], r["ts"]): r["value"] for r in df.collect()}
    assert rows[("sys.cpu.load", "5*60s", 120)] == 2.5
    assert rows[("sys.cpu.load", "3*300s", 300)] == 7.5
    # ts=0 slots are empty markers in whisper and must be skipped
    assert ("sys.mem", "4*10s", 0) not in rows
    assert rows[("sys.mem", "4*10s", 20)] == 0.0
    assert len({n for n, _, _ in rows}) == 2


def test_whisper_metadata(spark, wsp_tree):
    meta = {r["name"]: r for r in whisper_metadata(spark, wsp_tree).collect()}
    assert meta["sys.cpu.load"]["aggregator"] == "maximum"
    assert meta["sys.cpu.load"]["retention"] == "5*60s:3*300s"
    assert meta["sys.cpu.load"]["xfilesfactor"] == pytest.approx(0.25)
    assert meta["sys.mem"]["aggregator"] == "total"
