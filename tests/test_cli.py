"""bgutil-style CLI smoke coverage: every subcommand end-to-end on sf0.001.

Reference surface: cli/commands.py (read/list/du/stats/clean/repair/write/
delete/copy/syncdb); this drives main(argv) exactly as a shell user would.
"""

import os

import pytest

from biggraphite_spark.cli import main

SF = "/root/testdata/sf0.001"


def _run(capsys, *argv) -> str:
    assert main(["--sf-dir", SF, *argv]) == 0
    return capsys.readouterr().out


def test_list_and_read(spark, capsys):
    names = _run(capsys, "list", "bg.click.u*").splitlines()
    assert names == sorted(names) and names
    assert all(n.startswith("bg.click.u") for n in names)

    out = _run(capsys, "read", names[0], "--limit", "5")
    header = out.splitlines()[0]
    assert header.startswith("# start=") and "step=" in header

    # invalid glob -> exit 2, error on stderr
    assert main(["--sf-dir", SF, "list", "bg.{a,b"]) == 2


def test_du_stats_clean(spark, capsys):
    assert "namespace" in _run(capsys, "du")
    assert "namespace" in _run(capsys, "stats")
    out = _run(capsys, "clean", "--max-age-days", "36500")
    assert "# expired metrics" in out and "# empty directories" in out
    assert "directories:" in _run(capsys, "repair")


def test_info_and_test(spark, capsys):
    names = _run(capsys, "list", "bg.click.u*").splitlines()
    out = _run(capsys, "info", names[0])
    assert f"Name:  {names[0]}" in out
    assert "aggregator" in out and "retention" in out and "xfilesfactor" in out

    # unknown metric: reference prints "doesn't exist"; we also exit nonzero
    assert main(["--sf-dir", SF, "info", "no.such.metric"]) == 1
    assert "doesn't exist" in capsys.readouterr().out

    out = _run(capsys, "test")
    assert "catalog: ok" in out and "find: ok" in out and "read: ok" in out


def test_shell(spark, capsys, monkeypatch):
    import io

    monkeypatch.setattr("sys.stdin", io.StringIO("print(eng.retention.as_string())\n"))
    out = _run(capsys, "shell")
    assert "2678400*1s:1000*3600s:100*86400s" in out


def test_write_delete_copy_syncdb(spark, capsys, tmpdir):
    out = _run(capsys, "write", "bg.error.*", "--aggregator", "maximum")
    assert "# updated" in out and "maximum" in out

    out = _run(capsys, "delete", "bg.error.*")
    assert out.startswith("# deleted") and not out.startswith("# deleted 0")

    out = _run(capsys, "copy", "--retention", "1000*3600s:100*86400s")
    assert "# stage" in out

    path = os.path.join(str(tmpdir), "store")
    out = _run(capsys, "syncdb", "--path", path)
    assert "synced" in out
    assert os.path.isdir(path)


def test_refresh_subcommand(spark, capsys, tmp_path):
    """bgutil refresh: append a fine batch, refresh the coarse stage, verify
    the coarse partitions match a recompute."""
    from biggraphite_spark.model import Stage
    from biggraphite_spark.operators.downsample import rollup_partials
    from biggraphite_spark.storage import PointStore

    store = PointStore(str(tmp_path / "s"))
    fine = Stage.from_string("1000*3600s")
    coarse = Stage.from_string("100*86400s")
    df = spark.createDataFrame(
        [("m", d * 86400 + h * 3600, 1.0, 1, "total") for d in range(3) for h in range(4)],
        "name string, ts long, value double, count long, aggregator string",
    )
    store.write(df, fine)

    out = _run(capsys, "refresh", "--path", str(tmp_path / "s"),
               "--fine", "1000*3600s", "--coarse", "100*86400s")
    assert "# refreshed 3" in out
    got = sorted(map(tuple, store.read(spark, coarse).drop("pday").collect()))
    want = sorted(map(tuple, rollup_partials(df, coarse).collect()))
    assert got == want

    # explicit day subset only touches those partitions
    out = _run(capsys, "refresh", "--path", str(tmp_path / "s"),
               "--fine", "1000*3600s", "--coarse", "100*86400s", "--days", "1")
    assert "# refreshed 1" in out


def test_refresh_default_days_cover_non_dividing_subday_coarse(
    spark, capsys, tmp_path
):
    """Coarse precision 10h does not divide 86400: fine day 1's data dirties
    coarse buckets starting at 72000 (pday 0) AND 108000/144000 (pday 1) —
    the default day list must include every overlapped bucket-start day, not
    just the day of round_down(d*86400)."""
    from biggraphite_spark.model import Stage
    from biggraphite_spark.operators.downsample import rollup_partials
    from biggraphite_spark.storage import PointStore

    store = PointStore(str(tmp_path / "s"))
    fine = Stage.from_string("1000*3600s")
    coarse = Stage.from_string("100*36000s")
    df = spark.createDataFrame(
        [("m", 86400 + h * 3600, 1.0, 1, "total") for h in range(24)],
        "name string, ts long, value double, count long, aggregator string",
    )
    store.write(df, fine)

    _run(capsys, "refresh", "--path", str(tmp_path / "s"),
         "--fine", "1000*3600s", "--coarse", "100*36000s")
    got = sorted(map(tuple, store.read(spark, coarse).drop("pday").collect()))
    want = sorted(map(tuple, rollup_partials(df, coarse).collect()))
    assert got == want


def test_expire_subcommand(spark, capsys, tmp_path):
    from biggraphite_spark.model import Stage
    from biggraphite_spark.storage import PointStore

    store = PointStore(str(tmp_path / "s"))
    st = Stage.from_string("3*86400s")
    df = spark.createDataFrame(
        [("m", d * 86400, 1.0) for d in range(10)],
        "name string, ts long, value double",
    )
    store.write(df, st)
    out = _run(capsys, "expire", "--path", str(tmp_path / "s"),
               "--now", str(10 * 86400 + 900))
    # only the configured retention's stages are swept; the 3-day stage tree
    # we wrote is not part of the dataset retention, so just check the format
    assert out.count("# ") == len(out.strip().splitlines())
    assert "dropped" in out


def test_render_subcommand(spark, capsys):
    out = _run(capsys, "render", "scale(sumSeries(bg.click.u*), 2.0)")
    lines = out.splitlines()
    assert lines[0].startswith("# start=")
    assert lines[1].split("\t")[0] == "sumSeries(bg.click.u*)"
    # bad expression -> exit 2 via the InvalidArgumentError contract
    assert main(["--sf-dir", SF, "render", "noSuchFunc(bg.click.u0)"]) == 2


def test_import_whisper_subcommand(spark, capsys, tmp_path):
    from biggraphite_spark.sources.whisper import make_wsp

    tree = tmp_path / "wsp"
    (tree / "a" / "b").mkdir(parents=True)
    blob = make_wsp([(60, 5)], [[(1200, 1.0), (1260, 2.0)]])
    (tree / "a" / "b" / "c.wsp").write_bytes(blob)

    out_dir = tmp_path / "imported"
    out = _run(capsys, "import-whisper", str(tree), "--out", str(out_dir))
    assert "# imported 1 metrics, 2 points" in out
    pts = spark.read.parquet(str(out_dir / "points"))
    assert {tuple(r) for r in pts.select("name", "ts", "value").collect()} == {
        ("a.b.c", 1200, 1.0), ("a.b.c", 1260, 2.0),
    }
    cat = spark.read.parquet(str(out_dir / "catalog")).collect()
    assert cat[0]["name"] == "a.b.c"


def test_compact_tags_subcommand(spark, capsys, tmp_path):
    """compact-tags: trigger policy skips a small store, --min-files 0
    forces the fold, and reads are identical afterwards."""
    from biggraphite_spark.operators.tags import TagStore

    path = str(tmp_path / "tagdb")
    store = TagStore(spark, path)
    # 6 upsert batches -> >= 6 appended part-file sets
    for i in range(6):
        store.tag_multi_series([f"m{i};dc=par{i % 2};app=web"])
    before = sorted(r["series"] for r in store._existing().collect())

    out = _run(capsys, "compact-tags", path)  # default --min-files 16
    assert "# skipped:" in out

    out = _run(capsys, "compact-tags", path, "--min-files", "0",
               "--target-files", "2")
    assert "-> 2" in out
    import glob

    assert len(glob.glob(os.path.join(path, "part-*"))) == 2
    after = sorted(r["series"] for r in TagStore(spark, path)._existing().collect())
    assert after == before
