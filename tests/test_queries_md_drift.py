"""QUERIES.md is generated from the live registry by
scripts/gen_queries_md.py — this pins the committed doc to the registry so
adding a query without regenerating (or editing the doc by hand) fails CI
instead of silently drifting."""

import importlib.util
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_queries_md_matches_registry():
    spec = importlib.util.spec_from_file_location(
        "gen_queries_md", os.path.join(ROOT, "scripts", "gen_queries_md.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    with open(os.path.join(ROOT, "QUERIES.md")) as f:
        committed = f.read()
    assert committed == mod.render(), (
        "QUERIES.md is stale — run scripts/gen_queries_md.py")
