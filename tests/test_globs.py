"""Glob-semantics golden corpus.

The corpus and expected matches are the reference's driver contract suite
(tests/drivers/base_test_metadata.py:29-157), reproduced in FIXTURES.md §1a.
These tests exercise the authoritative regex; the pushdown-plan tests check
that the prefilter never *excludes* a true match (two-phase contract,
glob_utils.py:367-370).
"""

import pytest

from biggraphite_spark.globs import (
    ComponentPlan,
    GlobError,
    compile_glob,
    glob_match,
    glob_to_regex,
)

CORPUS = [
    "a", "a.a", "a.b", "a.a.a", "a.b.c", "a.x.y", "x.y.z", "x.y.y.z",
    "x.y.y.y.z",
    "super", "superb", "supercomputer", "superconductivity", "superman",
    "supper", "suppose",
    "ad.o.g", "af.o.g", "ap.o.g", "az.o.g", "b.o.g", "m.o.g",
    "zd.o.g", "zf.o.g", "zp.o.g", "zz.o.g",
    "-b-.a.t", "-c-.a.t", "-d-.a.t", "-e-.a.t",
]


def matches(pattern):
    return sorted(n for n in CORPUS if glob_match(pattern, n))


GOLDEN = [
    ("a.a", ["a.a"]),
    ("A", []),
    ("a", ["a"]),
    ("a.b", ["a.b"]),
    ("?", ["a"]),
    ("sup?er", ["supper"]),
    ("su*er", ["super", "supercomputer", "supper"]),
    ("su*per*", ["super", "superb", "supercomputer", "superconductivity",
                 "superman", "supper"]),
    ("?.o.g", ["b.o.g", "m.o.g"]),
    ("*.o.g", ["ad.o.g", "af.o.g", "ap.o.g", "az.o.g", "b.o.g", "m.o.g",
               "zd.o.g", "zf.o.g", "zp.o.g", "zz.o.g"]),
    ("?*.o.g", ["ad.o.g", "af.o.g", "ap.o.g", "az.o.g", "b.o.g", "m.o.g",
                "zd.o.g", "zf.o.g", "zp.o.g", "zz.o.g"]),
    ("a[!dfp].o.g", ["az.o.g"]),
    ("a[dfp].o.g", ["ad.o.g", "af.o.g", "ap.o.g"]),
    ("[a-z]d.o.g", ["ad.o.g", "zd.o.g"]),
    ("a.{b,x}.{c,y}", ["a.b.c", "a.x.y"]),
    ("{a{d,f,p},z{d,f,p}}.o.g",
     ["ad.o.g", "af.o.g", "ap.o.g", "zd.o.g", "zf.o.g", "zp.o.g"]),
    ("-{b,c,d}*.a.t{,u}{,v}{,w}{,x}{,y}{,z}", ["-b-.a.t", "-c-.a.t", "-d-.a.t"]),
    ("**", sorted(CORPUS)),
    ("x.**", ["x.y.y.y.z", "x.y.y.z", "x.y.z"]),
    ("x.**.z", ["x.y.y.y.z", "x.y.y.z", "x.y.z"]),
    ("", []),
]


@pytest.mark.parametrize("pattern,expected", GOLDEN, ids=[g[0] or "<empty>" for g in GOLDEN])
def test_golden_glob_matches(pattern, expected):
    assert matches(pattern) == expected


def test_reject_double_globstar():
    with pytest.raises(GlobError):
        compile_glob("a.**.b.**")


def test_reject_too_many_components():
    with pytest.raises(GlobError):
        compile_glob(".".join(["a"] * 65))


def test_reject_unclosed():
    with pytest.raises(GlobError):
        compile_glob("a.{b,c")
    with pytest.raises(GlobError):
        compile_glob("a.[bc")


def test_regex_translation_table():
    # reference glob_utils.py:165-211
    assert glob_to_regex("a.*.c") == r"a\.[^.]*\.c"
    assert glob_to_regex("a.**") == r"a\..*"
    assert glob_to_regex("a?") == r"a[^.]"
    assert glob_to_regex("{a,b}") == r"(?:a|b)"


# ---------------------------------------------------------------------------
# Pushdown plans
# ---------------------------------------------------------------------------

def test_fully_literal_shortcut():
    # reference: drivers/cassandra.py:2100-2113 (point lookup, no glob eval)
    plan = compile_glob("a.b.c")
    assert plan.fully_literal == "a.b.c"
    assert plan.depth_exact == 2
    plan = compile_glob("a.{b}.c")
    assert plan.fully_literal == "a.b.c"
    assert compile_glob("a.*.c").fully_literal is None


def test_component_plans():
    plan = compile_glob("a.{b,x}.su*")
    kinds = {p.index: (p.kind, p.values) for p in plan.components}
    assert kinds[0] == ("literal", ("a",))
    assert kinds[1] == ("enum", ("b", "x"))
    assert kinds[2] == ("prefix", ("su",))
    assert plan.depth_exact == 2


def test_globstar_depth_bounds():
    plan = compile_glob("x.**.z")
    assert plan.has_globstar and plan.depth_exact is None and plan.depth_min == 2
    # components before the globstar still push down
    assert plan.components[0] == ComponentPlan(0, "literal", ("x",))
    assert compile_glob("**").depth_min == 0
    assert compile_glob("x.**").depth_min == 1


def test_class_enumeration_pushdown():
    plan = compile_glob("[a-c]d.o.g")
    assert plan.components[0].kind == "enum"
    assert plan.components[0].values == ("ad", "bd", "cd")


def test_pushdown_never_excludes_true_match():
    """Two-phase contract: prefilter is may-match, regex is authoritative."""
    patterns = [g[0] for g in GOLDEN if g[0]]
    for pattern in patterns:
        plan = compile_glob(pattern)
        rx = plan.compiled()
        for name in CORPUS:
            if not rx.fullmatch(name):
                continue
            comps = name.split(".")
            depth = len(comps) - 1
            if plan.depth_exact is not None:
                assert depth == plan.depth_exact, (pattern, name)
            if plan.depth_min is not None:
                assert depth >= plan.depth_min, (pattern, name)
            for cp in plan.components:
                assert cp.index < len(comps), (pattern, name)
                comp = comps[cp.index]
                if cp.kind == "literal":
                    assert comp == cp.values[0], (pattern, name)
                elif cp.kind == "enum":
                    assert comp in cp.values, (pattern, name)
                elif cp.kind == "prefix":
                    assert comp.startswith(cp.values[0]), (pattern, name)
