"""Directory globbing (operators/find.find_directories) vs an independent
pure-Python derivation.

Reference semantics: a directory is any proper prefix of a metric name;
``glob_directory_names`` matches any glob, including ``**``, against those
prefixes (glob_utils.py:297-335; tests/drivers/base_test_metadata.py:
163-181).  The Python twin below derives prefixes by hand and filters with
the compiled regex, so the Spark plan's explode/prefix/distinct machinery
is checked against a second implementation, not against itself.
"""

import pytest

from biggraphite_spark.functions.names import with_name_structure
from biggraphite_spark.globs import compile_glob
from biggraphite_spark.operators.find import find_directories

NAMES = [
    "bg.click.u1",
    "bg.click.u2",
    "bg.view.u1",
    "bg.error.u1.deep",
    "bg.error.u1.deeper.still",
    "other.thing",
    "solo",
    "x.y",
]

PATTERNS = [
    "*",
    "bg.*",
    "bg.error.*",
    "**",
    "bg.**",
    "bg.**.deeper",
    "*.click.**",
    "nomatch.**",
]


def _expected(pattern: str) -> list[str]:
    rx = compile_glob(pattern).compiled()
    prefixes = set()
    for name in NAMES:
        parts = name.split(".")
        for n in range(1, len(parts)):  # proper prefixes only
            prefixes.add(".".join(parts[:n]))
    return sorted(p for p in prefixes if rx.fullmatch(p))


@pytest.fixture(scope="module")
def catalog(spark):
    df = spark.createDataFrame([(n,) for n in NAMES], "name string")
    return with_name_structure(df, n_components=6).cache()


@pytest.mark.parametrize("pattern", PATTERNS)
def test_matches_python_twin(catalog, pattern):
    got = [r["directory"] for r in find_directories(catalog, pattern).collect()]
    assert got == _expected(pattern), pattern


def test_empty_pattern_matches_nothing(catalog):
    assert find_directories(catalog, "").count() == 0
