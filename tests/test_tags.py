"""Matcher-semantics corpus for the seriesByTag surface.

The reference's TagDB is fully stubbed (plugins/tags.py:57,68 return []);
the spec is its find_series docstring (tags.py:40-56).  These tests pin
each documented rule: the four matcher kinds, regex anchoring at the start
of the value, the empty-value-matches-missing-tag rule, and the ≥1
non-empty-requiring-spec validation — plus the series codec round-trip and
the tag/value listings.
"""

from __future__ import annotations

import pytest

from biggraphite_spark.model import InvalidArgumentError
from biggraphite_spark.operators.tags import (
    canonicalize_series,
    find_series,
    format_series,
    list_tags,
    parse_series,
    parse_tag_spec,
    parse_tag_specs,
    tag_values,
    with_tags,
)

CORPUS = [
    "disk.used;datacenter=dc1;rack=a1",
    "disk.used;datacenter=dc1;rack=a2;ssd=true",
    "disk.used;datacenter=dc2;rack=b1",
    "disk.free;datacenter=dc1;rack=a1",
    "cpu.idle;datacenter=dc2",
    "cpu.idle",  # untagged series: only the implicit name tag
]


@pytest.fixture(scope="module")
def tagged(spark):
    df = spark.createDataFrame([(s,) for s in CORPUS], ["series"])
    return with_tags(df).cache()


def _find(tagged_df, specs):
    return [r["series"] for r in find_series(tagged_df, specs).collect()]


# -- spec parsing ------------------------------------------------------------

def test_parse_tag_spec_ops():
    assert parse_tag_spec("a=b") == ("a", "=", "b")
    assert parse_tag_spec("a!=b") == ("a", "!=", "b")
    assert parse_tag_spec("a=~b.*") == ("a", "=~", "b.*")
    assert parse_tag_spec("a!=~b.*") == ("a", "!=~", "b.*")
    assert parse_tag_spec("a=") == ("a", "=", "")


@pytest.mark.parametrize("bad", ["", "=v", "a;b=v", "a!b", "a=~[", "!=v"])
def test_parse_tag_spec_rejects(bad):
    with pytest.raises(InvalidArgumentError):
        parse_tag_spec(bad)


def test_at_least_one_nonempty_required():
    # every one of these matches the empty value, so the set is rejected
    # (tags.py:50): = with empty spec, != with non-empty spec, =~ matching
    # '', !=~ not matching ''
    with pytest.raises(InvalidArgumentError):
        parse_tag_specs(["ssd=", "rack!=zz", "datacenter=~.*", "rack!=~a"])
    # one non-empty-requiring spec legitimizes the rest
    assert len(parse_tag_specs(["ssd=", "datacenter=dc1"])) == 2
    with pytest.raises(InvalidArgumentError):
        parse_tag_specs([])


# -- matcher semantics -------------------------------------------------------

def test_exact_match(tagged):
    assert _find(tagged, ["datacenter=dc1"]) == [
        "disk.free;datacenter=dc1;rack=a1",
        "disk.used;datacenter=dc1;rack=a1",
        "disk.used;datacenter=dc1;rack=a2;ssd=true",
    ]


def test_name_is_implicit_tag(tagged):
    assert _find(tagged, ["name=cpu.idle"]) == [
        "cpu.idle",
        "cpu.idle;datacenter=dc2",
    ]


def test_not_equal_includes_missing_tag(tagged):
    # rack!=a1 matches series whose rack is NOT a1 — including series with
    # no rack tag at all (missing = empty ≠ 'a1')
    got = _find(tagged, ["name=~.+", "rack!=a1"])
    assert "cpu.idle" in got and "disk.used;datacenter=dc2;rack=b1" in got
    assert "disk.used;datacenter=dc1;rack=a1" not in got


def test_regex_anchored_at_start_only(tagged):
    # 'a' matches a1/a2 by prefix (re.match), but not b1
    assert _find(tagged, ["rack=~a"]) == [
        "disk.free;datacenter=dc1;rack=a1",
        "disk.used;datacenter=dc1;rack=a1",
        "disk.used;datacenter=dc1;rack=a2;ssd=true",
    ]
    # '1' is NOT a substring match: no rack starts with '1'
    assert _find(tagged, ["rack=~1"]) == []


def test_negative_regex(tagged):
    got = _find(tagged, ["datacenter=~dc", "rack!=~a"])
    assert got == [
        "cpu.idle;datacenter=dc2",
        "disk.used;datacenter=dc2;rack=b1",
    ]


def test_empty_value_spec_matches_missing_tag(tagged):
    # ssd= requires the ssd tag to be absent (or empty)
    got = _find(tagged, ["name=~disk", "ssd="])
    assert got == [
        "disk.free;datacenter=dc1;rack=a1",
        "disk.used;datacenter=dc1;rack=a1",
        "disk.used;datacenter=dc2;rack=b1",
    ]


def test_regex_matching_empty_includes_missing_tag(tagged):
    # '.*' matches the empty value, so series without the tag qualify too
    got = _find(tagged, ["name=~disk", "ssd=~.*"])
    assert len(got) == 4  # every disk.* series


def test_conjunction(tagged):
    assert _find(tagged, ["datacenter=dc1", "rack=a2", "ssd=true"]) == [
        "disk.used;datacenter=dc1;rack=a2;ssd=true"
    ]


# -- series codec ------------------------------------------------------------

def test_parse_series_roundtrip():
    path, tags = parse_series("disk.used;rack=a1;datacenter=dc1")
    assert path == "disk.used"
    assert tags == {"rack": "a1", "datacenter": "dc1"}
    # canonical form sorts by key
    assert format_series(path, tags) == "disk.used;datacenter=dc1;rack=a1"


def test_canonicalize_series():
    assert (
        canonicalize_series("m;z=1;a=2") == "m;a=2;z=1"
    )
    assert canonicalize_series("m") == "m"
    # values may contain '=' (split on the first one only)
    assert canonicalize_series("m;k=a=b") == "m;k=a=b"
    with pytest.raises(InvalidArgumentError):
        parse_series(";k=v")
    with pytest.raises(InvalidArgumentError):
        parse_series("m;novalue")


def test_with_tags_value_with_equals(spark):
    df = with_tags(spark.createDataFrame([("m;k=a=b;j=x",)], ["series"]))
    row = df.collect()[0]
    assert row["tags"]["k"] == "a=b" and row["tags"]["j"] == "x"
    assert row["tags"]["name"] == "m"


# -- listings ----------------------------------------------------------------

def test_list_tags(tagged):
    rows = {r["tag"]: r["series_count"] for r in list_tags(tagged).collect()}
    assert rows == {
        "name": 6, "datacenter": 5, "rack": 4, "ssd": 1,
    }
    only = [r["tag"] for r in list_tags(tagged, tag_filter="^ra").collect()]
    assert only == ["rack"]


def test_tag_values(tagged):
    rows = tag_values(tagged, tag="rack").collect()
    assert [(r["value"], r["series_count"]) for r in rows] == [
        ("a1", 2), ("a2", 1), ("b1", 1),
    ]
    filt = tag_values(tagged, tag="rack", value_filter="^a").collect()
    assert [r["value"] for r in filt] == ["a1", "a2"]


def test_list_tags_and_values_limit(tagged):
    only = [r["tag"] for r in list_tags(tagged, limit=2).collect()]
    assert only == ["datacenter", "name"]  # sorted, then capped
    vals = tag_values(tagged, tag="rack", limit=2).collect()
    assert [r["value"] for r in vals] == ["a1", "a2"]


# -- hardening ---------------------------------------------------------------

def test_with_tags_duplicate_key_last_wins(spark):
    # parse_series documents last-wins for 'm;k=1;k=2'; the Column path must
    # agree (and must not throw under mapKeyDedupPolicy=EXCEPTION)
    df = with_tags(spark.createDataFrame([("m;k=1;k=2;j=x",)], ["series"]))
    row = df.collect()[0]
    assert row["tags"]["k"] == "2"
    assert row["tags"]["j"] == "x"
    p, t = parse_series("m;k=1;k=2;j=x")
    assert t["k"] == "2"  # both codecs agree


@pytest.mark.parametrize(
    "bad", ["a=~(?P<n>x)", "a=~(?P=n)", "a=~x(?#c)", "a=~(?(1)y)", r"a=~x\Z"]
)
def test_python_only_regex_rejected(bad):
    # matching executes on the JVM: Python-only constructs must be caught
    # at parse time, not blow up inside an executor
    with pytest.raises(InvalidArgumentError):
        parse_tag_spec(bad)


def test_tag_store_upsert_and_delete(spark, tmp_path):
    from biggraphite_spark.operators.tags import TagStore

    store = TagStore(spark, str(tmp_path / "tagdb"))
    out = store.tag_multi_series(["m;b=2;a=1", "n;x=9"])
    assert out == ["m;a=1;b=2", "n;x=9"]  # canonicalized (sorted tags)
    # idempotent re-upsert: no duplicate rows
    store.tag_series("m;a=1;b=2")
    assert sorted(r["series"] for r in store._existing().collect()) == [
        "m;a=1;b=2", "n;x=9",
    ]
    # the stored catalog is query-ready
    assert [r["series"] for r in find_series(store.series(), ["a=1"]).collect()] == [
        "m;a=1;b=2"
    ]
    # delete rewrites without the tombstoned series
    assert store.del_series(["n;x=9"])
    assert [r["series"] for r in store._existing().collect()] == ["m;a=1;b=2"]


def test_tag_store_concurrent_upserts_no_duplicates(spark, tmp_path):
    # two threads upserting the same new series must not double-append:
    # the write lock serializes the anti-join-then-append critical section
    import threading as _threading

    from biggraphite_spark.operators.tags import TagStore

    store = TagStore(spark, str(tmp_path / "tagdb"))
    barrier = _threading.Barrier(2)

    def upsert():
        barrier.wait()
        store.tag_multi_series(["race;k=1", "race2;k=2"])

    ts = [_threading.Thread(target=upsert) for _ in range(2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    rows = [r["series"] for r in store._existing().collect()]
    assert sorted(rows) == ["race2;k=2", "race;k=1"]


def test_tagged_carbon_ingest_to_tag_query(spark, tmp_path):
    # graphite's carbon protocol carries tagged series as
    # 'path;k=v;... value ts'; the ingest path canonicalizes (tags sorted)
    # into the TagStore, and seriesByTag finds them — S5 -> S10 -> S9
    from biggraphite_spark.operators.tags import TagStore
    from biggraphite_spark.sources.carbon import parse_lines

    lines = spark.createDataFrame(
        [
            ("disk.used;rack=a1;datacenter=dc1 42.0 1700000000",),
            ("cpu.idle 7.0 1700000000",),
            ("bad line",),
        ],
        ["value"],
    )
    pts = parse_lines(lines)
    names = sorted(r["name"] for r in pts.select("name").distinct().collect())
    assert names == ["cpu.idle", "disk.used;rack=a1;datacenter=dc1"]

    store = TagStore(spark, str(tmp_path / "tagdb"))
    canon = store.tag_multi_series(names)
    assert "disk.used;datacenter=dc1;rack=a1" in canon  # sorted tags
    found = [
        r["series"]
        for r in find_series(store.series(), ["datacenter=dc1"]).collect()
    ]
    assert found == ["disk.used;datacenter=dc1;rack=a1"]


def test_tag_store_compaction(spark, tmp_path):
    """N upsert batches accrete N append deltas (small-files problem);
    compact() folds them into one dense file set with identical reads."""
    import glob as _glob

    from biggraphite_spark.operators.tags import TagStore

    path = str(tmp_path / "tagdb")
    store = TagStore(spark, path)
    for i in range(6):
        store.tag_multi_series([f"m{i};dc=east;host=h{i}", f"n{i};dc=west"])
    before = sorted(r["series"] for r in store.series().collect())
    files_before = len(_glob.glob(path + "/part-*"))
    assert files_before >= 6  # one-plus files per append batch

    nfiles = store.compact()
    assert nfiles == 1  # 12 rows << rows-per-file target
    files_after = len(_glob.glob(path + "/part-*"))
    assert files_after == 1
    after = sorted(r["series"] for r in store.series().collect())
    assert after == before

    # the store stays writable after a compaction (lock released, path live)
    store.tag_series("p;dc=north")
    assert "p;dc=north" in {r["series"] for r in store.series().collect()}
