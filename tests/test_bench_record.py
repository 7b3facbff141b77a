"""Field order of bench.py's one-line JSON record: summary scalars first,
large maps last, so a tail-truncated record (the round-7 driver failure
mode) still carries the headline numbers."""

import json

import bench


def _record():
    return bench.build_record(
        samples={"q1": [1.5, 1.2], "q2": [0.4]},
        errors={"q3": "AnalysisException: boom"},
        chunk_loadavg=[3.2, 4.1],
        mat={"materialize_plain_sec": 7.5},
        sf_dir="/root/testdata/sf0.1",
        passes=2,
        partial=False,
    )


def test_summary_fields_precede_large_maps():
    keys = list(_record().keys())
    for scalar in (
        "metric",
        "value",
        "unit",
        "sf",
        "passes",
        "n_queries",
        "loadavg_chunks",
        "materialize_plain_sec",
        "errors",
    ):
        assert keys.index(scalar) < keys.index("queries"), scalar
    # samples is the largest map: strictly last
    assert keys[-1] == "samples"
    assert keys[-2] == "queries"


def test_record_values_and_json_order():
    out = _record()
    assert out["value"] == 1.6  # median_low(1.5,1.2)=1.2 + 0.4
    assert out["queries"] == {"q1": 1.2, "q2": 0.4}
    assert out["samples"] == {"q1": [1.5, 1.2]}
    assert out["sf"] == 0.1
    assert out["n_queries"] == 2
    # json.dumps preserves insertion order: a prefix of the emitted line
    # up to '"queries"' contains every summary scalar
    line = json.dumps(out)
    prefix = line.split('"queries"')[0]
    for field in ('"value"', '"sf"', '"loadavg_chunks"', '"errors"'):
        assert field in prefix, field


def test_compact_record_is_small_and_contract_shaped():
    # the driver parses the contract line out of a bounded tail capture
    # (BENCH_r01..r09 forensics: only r1's sub-2KB line ever parsed), so
    # the stdout line must stay inside COMPACT_BUDGET for the REAL
    # registry's names even with worst-case 4-digit-second values
    import __spark_entry__ as entrymod

    names = list(entrymod._QUERIES)
    samples = {n: [1234.567, 1234.568] for n in names}
    out = bench.build_record(
        samples=samples,
        errors={},
        chunk_loadavg=[3.2] * 6,
        mat={"materialize_plain_sec": 7.5},
        sf_dir="/root/testdata/sf0.1",
        passes=2,
        partial=False,
    )
    line = bench.compact_record(out)
    assert len(line) <= bench.COMPACT_BUDGET
    parsed = json.loads(line)
    assert parsed["metric"] == "headline_queries_total_wall"
    assert parsed["unit"] == "sec"
    assert parsed["sf"] == 0.1
    assert set(parsed["queries"]) == set(names)
    # budget degradation may round as far as whole seconds but never
    # drops a query
    assert abs(parsed["queries"][names[0]] - 1234.567) < 1.0
    # no audit-only fields on the contract line
    for absent in ("samples", "loadavg_chunks", "passes"):
        assert absent not in parsed


def test_compact_record_keeps_errors_and_partial():
    out = bench.build_record(
        samples={"q1": [1.5]},
        errors={"q2": "AnalysisException: " + "x" * 300},
        chunk_loadavg=[],
        mat={},
        sf_dir="/root/testdata/sf0.1",
        passes=1,
        partial=True,
        skipped={"q3": "scale_domain max_sf=1: quadratic baseline " + "y" * 100},
    )
    line = bench.compact_record(out)
    parsed = json.loads(line)
    assert parsed["partial"] is True
    assert list(parsed["errors"]) == ["q2"]
    assert len(parsed["errors"]["q2"]) <= 60
    assert list(parsed["skipped"]) == ["q3"]
    assert len(parsed["skipped"]["q3"]) <= 60
    assert parsed["queries"] == {"q1": 1.5}
