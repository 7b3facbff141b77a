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
