"""Registry-wide physical-plan lint: every contract query's plan must be
free of scale-killers, mechanically.

Built on the same checks as scripts/plan_audit.py, but as a pytest gate so
a regression (a join losing its broadcast hint and going cartesian, a
Python UDF slipping into a hot path) fails CI instead of waiting for a
human to re-read plans.  Asserted for ALL registered queries:

- no ``CartesianProduct`` — unbounded pair blowup at scale;
- no ``BatchEvalPython`` — row-at-a-time (non-Arrow) Python UDF;
- ``BroadcastNestedLoopJoin`` only in the whitelist below, where each
  entry is a single-row scalar cross-join (corpus totals / thresholds) or
  the documented brute-force baseline whose scale path is a separate
  bucketed query.

SortMergeJoin is deliberately NOT asserted: whether a join broadcasts is
size-dependent and AQE re-plans it at runtime; plan_audit.py reports them
for human review instead.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

import pytest

SF_DIR = "/root/testdata/sf0.001"

#: queries allowed a BroadcastNestedLoopJoin, and why it is benign there:
#: "scalar" = crossJoin(broadcast(<single-row aggregate>)) — corpus totals,
#: thresholds, vocabulary size; "baseline" = intentional query-batch x
#: corpus scan kept as the exact baseline for a bucketed scale path.
BNLJ_WHITELIST = {
    "doc_bigram_lm": "scalar",      # unigram total N
    "doc_bm25": "scalar",           # corpus avgdl/N + broadcast query row
    "doc_collocations": "scalar",   # n_uni/n_pair totals
    "doc_dataset_card": "scalar",   # single-row dup-rate/vocab cross-joins
    "doc_mix_weights": "scalar",    # normalization constant Z
    "doc_nb_lang": "scalar",        # vocab size V + doc total n
    "doc_perplexity": "scalar",     # unigram total
    "emb_ann_recall": "baseline",   # brute-force truth side of recall@k
    "emb_cosine_topk": "baseline",  # documented exact baseline (IVF/LSH = scale path)
    "emb_truncate_recall": "baseline",  # truncated + full brute-force rankings
    "emb_rp_recall": "baseline",    # random-projection + full brute-force rankings
    "gr_render_misc": "scalar",     # aggregateLine/constantLine scalar joins
    "tpch_q11": "scalar",           # global threshold broadcast
    "tpch_q22": "scalar",           # avg balance threshold broadcast
}


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def registry():
    import __spark_entry__ as entrymod

    return entrymod.queries()


def test_no_plan_scale_killers(spark, registry):
    failures = []
    unexpected_bnlj = []
    for name, fn in registry.items():
        try:
            text = _plan(fn(spark, SF_DIR))
        except Exception as exc:  # a query failing to BUILD is itself a failure
            failures.append(f"{name}: plan build raised {type(exc).__name__}: {exc}")
            continue
        if "CartesianProduct" in text:
            failures.append(f"{name}: CartesianProduct in physical plan")
        if "BatchEvalPython" in text:
            failures.append(f"{name}: row-at-a-time Python UDF (BatchEvalPython)")
        if "BroadcastNestedLoopJoin" in text and name not in BNLJ_WHITELIST:
            unexpected_bnlj.append(name)
        spark.catalog.clearCache()
    assert not failures, "\n".join(failures)
    assert not unexpected_bnlj, (
        "BroadcastNestedLoopJoin outside the whitelist (new scalar cross-join? "
        "add it with a reason, or fix the join): " + ", ".join(unexpected_bnlj)
    )


def test_bnlj_whitelist_has_no_stale_entries(spark, registry):
    stale = [n for n in BNLJ_WHITELIST if n not in registry]
    assert not stale, f"whitelisted queries no longer registered: {stale}"
