"""Distributed BPE trainer vs an independent plain-Python reference.

The golden below is the textbook Sennrich trainer written from scratch on
the raw parquet (pyarrow + collections, no Spark, no shared code): same
whitespace tokenization, same end-of-word marker, same greedy in-word merge,
same (count DESC, pair ASC) tie-break.  The learned merge SEQUENCES must
match exactly — order included — and so must the final vocabulary.
"""

import collections

import pyarrow.parquet as pq

SF_DIR = "/root/testdata/sf0.001"
EOW = "</w>"
N_MERGES = 10


def _python_bpe(path: str, n_merges: int):
    table = pq.read_table(path, columns=["text"])
    freqs = collections.Counter()
    for text in table.column("text").to_pylist():
        for w in text.split(" "):
            if w:
                freqs[w] += 1
    words = {w: tuple(list(w) + [EOW]) for w in freqs}

    merges = []
    for rank in range(n_merges):
        pair_counts = collections.Counter()
        for w, syms in words.items():
            f = freqs[w]
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] += f
        if not pair_counts:
            break
        # count DESC, then lexicographic pair ASC
        (left, right), n = min(
            pair_counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        if n < 2:
            break
        merges.append((rank, left, right))
        new_words = {}
        for w, syms in words.items():
            out = []
            for s in syms:
                if out and out[-1] == left and s == right:
                    out[-1] = left + right
                else:
                    out.append(s)
            new_words[w] = tuple(out)
        words = new_words

    vocab = collections.Counter()
    for w, syms in words.items():
        for s in syms:
            vocab[s] += freqs[w]
    return merges, words, vocab


def test_learn_bpe_matches_python_reference(spark):
    from biggraphite_spark.operators.bpe import bpe_vocab, learn_bpe

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got_merges, words_df = learn_bpe(docs, n_merges=N_MERGES)
    want_merges, want_words, want_vocab = _python_bpe(
        f"{SF_DIR}/documents.parquet", N_MERGES
    )

    assert got_merges == want_merges  # sequence AND order

    # final symbol sequences agree for every word
    got_words = {
        r["word"]: tuple(r["symbols"]) for r in words_df.collect()
    }
    assert got_words == want_words

    # and so does the weighted vocabulary
    got_vocab = {r["symbol"]: r["n"] for r in bpe_vocab(words_df).collect()}
    assert got_vocab == dict(want_vocab)


def test_bpe_token_counts_match_python(spark):
    from biggraphite_spark.operators.bpe import bpe_token_counts, learn_bpe

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    _merges, words_df = learn_bpe(docs, n_merges=N_MERGES)
    got = {
        r["doc_id"]: (r["n_words"], r["n_tokens"])
        for r in bpe_token_counts(docs, words_df).collect()
    }

    _, want_words, _ = _python_bpe(f"{SF_DIR}/documents.parquet", N_MERGES)
    table = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    want = {}
    for doc_id, text in zip(
        table.column("doc_id").to_pylist(), table.column("text").to_pylist()
    ):
        ws = [w for w in text.split(" ") if w]
        want[doc_id] = (len(ws), sum(len(want_words[w]) for w in ws))
    assert got == want


def test_merge_fold_is_greedy_left_to_right(spark):
    """Overlapping pairs merge greedily: 'aaa' under (a,a) -> [aa, a], and
    the merged symbol can pair forward on the NEXT round, never backward."""
    from pyspark.sql import functions as F

    from biggraphite_spark.operators.bpe import _merge_expr

    df = spark.createDataFrame(
        [(["a", "a", "a", EOW],), (["b", "a", "a", EOW],)], "symbols array<string>"
    )
    out = [
        tuple(r[0])
        for r in df.select(_merge_expr(F.col("symbols"), "a", "a")).collect()
    ]
    assert sorted(out) == [("aa", "a", EOW), ("b", "aa", EOW)]


def test_driver_and_distributed_paths_bit_equal(spark):
    """The r11 capped driver-side merge loop must match the distributed
    per-round loop exactly: merge sequence, final symbol table, freqs.
    ``driver_max_words=0`` forces the distributed path on the same data."""
    from biggraphite_spark.operators.bpe import learn_bpe

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    m_drv, w_drv = learn_bpe(docs, n_merges=N_MERGES)
    m_dst, w_dst = learn_bpe(docs, n_merges=N_MERGES, driver_max_words=0)
    assert m_drv == m_dst
    drv = {
        r["word"]: (r["freq"], tuple(r["symbols"])) for r in w_drv.collect()
    }
    dst = {
        r["word"]: (r["freq"], tuple(r["symbols"])) for r in w_dst.collect()
    }
    assert drv == dst
