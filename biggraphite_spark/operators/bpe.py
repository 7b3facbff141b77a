"""Distributed BPE vocabulary learning (Sennrich et al. 2016).

Beyond-reference operator: learn byte-pair-encoding merges from a document
corpus with Spark doing the heavy counting.  The classic trainer iterates:
count adjacent symbol pairs over the (word, frequency) table, merge the most
frequent pair everywhere, repeat.  Here each round is two tiny Spark jobs:

1. pair counts  — explode adjacent pairs weighted by word frequency, one
   hash aggregation, argmax with a deterministic tie-break (count DESC,
   then lexicographic pair ASC);
2. merge apply  — a built-in ``aggregate`` fold over each word's symbol
   array replaces adjacent (left, right) with the merged symbol, greedy
   left-to-right exactly like the reference algorithm.

Scale shape: the state is the DISTINCT-word table (vocabulary-sized, not
corpus-sized — the one aggregation over raw text happens once up front), so
a 100 TB corpus trains from a few-million-row frequency table; each round
shuffles only that.  ``localCheckpoint`` truncates lineage per round —
without it every round's fold nests inside the previous round's expression
tree and analysis cost grows quadratically in merges.

The merge sequence is pinned bit-for-bit by an independent plain-Python
trainer in tests/test_bpe.py (same corpus, zero shared code).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: end-of-word marker, kept distinct from any real character sequence
EOW = "</w>"


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over whitespace-split text — the only corpus-sized job."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _initial_symbols(word: Column) -> Column:
    """Word -> [c1, c2, ..., cn, EOW]."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length(word)), lambda i: F.substring(word, i, 1)
    )
    return F.concat(chars, F.array(F.lit(EOW)))


def _merge_expr(symbols: Column, left: str, right: str) -> Column:
    """Greedy left-to-right replacement of adjacent (left, right) with
    left+right — one ``aggregate`` fold, matching the reference trainer's
    in-word merge order (after a merge the new symbol can itself pair with
    the NEXT incoming symbol, but never re-pairs backwards)."""
    merged = left + right

    def step(acc: Column, s: Column) -> Column:
        prev = F.try_element_at(acc, F.lit(-1))
        do_merge = (
            (F.size(acc) > 0) & (prev == F.lit(left)) & (s == F.lit(right))
        )
        return F.when(
            do_merge,
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(s)))

    return F.aggregate(symbols, F.array().cast("array<string>"), step)


#: word-table size cap for the driver-side trainer: below it the merge
#: loop runs as plain Python over the collected (word, freq) table; above
#: it the distributed per-round loop keeps running.  Same capped-driver
#: pattern as ``dup_clusters``' union-find (``DRIVER_CC_MAX_EDGES``): the
#: state is vocabulary-sized by construction, so the cap routes on the
#: corpus's true vocabulary, not its size.
DRIVER_BPE_MAX_WORDS = 65536


def _driver_bpe(
    head: list, n_merges: int
) -> tuple[list[tuple[int, str, str]], list]:
    """The Sennrich merge loop driver-side over a collected (word, freq)
    table — EXACTLY the distributed loop's semantics: same pair counting
    weighted by word frequency, same (count DESC, pair lex ASC) argmax,
    same greedy left-to-right in-word merge, same ``best < 2`` stop.
    Pinned equal to the distributed loop by tests/test_bpe.py (and to the
    from-scratch reference trainer the module always carried)."""
    freqs = {w: f for w, f in head}
    words = {w: tuple(list(w) + [EOW]) for w, _ in head}
    merges: list[tuple[int, str, str]] = []
    for rank in range(n_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for w, syms in words.items():
            f = freqs[w]
            for a, b in zip(syms, syms[1:]):
                k = (a, b)
                pair_counts[k] = pair_counts.get(k, 0) + f
        if not pair_counts:
            break
        (left, right), n = min(
            pair_counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        if n < 2:
            break
        merges.append((rank, left, right))
        new_words = {}
        for w, syms in words.items():
            out: list[str] = []
            for s in syms:
                if out and out[-1] == left and s == right:
                    out[-1] = left + right
                else:
                    out.append(s)
            new_words[w] = tuple(out)
        words = new_words
    final = [(w, freqs[w], list(words[w])) for w in words]
    return merges, final


def learn_bpe(
    docs: DataFrame,
    n_merges: int = 12,
    text_col: str = "text",
    driver_max_words: int = DRIVER_BPE_MAX_WORDS,
) -> tuple[list[tuple[int, str, str]], DataFrame]:
    """Learn ``n_merges`` BPE merges; returns (merges, final word table).

    merges: [(rank, left, right)] in learned order.  The returned DataFrame
    carries (word, freq, symbols) after all merges — the input for token
    counting or vocabulary extraction.  Stops early when no pair occurs
    twice (nothing left worth merging).

    The merge loop's state is the DISTINCT-WORD table — vocabulary-sized,
    not corpus-sized — so when it fits under ``driver_max_words`` the loop
    runs driver-side in plain Python (one ``toLocalIterator`` instead of
    ``n_merges`` x (shuffle aggregation + argmax collect + checkpoint
    job): ~2n+1 Spark jobs of pure fixed overhead at any scale, since the
    word table is invariant under corpus replication).  Above the cap the
    distributed per-round loop below is the path, unchanged.  Both paths
    are pinned bit-equal in tests/test_bpe.py (merge sequence, final
    symbol table, vocabulary).
    """
    words = word_frequencies(docs, text_col)

    head: list = []
    overflow = False
    for r in words.toLocalIterator():
        head.append((r["word"], r["freq"]))
        if len(head) > driver_max_words:
            overflow = True
            break
    if not overflow:
        merges, final = _driver_bpe(head, n_merges)
        spark = docs.sparkSession
        out = spark.createDataFrame(
            final, "word string, freq long, symbols array<string>"
        )
        return merges, out

    words = words.select(
        "word", "freq", _initial_symbols(F.col("word")).alias("symbols")
    )
    words = words.localCheckpoint()

    merges: list[tuple[int, str, str]] = []
    for rank in range(n_merges):
        # filter BEFORE building the index sequence: sequence(1, 0) would
        # generate a DESCENDING [1, 0] for single-symbol words and index 0
        # is an ANSI error
        pairs = words.filter(F.size("symbols") >= 2).select(
            "freq",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("symbols") - 1),
                    lambda i: F.struct(
                        F.element_at(F.col("symbols"), i).alias("left"),
                        F.element_at(F.col("symbols"), i + 1).alias("right"),
                    ),
                )
            ).alias("pair"),
        )
        best = (
            pairs.groupBy("pair.left", "pair.right")
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.desc("n"), "left", "right")
            .limit(1)
            .collect()
        )
        if not best or best[0]["n"] < 2:
            break
        left, right = best[0]["left"], best[0]["right"]
        merges.append((rank, left, right))
        words = words.select(
            "word", "freq", _merge_expr(F.col("symbols"), left, right).alias("symbols")
        ).localCheckpoint()
    return merges, words


def bpe_vocab(words: DataFrame) -> DataFrame:
    """Final symbol vocabulary with corpus frequencies: explode the merged
    symbol sequences, weight by word frequency."""
    return (
        words.select("freq", F.explode("symbols").alias("symbol"))
        .groupBy("symbol")
        .agg(F.sum("freq").alias("n"))
    )


def bpe_token_counts(
    docs: DataFrame, words: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Apply side of the trainer: tokens per document under the learned
    vocabulary.  Each document's words look their segmentations up in the
    (word -> symbols) table — a broadcast join against vocabulary-sized
    state, so encoding a 100 TB corpus is one scan + map-side join, no
    re-segmentation compute.  Output: doc_id, n_words, n_tokens,
    tokens_per_word (the compression ratio quality signal).
    """
    lut = F.broadcast(words.select("word", F.size("symbols").alias("n_sym")))
    per_word = docs.select(
        "doc_id", F.explode(F.split(F.col(text_col), " ")).alias("word")
    ).filter(F.col("word") != "")
    return (
        per_word.join(lut, "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_sym").alias("n_tokens"),
        )
        .withColumn(
            "tokens_per_word", F.round(F.col("n_tokens") / F.col("n_words"), 6)
        )
    )
