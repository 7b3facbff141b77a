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


def learn_bpe(
    docs: DataFrame, n_merges: int = 12, text_col: str = "text"
) -> tuple[list[tuple[int, str, str]], DataFrame]:
    """Learn ``n_merges`` BPE merges; returns (merges, final word table).

    merges: [(rank, left, right)] in learned order.  The returned DataFrame
    carries (word, freq, symbols) after all merges — the input for token
    counting or vocabulary extraction.  Stops early when no pair occurs
    twice (nothing left worth merging).
    """
    words = word_frequencies(docs, text_col).select(
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
