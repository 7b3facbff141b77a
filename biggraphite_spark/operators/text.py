"""Text analysis over document tables: tokenization, quality, lang-id,
fingerprinting.

Beyond-reference operators (BASELINE.json north star): the text-side half of
a training-data pipeline.  Everything is built-in Column expressions — no
Python UDFs — so the whole stage stays inside whole-stage codegen and scales
linearly with a parquet scan.

Tokenization contract: documents are single-space separated (the synthetic
corpus guarantees it); ``tokens_col`` splits on a single space so the DuckDB
oracle can mirror it exactly with string_split.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: default stopword list for quality scoring — high-frequency English
#: function words; callers pass their own per-corpus list
STOPWORDS: tuple[str, ...] = ("the", "a", "an", "and", "of", "to", "in", "is")

#: language marker words for the n-gram-free heuristic lang-id: top
#: function words per language (not fitted to any fixture).  Dict order is
#: the tie-break priority; callers pass their own table for other corpora.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "is", "in", "that"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein", "zu"),
    "es": ("el", "la", "los", "que", "es", "una", "para", "con"),
}


def tokens_col(text: Column) -> Column:
    return F.split(text, " ")


def text_stats(
    docs: DataFrame,
    text_col: str = "text",
    stopwords: tuple[str, ...] = STOPWORDS,
) -> DataFrame:
    """Per-document token counts + quality score.

    Columns: n_tokens, n_types (distinct tokens), ttr (type/token ratio),
    avg_word_len, stopword_ratio, quality_score — the length/punct/stopword
    feature family used for corpus filtering.  ``stopwords`` defaults to
    :data:`STOPWORDS`; pass the corpus' own list.
    """
    toks = tokens_col(F.col(text_col))
    n_tokens = F.size(toks)
    n_types = F.size(F.array_distinct(toks))
    # single-space separation makes total word chars = len(text) - (n-1)
    avg_word_len = (F.length(text_col) - (n_tokens - 1)) / n_tokens
    stop_set = tuple(stopwords)
    stop = F.size(F.filter(toks, lambda t: t.isin(*stop_set)))
    stopword_ratio = stop / n_tokens
    ttr = n_types / n_tokens
    quality = (
        ttr * 0.5
        + (F.lit(1.0) - stopword_ratio) * 0.3
        + F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * 0.2
    )
    return docs.select(
        "doc_id",
        n_tokens.cast("long").alias("n_tokens"),
        n_types.cast("long").alias("n_types"),
        F.round(ttr, 6).alias("ttr"),
        F.round(avg_word_len, 6).alias("avg_word_len"),
        F.round(stopword_ratio, 6).alias("stopword_ratio"),
        F.round(quality, 6).alias("quality_score"),
    )


def lang_id(
    docs: DataFrame,
    text_col: str = "text",
    markers: Mapping[str, tuple[str, ...]] | None = None,
) -> DataFrame:
    """Marker-word language heuristic: count each language's markers, pick
    the max with a fixed priority tie-break (the ``markers`` table's key
    order), 'und' when no marker hits.  ``markers`` defaults to
    :data:`LANG_MARKERS`; pass a per-corpus table to cover other languages
    — the operator generalizes to any ordered {lang: marker words} map."""
    table = LANG_MARKERS if markers is None else dict(markers)
    toks = tokens_col(F.col(text_col))

    def marker_count(words: tuple[str, ...]) -> Column:
        # NB: the lambda must be unary — F.filter treats a 2-arg lambda as
        # (element, index), so a `w=words` default would receive the index
        return F.size(F.filter(toks, lambda t: t.isin(*words))).cast("long")

    langs = list(table)
    scores = {lang: marker_count(tuple(table[lang])) for lang in langs}
    predicted = None
    for i, lang in enumerate(langs):
        s = scores[lang]
        later = [scores[other] for other in langs[i + 1 :]]
        cond = s > 0
        if len(later) == 1:
            cond = cond & (s >= later[0])
        elif later:
            cond = cond & (s >= F.greatest(*later))
        predicted = (
            F.when(cond, lang) if predicted is None else predicted.when(cond, lang)
        )
    predicted = F.lit("und") if predicted is None else predicted.otherwise("und")
    return docs.select(
        "doc_id",
        *[scores[lang].alias(f"score_{lang}") for lang in langs],
        predicted.alias("predicted_lang"),
        F.col("lang").alias("labeled_lang"),
    )


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Order-insensitive document fingerprint: md5 over the sorted distinct
    token set — two documents that are permutations of the same vocabulary
    collide, which is the property near-dup clustering wants."""
    toks = tokens_col(F.col(text_col))
    fp = F.md5(F.array_join(F.array_sort(F.array_distinct(toks)), " "))
    return docs.select("doc_id", fp.alias("fingerprint"))


#: GPT-2-style pre-tokenizer, simplified to the subset both Java regex and
#: RE2 (the DuckDB oracle) support — no lookahead; contractions, letter runs,
#: digit runs, punctuation runs, whitespace runs
BPE_TOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+|\s+"


def bpe_token_count(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """BPE-ish token counting: whitespace words vs pre-tokenizer matches.

    ``n_bpe_tokens`` counts :data:`BPE_TOKEN_RE` matches (the unit a byte-pair
    tokenizer would start from); ``tokens_per_word`` is the fertility
    estimate pipelines use to budget token costs from raw text."""
    toks = tokens_col(F.col(text_col))
    n_words = F.size(toks)
    n_bpe = F.regexp_count(F.col(text_col), F.lit(BPE_TOKEN_RE))
    return docs.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        n_bpe.cast("long").alias("n_bpe_tokens"),
        F.round(n_bpe / n_words, 6).alias("tokens_per_word"),
    )


def rolling_fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Order-sensitive polynomial rolling hash over the token stream —
    ``h = (h * 1000003 + ascii(tok[0]) * 31 + len(tok)) mod (2^31 - 1)`` —
    the complement of :func:`fingerprint`'s order-insensitive vocab digest.
    Token permutations produce different fingerprints here; the fold is one
    ``aggregate`` over the split, fully inside codegen."""
    toks = tokens_col(F.col(text_col))
    rolled = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: (
            acc * F.lit(1000003) + F.ascii(t) * F.lit(31) + F.length(t)
        ) % F.lit(2147483647),
    )
    return docs.select("doc_id", rolled.alias("rolling_fp"))
