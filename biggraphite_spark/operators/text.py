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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: language marker words for the n-gram-free heuristic lang-id
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a"),
    "de": ("der", "die", "und"),
    "es": ("el", "la", "los"),
}


def tokens_col(text: Column) -> Column:
    return F.split(text, " ")


def text_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document token counts + quality score.

    Columns: n_tokens, n_types (distinct tokens), ttr (type/token ratio),
    avg_word_len, stopword_ratio, quality_score — the length/punct/stopword
    feature family used for corpus filtering.
    """
    toks = tokens_col(F.col(text_col))
    n_tokens = F.size(toks)
    n_types = F.size(F.array_distinct(toks))
    # single-space separation makes total word chars = len(text) - (n-1)
    avg_word_len = (F.length(text_col) - (n_tokens - 1)) / n_tokens
    stop = F.size(F.filter(toks, lambda t: t.isin("the", "a")))
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


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language heuristic: count each language's markers, pick
    the max with a fixed priority tie-break (en > de > es), 'und' when no
    marker hits."""
    toks = tokens_col(F.col(text_col))

    def marker_count(words: tuple[str, ...]) -> Column:
        # NB: the lambda must be unary — F.filter treats a 2-arg lambda as
        # (element, index), so a `w=words` default would receive the index
        return F.size(F.filter(toks, lambda t: t.isin(*words))).cast("long")

    scores = {lang: marker_count(words) for lang, words in LANG_MARKERS.items()}
    s_en, s_de, s_es = scores["en"], scores["de"], scores["es"]
    predicted = (
        F.when((s_en >= F.greatest(s_de, s_es)) & (s_en > 0), "en")
        .when((s_de >= s_es) & (s_de > 0), "de")
        .when(s_es > 0, "es")
        .otherwise("und")
    )
    return docs.select(
        "doc_id",
        s_en.alias("score_en"),
        s_de.alias("score_de"),
        s_es.alias("score_es"),
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
