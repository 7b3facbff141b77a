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

from pyspark.sql import Column, DataFrame, Window
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


def bind_col(arr: Column, fn) -> Column:
    """Evaluate ``arr`` once per row and hand it to ``fn`` as a lambda
    variable.  Spark inlines a sub-expression into EVERY element evaluation
    of a higher-order-function lambda that references it (no CSE across
    lambda scopes — PERF.md finding 15), so a per-element reference to an
    O(len) expression like a tokenization turns linear work quadratic.
    Wrapping the array in a single-element array and transforming over it
    binds the value as a lambda variable: inner references become lookups."""
    return F.element_at(F.transform(F.array(arr), fn), 1)


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


def quality_rules(
    docs: DataFrame,
    text_col: str = "text",
    stopwords: tuple[str, ...] = STOPWORDS,
    min_words: int = 20,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_token_len: int = 20,
    min_alpha_ratio: float = 0.8,
    min_stop_hits: int = 2,
) -> DataFrame:
    """Gopher-style document quality gate: per-rule boolean flags plus the
    conjunction ``keep``.

    The rule family follows Rae et al. 2021 (Gopher, table A1): word-count
    bounds, mean-word-length band, no oversized tokens, minimum fraction of
    words containing an alphabetic character, and a minimum stopword-hit
    count.  Thresholds are keyword arguments — corpora tune them — and every
    feature is a built-in Column expression, so the gate is one codegen'd
    projection over the scan (no shuffle, no UDF): the shape that filters a
    100 TB corpus at scan speed.
    """
    toks = tokens_col(F.col(text_col))
    n_words = F.size(toks)
    mean_word_len = (F.length(text_col) - (n_words - 1)) / n_words
    longest = F.array_max(F.transform(toks, F.length))
    alpha_ratio = F.size(F.filter(toks, lambda t: t.rlike("[a-zA-Z]"))) / n_words
    stop_set = tuple(stopwords)
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(*stop_set)))
    r_words = (n_words >= min_words) & (n_words <= max_words)
    r_word_len = (mean_word_len >= min_mean_word_len) & (
        mean_word_len <= max_mean_word_len
    )
    r_token_len = longest <= max_token_len
    r_alpha = alpha_ratio >= min_alpha_ratio
    r_stop = stop_hits >= min_stop_hits
    return docs.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        F.round(mean_word_len, 6).alias("mean_word_len"),
        longest.cast("long").alias("max_token_len"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        stop_hits.cast("long").alias("stop_hits"),
        r_words.alias("rule_word_count"),
        r_word_len.alias("rule_mean_word_len"),
        r_token_len.alias("rule_max_token_len"),
        r_alpha.alias("rule_alpha_ratio"),
        r_stop.alias("rule_stopwords"),
        (r_words & r_word_len & r_token_len & r_alpha & r_stop).alias("keep"),
    )


def repetition_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Repetition / boilerplate features: the fraction of the document taken
    by its most frequent token, most frequent bigram, and by bigrams that
    occur more than once (Gopher's duplicate-n-gram family).

    Shape: explode to (doc, gram) postings, count per (doc, gram), reduce per
    doc — linear in corpus tokens with map-side partial aggregation, never
    quadratic in document length (the in-row alternative is O(len^2) per
    document, which dies on real long documents).
    """
    toks = tokens_col(F.col(text_col))
    base = docs.select("doc_id", toks.alias("toks"))
    uni = base.select("doc_id", F.explode("toks").alias("gram"))
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size("toks") - 1),
        lambda i: F.concat_ws(" ", F.element_at("toks", i), F.element_at("toks", i + 1)),
    )
    bi = base.filter(F.size("toks") >= 2).select(
        "doc_id", F.explode(bigrams).alias("gram")
    )

    def per_doc(postings: DataFrame, prefix: str) -> DataFrame:
        counted = postings.groupBy("doc_id", "gram").agg(F.count("*").alias("c"))
        return counted.groupBy("doc_id").agg(
            (F.max("c") / F.sum("c")).alias(f"{prefix}_top_frac"),
            (
                F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)) / F.sum("c")
            ).alias(f"{prefix}_dup_frac"),
        )
    out = per_doc(uni, "token").join(per_doc(bi, "bigram"), "doc_id", "left")
    return out.select(
        "doc_id",
        F.round("token_top_frac", 6).alias("top_token_frac"),
        F.round("token_dup_frac", 6).alias("dup_token_frac"),
        F.round("bigram_top_frac", 6).alias("top_bigram_frac"),
        F.round("bigram_dup_frac", 6).alias("dup_bigram_frac"),
    )


#: default probe for BM25 demos/tests — common corpus vocabulary
BM25_DEFAULT_TERMS: tuple[str, ...] = ("spark", "join", "vector")


def bm25_scores(
    docs: DataFrame,
    terms: tuple[str, ...] = BM25_DEFAULT_TERMS,
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 relevance of every document to a bag of query terms.

    Corpus statistics (N, avgdl, per-term document frequency) are computed in
    ONE aggregation pass and re-attached via a broadcast cross-join of the
    single stats row, so the whole operator is two scans of the corpus and no
    wide shuffle — at 100 TB the stats row is pennies and the scoring pass is
    scan-speed.  idf uses the standard ``ln(1 + (N - df + .5)/(df + .5))``
    smoothing; per-term tf is an in-row ``filter`` count.
    """
    from pyspark.sql.functions import broadcast

    toks = tokens_col(F.col(text_col))

    def tf_of(term: str):
        # NB: unary lambda — F.filter treats a 2-arg lambda as (element,
        # index), so a `term=tm` default would receive the index column
        return F.size(F.filter(toks, lambda t: t == F.lit(term)))

    tf_cols = [
        tf_of(tm).cast("double").alias(f"tf_{i}") for i, tm in enumerate(terms)
    ]
    base = docs.select(
        "doc_id", F.size(toks).cast("double").alias("dl"), *tf_cols
    )
    stats = base.agg(
        F.count("*").cast("double").alias("N"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("double")).alias(f"df_{i}")
            for i in range(len(terms))
        ],
    )
    joined = base.crossJoin(broadcast(stats))
    norm = F.lit(k1) * (F.lit(1 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    score = None
    for i in range(len(terms)):
        idf = F.log(
            F.lit(1.0)
            + (F.col("N") - F.col(f"df_{i}") + F.lit(0.5)) / (F.col(f"df_{i}") + F.lit(0.5))
        )
        part = idf * F.col(f"tf_{i}") * F.lit(k1 + 1) / (F.col(f"tf_{i}") + norm)
        score = part if score is None else score + part
    return joined.select(
        "doc_id",
        F.col("dl").cast("long").alias("doc_len"),
        F.round(score, 6).alias("bm25"),
    )


def winnowing_fingerprints(
    docs: DataFrame, k: int = 5, w: int = 4, text_col: str = "text"
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al. 2003, the
    local-fingerprinting standard behind MOSS-style duplicate detection):
    hash every k-token gram, slide a w-hash window, keep each window's
    minimum — guaranteeing any shared run of >= w+k-1 tokens between two
    documents shares at least one fingerprint.

    Hashes are 8-hex-char md5 prefixes compared lexicographically (the
    same engine-neutral trick as the MinHash signatures), so the selected
    mins are bit-identical in any engine replaying the definition.  Output
    per document: fingerprint count + digest of the sorted distinct set.
    Everything is one projection of higher-order functions over the token
    array — zero shuffle, scan-speed.
    """
    # naively referencing `grams` inside the window-min transform would
    # re-tokenize and re-hash the whole document once PER WINDOW — O(G^2)
    # md5 calls (bind_col docstring; measured 8.9s -> 0.5s at sf0.1)
    def fingerprints(toks: Column) -> Column:
        n_grams = F.greatest(F.size(toks) - F.lit(k - 1), F.lit(0))
        grams = F.transform(
            F.sequence(F.lit(1), n_grams),
            lambda i: F.substring(F.md5(F.concat_ws(" ", F.slice(toks, i, k))), 1, 8),
        )

        def windows(g: Column) -> Column:
            n_wins = F.greatest(F.size(g) - F.lit(w - 1), F.lit(1))
            return F.when(F.size(g) == 0, F.array().cast("array<string>")).otherwise(
                F.transform(
                    F.sequence(F.lit(1), n_wins),
                    lambda i: F.array_min(F.slice(g, i, w)),
                )
            )

        return bind_col(grams, lambda g: F.array_sort(F.array_distinct(windows(g))))

    fps = bind_col(tokens_col(F.col(text_col)), fingerprints)
    digest = bind_col(
        fps,
        lambda f: F.struct(
            F.size(f).alias("n_fingerprints"),
            F.md5(F.array_join(f, ",")).alias("fp_digest"),
        ),
    )
    # inline(): field-extracting the struct twice would run the whole
    # fingerprint tree twice (PERF.md finding 22)
    return docs.select("doc_id", F.inline(F.array(digest)))


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


def collocations(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 50,
) -> DataFrame:
    """Top-k adjacent-word collocations by pointwise mutual information —
    the phrase-mining pass (Mikolov et al. 2013 §4 "Learning Phrases") a
    training pipeline runs before tokenizer training to promote frequent
    pairs like "new york" to single units.

    ``PMI(w1,w2) = ln( (c12/Np) / ((c1/Nu)·(c2/Nu)) )`` with unigram totals
    ``Nu = Σ len(doc)`` and bigram totals ``Np = Σ (len(doc)-1)``; pairs
    below ``min_count`` are pruned BEFORE the join (rare-pair PMI is noise
    and the prune keeps the joined relation vocabulary-bounded).

    Scale shape: two token-level hash aggregations (unigram + bigram
    counts, both map-side partial), then vocabulary-sized broadcast joins
    and scalar-literal totals — the corpus is scanned twice and never
    wide-shuffled; top-k is a TakeOrdered, not a global sort.
    """
    toks = docs.select(tokens_col(F.col(text_col)).alias("t"))
    uni = (
        toks.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )
    pairs = (
        toks.select(
            F.explode(
                F.expr("arrays_zip(slice(t, 1, size(t)-1), slice(t, 2, size(t)-1))")
            ).alias("pr")
        )
        .select(F.col("pr.0").alias("w1"), F.col("pr.1").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("pair_count"))
        .filter(F.col("pair_count") >= min_count)
    )
    totals = toks.agg(
        F.sum(F.size("t")).alias("n_uni"),
        F.sum(F.size("t") - 1).alias("n_pair"),
    )
    u1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    ratio = (
        F.col("pair_count").cast("double")
        * F.col("n_uni").cast("double")
        * F.col("n_uni").cast("double")
    ) / (
        F.col("n_pair").cast("double")
        * F.col("c1").cast("double")
        * F.col("c2").cast("double")
    )
    return (
        pairs.join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(totals))
        .select(
            "w1", "w2", "pair_count", F.round(F.log(ratio), 6).alias("pmi")
        )
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(top_k)
    )


def normalize_text(text: Column) -> Column:
    """Canonical text cleanup — the first pass every real-corpus pipeline
    runs before tokenization/dedup (C4/CCNet-style): strip C0 control
    characters (keeping \\t \\n which the whitespace collapse then eats),
    collapse all runs of whitespace to one space, trim, lowercase.

    A pure projection (three regexp_replace + lower + trim) inside
    whole-stage codegen; the character classes are written to mean the same
    thing in Java regex and RE2 so the DuckDB oracle can mirror them.
    """
    cleaned = F.regexp_replace(text, "[\\x00-\\x08\\x0b-\\x1f\\x7f]", "")
    collapsed = F.regexp_replace(cleaned, "[ \\t\\n\\r]+", " ")
    return F.lower(F.trim(collapsed))


#: masking patterns, ordered — email before phone so the digits of a
#: user@host123 style address are consumed as EMAIL, not PHONE.
#:
#: The phone pattern is shape-based (and RE2-compatible — no lookaround, so
#: the DuckDB differential oracle can replay it): international prefix,
#: parenthesized area code, or uniform-separator digit-group runs whose
#: head-size/group-count shapes exclude the non-PII runs a greedy
#: separator-class pattern used to eat — ISO dates (4-2-2) and datetimes,
#: version/serial strings (1.2.3, 12.34.56), and 3-4-column numeric table
#: rows.  Residual known false positive: five 2-digit columns
#: ("10 11 12 13 14") still mask — byte-identical to an FR-formatted phone.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+", "<email>"),
    ("\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<ip>"),
    (
        # +cc [area] grouped digits (7+ digits by construction)
        "\\+\\d{1,3}[ .-]?\\(?\\d{1,4}\\)?(?:[ .-]?\\d{2,4}){2,5}\\b"
        # (area) grouped digits
        "|\\(\\d{1,4}\\)[ .-]?\\d{2,4}(?:[ .-]?\\d{2,4}){1,3}\\b"
        # US shapes: 1-800-555-0199 / 555-123-4567 / 555 123 4567 / dots
        "|\\b1-\\d{3}-\\d{3}-\\d{4}\\b"
        "|\\b\\d{3}-\\d{3}-\\d{4}\\b"
        "|\\b\\d{3}[ .]\\d{3}[ .]\\d{4}\\b"
        # uniform-dash runs of 4-5 short groups (01-23-45-67-89)
        "|\\b\\d{2,3}(?:-\\d{2,4}){3,4}\\b"
        # FR-style five 2-digit space groups (06 12 34 56 78)
        "|\\b\\d{2}(?: \\d{2}){4}\\b"
        # bare contiguous subscriber runs
        "|\\b\\d{9,13}\\b",
        "<phone>",
    ),
)


def pii_mask(text: Column, patterns=PII_PATTERNS) -> Column:
    """Mask personally-identifiable spans with typed placeholder tokens —
    the pre-release scrub pass (emails, IPv4s, phone-shaped digit runs by
    default; pass corpus-specific ``patterns`` to extend).  Placeholders
    are lowercase so the normalize_text -> pii_mask pipeline is idempotent
    (a second normalize pass would fold an uppercase token's case and make
    re-ingestion mutate already-clean text; pinned by the idempotence
    test).

    Chained regexp_replace projections; patterns restrict themselves to the
    regex subset Java and RE2 evaluate identically (no backreferences or
    lookaround), so the scrub is oracle-checkable and portable to any
    engine a pipeline hands it to.
    """
    out = text
    for pat, token in patterns:
        out = F.regexp_replace(out, pat, token)
    return out


def html_strip(text: Column) -> Column:
    """Drop markup from scraped text: remove <script>/<style> elements with
    their payload, strip remaining tags, decode the five predefined XML
    entities.  The regex-level de-tagging every web-corpus pipeline applies
    before quality scoring (full DOM parsing is a per-document Python stage;
    this is the scan-speed projection that handles the overwhelming bulk).
    """
    no_block = F.regexp_replace(
        text, "(?i)<(script|style)[^>]*>[^<]*(?:<(?!/)[^<]*)*</(script|style)>", " "
    )
    no_tags = F.regexp_replace(no_block, "<[^>]+>", " ")
    out = no_tags
    for ent, ch in (
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", "\""), ("&apos;", "'"),
        ("&amp;", "&"),  # last, so &amp;lt; decodes to &lt; not <
    ):
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return out


def nb_classifier(
    docs: DataFrame,
    text_col: str = "text",
    label_col: str = "lang",
    alpha: float = 1.0,
) -> DataFrame:
    """Multinomial Naive Bayes classifier, trained AND applied in one
    declarative plan — the classical quality/language filter shape (the
    fasttext-style gate of C4/CCNet pipelines) whose training step is pure
    counting, so the whole fit+predict pipeline is joins and aggregations
    the oracle can replay exactly.

    Laplace-smoothed: ``log p(tok|y) = ln((c_ty + α)/(T_y + α·V))`` with V
    the corpus vocabulary size; ``score(d,y) = ln(n_y/n) + Σ m·log p``;
    prediction is the argmax with lexicographic label tie-break.

    Output: doc_id, <label_col> (the true label), pred, score.

    Scale shape: the model is the (label × vocab) count grid —
    vocabulary-bounded, broadcast — so scoring is a posting-level broadcast
    join fanned out ×|labels|; wide shuffles are keyed by (doc, tok) and
    doc, both linear.  Train and apply share one corpus scan.
    """
    postings = (
        docs.select(
            "doc_id",
            F.col(label_col).alias("y"),
            F.explode(tokens_col(F.col(text_col))).alias("tok"),
        )
        .groupBy("doc_id", "y", "tok")
        .agg(F.count("*").alias("m"))
    )
    counts = postings.groupBy("y", "tok").agg(F.sum("m").alias("c"))
    vocab = postings.select("tok").distinct()
    vsize = vocab.agg(F.count("*").alias("v"))
    totals = counts.groupBy("y").agg(F.sum("c").alias("t"))
    priors = docs.groupBy(F.col(label_col).alias("y")).agg(
        F.count("*").alias("nd")
    )
    ntotal = docs.agg(F.count("*").alias("n"))
    grid = (
        vocab.crossJoin(F.broadcast(totals))
        .join(F.broadcast(counts), ["y", "tok"], "left")
        .crossJoin(F.broadcast(vsize))
        .select(
            "y",
            "tok",
            F.log(
                (F.coalesce(F.col("c"), F.lit(0)) + F.lit(alpha))
                / (F.col("t") + F.lit(alpha) * F.col("v"))
            ).alias("ll"),
        )
    )
    scored = (
        postings.select("doc_id", "tok", "m")
        .join(F.broadcast(grid), "tok")
        .groupBy("doc_id", "y")
        .agg(F.sum(F.col("m") * F.col("ll")).alias("s"))
        .join(F.broadcast(priors), "y")
        .crossJoin(F.broadcast(ntotal))
        .select(
            "doc_id",
            "y",
            (F.col("s") + F.log(F.col("nd") / F.col("n"))).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("y"))
    best = (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("doc_id", F.col("y").alias("pred"), F.round("score", 6).alias("score"))
    )
    return docs.select("doc_id", label_col).join(best, "doc_id")


def rake_keywords(
    docs: DataFrame,
    text_col: str = "text",
    stopwords: tuple[str, ...] = STOPWORDS,
    top_k: int = 3,
) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010): candidate phrases are the
    maximal stopword-free token runs; each word scores deg(w)/freq(w) over
    the document's candidates (deg = Σ length of phrases containing w,
    freq = occurrences in candidates); a phrase scores the sum of its word
    scores.  Output: the ``top_k`` phrases per document by (score DESC,
    phrase ASC).

    Shape: posexplode -> gaps-and-islands window to segment phrases ->
    two (doc, word)-keyed aggregations -> one per-doc rank window.  Every
    relation stays keyed by doc_id (token postings scale), no broadcast of
    anything corpus-sized — linear in corpus tokens at any scale.
    """
    toks = docs.select(
        "doc_id", F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "tok")
    ).filter(F.col("tok") != "")
    content = toks.filter(~F.col("tok").isin(*stopwords))
    # islands: consecutive non-stopword positions share (pos - rank)
    w_pos = Window.partitionBy("doc_id").orderBy("pos")
    # LAZY localCheckpoint: seg feeds plen, word_stats AND phrase_scores —
    # without the pin the posexplode + island-window subtree is built four
    # times in the one action (plan-audited: 4x Exchange+Generate+Window);
    # with it the explode/window run once and every consumer reads the
    # doc_id-partitioned blocks (guide §2.4: share one exchange).  plen is
    # likewise read by two consumers (word lengths + phrase text), so its
    # collect_list aggregation is pinned too.
    seg = content.withColumn(
        "phrase_id", F.col("pos") - F.row_number().over(w_pos)
    ).localCheckpoint(eager=False)
    # collect_list order is not guaranteed after the shuffle — sort by the
    # carried position before joining the phrase text
    plen = seg.groupBy("doc_id", "phrase_id").agg(
        F.count("*").alias("plen"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("phrase"),
    ).localCheckpoint(eager=False)
    word_stats = (
        seg.join(plen.select("doc_id", "phrase_id", "plen"), ["doc_id", "phrase_id"])
        .groupBy("doc_id", "tok")
        .agg(
            F.count("*").alias("freq"),
            F.sum("plen").alias("deg"),
        )
        .select("doc_id", "tok", (F.col("deg") / F.col("freq")).alias("wscore"))
    )
    phrase_scores = (
        seg.join(word_stats, ["doc_id", "tok"])
        .groupBy("doc_id", "phrase_id")
        .agg(F.round(F.sum("wscore"), 6).alias("score"))
        .join(plen.select("doc_id", "phrase_id", "phrase"), ["doc_id", "phrase_id"])
    )
    w_rank = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.asc("phrase")
    )
    return (
        phrase_scores.withColumn("rank", F.row_number().over(w_rank).cast("long"))
        .filter(F.col("rank") <= top_k)
        .select("doc_id", "phrase", "score", "rank")
    )
