"""Corpus curation family: boilerplate chunk dedup, benchmark
decontamination, unigram LM scoring, source mixing weights, and shared
exact-substring detection.

Beyond-reference operators for the training-data pipeline (the CCNet /
Gopher / "Deduplicating Training Data" tool-belt).  Design rules follow the
rest of the package:

- **Built-in Column expressions only** — every operator is joins + aggs +
  higher-order array functions inside whole-stage codegen; no Python UDFs.
- **Portable hashing** (md5 over explicit strings) so the DuckDB oracle
  reproduces every intermediate bit-for-bit.
- **Scale shape stated per operator** — each docstring says what shuffles
  and why the plan survives a 100 TB corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from .text import bind_col, tokens_col


def _chunks_exploded(docs: DataFrame, text_col: str, chunk: int) -> DataFrame:
    """(doc_id, chunk_id, chunk_text) — non-overlapping ``chunk``-token
    spans in order; the last span may be shorter."""
    spans = bind_col(
        tokens_col(F.col(text_col)),
        lambda toks: F.transform(
            F.sequence(F.lit(0), F.ceil(F.size(toks) / F.lit(chunk)).cast("int") - 1),
            lambda i: F.array_join(F.slice(toks, i * chunk + 1, chunk), " "),
        ),
    )
    return docs.select(
        "doc_id", F.posexplode(spans).alias("chunk_id", "chunk_text")
    )


def chunk_dedup(
    docs: DataFrame,
    text_col: str = "text",
    chunk: int = 8,
    max_doc_freq: int = 1,
) -> DataFrame:
    """Boilerplate removal by corpus-frequency span dedup (CCNet's
    paragraph-hash dedup, Penedo et al. 2023's line dedup).

    Split every document into non-overlapping ``chunk``-token spans, hash
    each span, count how many DISTINCT documents contain each span, drop
    spans appearing in more than ``max_doc_freq`` documents, and reassemble
    the surviving spans in document order.  On corpora with real line
    structure the split unit is ``\\n`` instead of a token count; the
    synthetic corpus is single-line so fixed token spans stand in.

    Output: doc_id, n_chunks, n_kept, cleaned_text (may be empty when every
    span is boilerplate).

    Scale shape: explode to (doc, span) postings — linear in corpus tokens —
    then ONE shuffle keyed by span hash for the document-frequency count
    (map-side partial on approx-distinct is not usable here, but the count
    is per span-hash, so partial aggregation still combines within
    partitions) and one shuffle back by doc_id for reassembly.  No
    quadratic stage anywhere; the span-frequency relation is corpus-sized,
    not pair-sized.
    """
    spans = _chunks_exploded(docs, text_col, chunk).withColumn(
        "h", F.md5("chunk_text")
    )
    freq = spans.groupBy("h").agg(
        F.count_distinct("doc_id").alias("doc_freq")
    )
    kept = spans.join(freq, "h").withColumn(
        "keep", F.col("doc_freq") <= max_doc_freq
    )
    return (
        kept.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum(F.col("keep").cast("long")).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("keep"),
                                F.struct("chunk_id", "chunk_text"),
                            )
                        )
                    ),
                    lambda s: s.chunk_text,
                ),
                " ",
            ).alias("cleaned_text"),
        )
    )


def contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    n: int = 5,
    min_overlap: int = 1,
) -> DataFrame:
    """Benchmark decontamination: flag training documents that share n-gram
    shingles with an evaluation set (the GPT-3 appendix-C / PaLM
    "contamination" check).

    ``benchmark`` is a (doc_id, text) frame of eval documents.  Both sides
    are shingled into distinct ``n``-token grams; a training document is
    contaminated when it shares at least ``min_overlap`` distinct grams
    with ANY benchmark document.

    Output: doc_id, n_grams, n_overlap, contaminated.

    Scale shape: the benchmark gram set is eval-sized (thousands of docs),
    so it is deduplicated and BROADCAST; the corpus side is a linear
    explode + broadcast-hash semi-join + per-doc count — no wide shuffle of
    corpus grams ever happens, which is what lets the check run at scan
    speed over 100 TB.
    """
    from .dedup import with_shingles

    corpus = with_shingles(docs, text_col=text_col, n=n).select(
        "doc_id", F.explode("shingles").alias("gram")
    )
    bench_grams = (
        with_shingles(benchmark, text_col=text_col, n=n)
        .select(F.explode("shingles").alias("gram"))
        .distinct()
    )
    hits = corpus.join(
        broadcast(bench_grams.withColumn("hit", F.lit(1))), "gram", "left"
    )
    return hits.groupBy("doc_id").agg(
        F.count("*").alias("n_grams"),
        F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_overlap"),
        (F.sum(F.coalesce(F.col("hit"), F.lit(0))) >= min_overlap).alias(
            "contaminated"
        ),
    )


def unigram_logprob(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Unigram language-model cross-entropy per document (the cheap stand-in
    for CCNet's KenLM perplexity quality signal).

    The corpus unigram distribution is estimated from the documents
    themselves (MLE, no smoothing needed — every scored token was counted),
    then each document is scored ``H = -mean(log2 p(tok))`` and
    ``ppl = 2^H``.  Low-entropy documents are repetitive/boilerplate; high
    entropy flags rare-token noise — pipelines keep the middle band.

    Output: doc_id, n_tokens, cross_entropy, perplexity.

    Scale shape: one posting explode with TWO aggregations — per-token
    corpus counts (vocabulary-sized result), then per-doc score.  The
    vocabulary relation is many orders smaller than the corpus and is
    broadcast back onto the postings, so the scoring join is map-side; the
    only wide shuffles are keyed by token and by doc_id, both linear.
    """
    postings = docs.select(
        "doc_id", F.explode(tokens_col(F.col(text_col))).alias("tok")
    )
    vocab = postings.groupBy("tok").agg(F.count("*").alias("c"))
    total = vocab.agg(F.sum("c").alias("total"))
    scored = postings.join(broadcast(vocab), "tok").crossJoin(broadcast(total))
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(
                F.avg(-F.log2(F.col("c") / F.col("total"))), 6
            ).alias("cross_entropy"),
            F.round(
                F.pow(
                    F.lit(2.0), F.avg(-F.log2(F.col("c") / F.col("total")))
                ),
                6,
            ).alias("perplexity"),
        )
    )


def mix_weights(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    alpha: float = 0.3,
    token_budget: int = 1_000_000,
) -> DataFrame:
    """Temperature-scaled source mixing weights: ``p_i ∝ n_i^alpha`` over
    per-source token counts (the multilingual/multi-domain sampling rule of
    Conneau & Lample 2019; alpha=0.3 is the mT5/XLM-R setting).

    ``effective_epochs`` is how many passes over source *i* a training run
    of ``token_budget`` tokens makes under the mix — the number pipelines
    watch to keep small sources from over-repeating.

    Output per source: n_docs, n_tokens, weight, effective_epochs.

    Scale shape: one groupBy(source) over a scan (map-side combined), then
    window-free normalization via a single-row broadcast — the result is
    source-cardinality-sized (tens of rows), so every post-agg step is
    driver-trivial regardless of corpus size.
    """
    per = docs.groupBy(group_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(tokens_col(F.col(text_col)))).alias("n_tokens"),
    )
    scaled = per.withColumn("w_raw", F.pow(F.col("n_tokens"), F.lit(alpha)))
    z = scaled.agg(F.sum("w_raw").alias("z"))
    return (
        scaled.crossJoin(broadcast(z))
        .select(
            group_col,
            "n_docs",
            "n_tokens",
            F.round(F.col("w_raw") / F.col("z"), 6).alias("weight"),
            F.round(
                F.lit(token_budget)
                * (F.col("w_raw") / F.col("z"))
                / F.col("n_tokens"),
                6,
            ).alias("effective_epochs"),
        )
    )


def substring_runs(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 5,
    min_run_tokens: int = 8,
    max_gram_doc_freq: int = 50,
) -> DataFrame:
    """Shared exact-substring detection between document pairs — the
    anchor-join alternative to the suffix-array pass of Lee et al. 2022
    ("Deduplicating Training Data Makes Language Models Better").

    Every ``k``-token gram with its position is an anchor.  Two documents
    sharing a run of ``L`` consecutive tokens share ``L - k + 1`` anchors at
    a CONSTANT position delta, so grouping anchor matches by
    ``(doc_a, doc_b, pos_a - pos_b)`` and measuring the longest consecutive
    position island recovers the longest common substring of length >= k
    exactly.  Pairs with ``longest_run`` >= ``min_run_tokens`` are reported.

    Output: doc_a, doc_b, longest_run (tokens), n_anchors.

    Scale shape: anchors are linear in corpus tokens.  The self-join is on
    the gram hash, and its fan-out is bounded by dropping grams appearing in
    more than ``max_gram_doc_freq`` documents — non-discriminative grams
    (stop-phrase noise) cannot participate in a >=min_run duplication
    without rarer neighbors also matching, so the prune is
    recall-preserving for runs containing at least one sub-cap gram; real
    deployments tune the cap exactly like suffix-array pipelines cap
    posting lengths.  Remaining stages are windows over (pair, delta)
    groups — pair-volume-sized, which the cap keeps controlled.
    """
    grams = bind_col(
        tokens_col(F.col(text_col)),
        lambda toks: F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(toks) - (k - 1), F.lit(1))),
            lambda i: F.array_join(F.slice(toks, i, k), " "),
        ),
    )
    anchors = docs.select(
        "doc_id", F.posexplode(grams).alias("pos", "gram")
    ).withColumn("h", F.md5("gram")).drop("gram")
    df = anchors.groupBy("h").agg(F.count_distinct("doc_id").alias("gdf"))
    # the pruned posting list feeds BOTH sides of the self-join: cached, the
    # token-gram explode + df-join run once instead of four times (anchors
    # appears in df's subtree and in each join side)
    pruned = anchors.join(
        df.filter(F.col("gdf") <= max_gram_doc_freq), "h"
    ).cache()
    a, b = pruned.alias("a"), pruned.alias("b")
    matches = a.join(
        b,
        (F.col("a.h") == F.col("b.h"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.col("a.pos").alias("pos_a"),
        (F.col("a.pos") - F.col("b.pos")).alias("delta"),
    ).distinct()
    from pyspark.sql import Window

    w = Window.partitionBy("doc_a", "doc_b", "delta").orderBy("pos_a")
    islands = matches.withColumn(
        "island", F.col("pos_a") - F.row_number().over(w)
    )
    runs = islands.groupBy("doc_a", "doc_b", "delta", "island").agg(
        (F.count("*") + F.lit(k - 1)).alias("run_tokens"),
        F.count("*").alias("n_anchor"),
    )
    return (
        runs.groupBy("doc_a", "doc_b")
        .agg(
            F.max("run_tokens").alias("longest_run"),
            F.sum("n_anchor").alias("n_anchors"),
        )
        .filter(F.col("longest_run") >= min_run_tokens)
    )


def curate(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    contam_n: int = 5,
    sample_rates=None,
) -> DataFrame:
    """The end-to-end curation decision table: every pipeline stage as a
    boolean column plus the final ``keep`` conjunction.

    Stages (each reusing its standalone operator's exact semantics):
    Gopher quality gate -> exact dedup (lowest doc_id per content hash
    survives) -> benchmark decontamination -> deterministic stratified
    sampling.  Emitting the DECISION TABLE rather than the filtered corpus
    is deliberate: pipelines audit per-stage loss rates before committing
    to a cut, and the table is one filter away from the final corpus.

    Output: doc_id, passed_quality, is_exact_dup, contaminated, sampled,
    keep.

    Scale shape: quality and sampling are pure projections over the scan;
    dedup is one window over the content-hash partition; contamination is
    the broadcast semi-join of :func:`contamination`.  The four flag
    relations join back on doc_id — co-partitioned equi-joins, nothing
    quadratic, nothing collected.
    """
    from pyspark.sql import Window

    from .sampling import DEFAULT_RATES, rate_to_hex_threshold
    from .text import quality_rules

    quality = quality_rules(docs, text_col=text_col).select(
        "doc_id", F.col("keep").alias("passed_quality")
    )
    w = Window.partitionBy(F.md5(F.col(text_col)))
    dup = docs.select(
        "doc_id",
        (F.col("doc_id") > F.min("doc_id").over(w)).alias("is_exact_dup"),
    )
    contam = contamination(docs, benchmark, text_col=text_col, n=contam_n).select(
        "doc_id", "contaminated"
    )
    rates = DEFAULT_RATES if sample_rates is None else dict(sample_rates)
    key = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8)
    sampled = None
    for stratum, rate in rates.items():
        cond = (F.col("lang") == stratum) & (key < rate_to_hex_threshold(rate))
        sampled = cond if sampled is None else sampled | cond
    samp = docs.select(
        "doc_id", (F.lit(False) if sampled is None else sampled).alias("sampled")
    )
    return (
        quality.join(dup, "doc_id")
        .join(contam, "doc_id")
        .join(samp, "doc_id")
        .select(
            "doc_id",
            "passed_quality",
            "is_exact_dup",
            "contaminated",
            "sampled",
            (
                F.col("passed_quality")
                & ~F.col("is_exact_dup")
                & ~F.col("contaminated")
                & F.col("sampled")
            ).alias("keep"),
        )
    )


def bigram_logprob(
    docs: DataFrame, text_col: str = "text", lam: float = 0.9
) -> DataFrame:
    """Interpolated bigram language-model cross-entropy per document — the
    next rung above :func:`unigram_logprob` toward CCNet's KenLM quality
    signal.  Per bigram position ``p(w2|w1) = lam·c12/c1 + (1-lam)·c2/N``
    (Jelinek-Mercer interpolation with the corpus-MLE unigram as the
    backoff, so unseen-in-context pairs never hit -inf), then
    ``H = -Σ m·log2 p / Σ m`` and ``ppl = 2^H`` over the document's bigram
    positions.

    Output: doc_id, n_bigrams, cross_entropy, perplexity.

    Scale shape: per-doc bigrams are pre-aggregated to (doc_id, w1, w2, m)
    so the corpus join carries distinct pairs per doc, not positions.  The
    corpus pair relation is joined on (w1, w2) — vocabulary²-bounded, so a
    plain hash join that AQE downgrades to broadcast when it fits; the
    unigram vocabulary and scalar total ARE broadcast.  Wide shuffles:
    (w1,w2) counts and the final doc_id agg, both linear in corpus size.
    """
    toks = docs.select("doc_id", tokens_col(F.col(text_col)).alias("t"))
    big = (
        toks.select(
            "doc_id",
            F.explode(
                F.expr("arrays_zip(slice(t, 1, size(t)-1), slice(t, 2, size(t)-1))")
            ).alias("pr"),
        )
        .select("doc_id", F.col("pr.0").alias("w1"), F.col("pr.1").alias("w2"))
        .groupBy("doc_id", "w1", "w2")
        .agg(F.count("*").alias("m"))
    )
    pair_counts = big.groupBy("w1", "w2").agg(F.sum("m").alias("c12"))
    uni = (
        toks.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )
    total = uni.agg(F.sum("c").alias("n"))
    u1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    p = F.lit(lam) * (
        F.col("c12").cast("double") / F.col("c1")
    ) + F.lit(1.0 - lam) * (F.col("c2").cast("double") / F.col("n"))
    scored = (
        big.join(pair_counts, ["w1", "w2"])
        .join(broadcast(u1), "w1")
        .join(broadcast(u2), "w2")
        .crossJoin(broadcast(total))
        .select("doc_id", "m", p.alias("p"))
    )
    h = F.sum(-F.col("m") * F.log2("p")) / F.sum("m")
    return scored.groupBy("doc_id").agg(
        F.sum("m").alias("n_bigrams"),
        F.round(h, 6).alias("cross_entropy"),
        F.round(F.pow(F.lit(2.0), h), 6).alias("perplexity"),
    )


def dataset_card(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One-row corpus summary — the "dataset card" statistics block a
    training-data release publishes (docs/tokens/vocab, language spread,
    exact-duplicate rate, quality pass rate, document-length quantiles).

    Output (single row): n_docs, n_tokens, vocab_size, n_langs, n_sources,
    pct_exact_dup, pct_quality_pass, mean_doc_tokens, p50_doc_tokens,
    p95_doc_tokens.

    Scale shape: one scan feeds three aggregations — a per-doc projection
    reduced globally (counts, quantiles over the per-doc token count, the
    quality conjunction), a text-hash groupBy for the duplicate rate, and
    one token explode for the vocabulary size — then three single-row
    frames cross-join.  Everything is linear with map-side partials;
    exact percentiles over the per-doc length relation (corpus-cardinality,
    tiny next to the token stream) match what a release card reports.
    """
    from .text import quality_rules, tokens_col

    per_doc = docs.select(
        "doc_id",
        "lang",
        "source",
        F.size(tokens_col(F.col(text_col))).alias("n_toks"),
        F.md5(text_col).alias("h"),
    )
    q = quality_rules(docs, text_col=text_col).select("doc_id", "keep")
    base = (
        per_doc.join(q, "doc_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_toks").alias("n_tokens"),
            F.count_distinct("lang").alias("n_langs"),
            F.count_distinct("source").alias("n_sources"),
            F.round(F.avg(F.col("keep").cast("double")) * 100, 4).alias(
                "pct_quality_pass"
            ),
            F.round(F.avg("n_toks"), 6).alias("mean_doc_tokens"),
            F.expr("percentile(n_toks, 0.5)").alias("p50_doc_tokens"),
            F.expr("percentile(n_toks, 0.95)").alias("p95_doc_tokens"),
        )
    )
    dup = (
        per_doc.groupBy("h")
        .agg(F.count("*").alias("c"))
        .agg(
            F.round(
                (F.sum("c") - F.count("*")) / F.sum("c") * 100, 4
            ).alias("pct_exact_dup")
        )
    )
    vocab = (
        docs.select(F.explode(tokens_col(F.col(text_col))).alias("w"))
        .agg(F.count_distinct("w").alias("vocab_size"))
    )
    return base.crossJoin(broadcast(dup)).crossJoin(broadcast(vocab))


def source_overlap(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    n: int = 5,
) -> DataFrame:
    """Cross-source content-overlap matrix: for every pair of sub-corpora,
    how many distinct n-gram shingles they share — the leakage audit run
    before mixing crawl snapshots / data vendors (a pair with high overlap
    coefficient is double-counting content the mix weights assume is
    fresh).

    Output per unordered pair: source_a, source_b, shared, n_a, n_b,
    overlap_coef (= shared / min(n_a, n_b), the containment-style measure
    that still flags a small source swallowed by a big one).

    Scale shape: distinct (source, gram) postings — one corpus-linear
    shuffle keyed by the posting — then a gram-keyed self-join whose fanout
    is bounded by sources-per-gram (≤ |sources|², independent of corpus
    size) and a pair-keyed aggregation over a |sources|²-sized relation.
    Per-source totals broadcast back onto the (tiny) pair table.
    """
    from .dedup import shingles_col

    postings = docs.select(
        F.col(group_col).alias("src"),
        F.explode(shingles_col(F.col(text_col), n)).alias("gram"),
    ).distinct()
    totals = postings.groupBy("src").agg(F.count("*").alias("n"))
    a = postings.select(F.col("src").alias("source_a"), "gram")
    b = postings.select(F.col("src").alias("source_b"), "gram")
    pairs = (
        a.join(b, "gram")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("shared"))
    )
    ta = totals.select(F.col("src").alias("source_a"), F.col("n").alias("n_a"))
    tb = totals.select(F.col("src").alias("source_b"), F.col("n").alias("n_b"))
    return (
        pairs.join(broadcast(ta), "source_a")
        .join(broadcast(tb), "source_b")
        .select(
            "source_a",
            "source_b",
            "shared",
            "n_a",
            "n_b",
            F.round(
                F.col("shared") / F.least(F.col("n_a"), F.col("n_b")), 6
            ).alias("overlap_coef"),
        )
    )


def chunk_neardup(
    docs: DataFrame,
    text_col: str = "text",
    chunk: int = 8,
    threshold: float = 0.5,
    k: int = 16,
    bands: int = 4,
    n: int = 3,
) -> DataFrame:
    """Paragraph-level FUZZY dedup — :func:`chunk_dedup`'s exact-hash match
    generalized to near-duplicate spans (the CCNet/RefinedWeb paragraph
    pass for boilerplate that mutates slightly between pages).

    Chunks become pseudo-documents keyed ``doc_id·2³² + chunk_id`` (an
    ordering under which "earlier survives" means document order, then
    position; collision-free for any document under 2³² chunks, where a
    small multiplier would splice a long document's tail chunks into the
    next doc_id) and run the standard MinHash-LSH near-dup path; the LATER
    side of every ≥``threshold``-Jaccard pair is dropped.

    Output: doc_id, n_chunks, n_kept.

    Scale shape: inherits the LSH path's — banded signature self-join on
    bucket keys, true-Jaccard verify on candidates only; the only new cost
    over :func:`chunk_dedup` is the signature pass, still linear in corpus
    tokens.
    """
    from .dedup import lsh_near_dups, lsh_near_dups_quotient

    chunks = _chunks_exploded(docs, text_col, chunk).withColumn(
        "ckey", F.shiftleft(F.col("doc_id"), 32) + F.col("chunk_id")
    )
    pseudo = chunks.select(
        F.col("ckey").alias("doc_id"), F.col("chunk_text").alias("text")
    )
    quotient = lsh_near_dups_quotient(
        pseudo, threshold=threshold, k=k, bands=bands, n=n
    )
    if quotient is not None:
        # CLOSED-FORM dropped set over the twin quotient (boilerplate
        # chunks repeat massively, so the member-pair expansion is the
        # whole cost here): dropped(v) ⟺ some neighbor has a smaller id
        # ⟺ (m ≥ 2 ∧ v > cls)                    — a classmate is smaller
        #   ∨ (min adjacent class id < v)        — cls IS its class's min
        # member id, so the smallest external neighbor of anyone in class
        # X is min over adjacent classes Y of cls_Y.  Class-sized compute
        # + one id join back to members; no pair is ever emitted.
        membership, class_pairs = quotient
        sym = class_pairs.unionByName(
            class_pairs.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        minadj = sym.groupBy("a").agg(F.min("b").alias("minadj")).select(
            F.col("a").alias("cls"), "minadj"
        )
        dropped = (
            membership.join(minadj, "cls", "left")
            .filter(
                ((F.col("m") >= 2) & (F.col("node") > F.col("cls")))
                | (F.col("minadj") < F.col("node"))
            )
            .select(F.col("node").alias("ckey"))
            .withColumn("dropme", F.lit(1))
        )
    else:
        pairs = lsh_near_dups(pseudo, threshold=threshold, k=k, bands=bands, n=n)
        dropped = pairs.select(F.col("doc_b").alias("ckey")).distinct().withColumn(
            "dropme", F.lit(1)
        )
    # no broadcast hint: on a boilerplate-heavy corpus the dropped set is
    # corpus-sized; a plain hash join lets AQE broadcast only when it fits
    return (
        chunks.join(dropped, "ckey", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum(
                F.when(F.col("dropme").isNull(), 1).otherwise(0)
            ).alias("n_kept"),
        )
    )


def ngram_novelty(docs: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """Per-document n-gram novelty: the fraction of a document's distinct
    n-grams whose FIRST corpus appearance (by doc_id order) is this
    document — the marginal-contribution signal data-valuation passes use
    to rank candidate documents against an already-ingested corpus.

    Output: doc_id, n_grams, n_novel, novelty.  Scale shape: one exploded
    posting relation, one gram-keyed min-aggregation, one gram-keyed join
    back — all linear in corpus grams, the contamination check's shape
    with the corpus playing its own benchmark.
    """
    from .dedup import shingles_col

    grams = docs.select(
        "doc_id", F.explode(shingles_col(F.col(text_col), n)).alias("gram")
    )
    first = grams.groupBy("gram").agg(F.min("doc_id").alias("first_doc"))
    return (
        grams.join(first, "gram")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            ).alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_novel",
            F.round(F.col("n_novel") / F.col("n_grams"), 6).alias("novelty"),
        )
    )


def leakage_free_split(
    docs: DataFrame,
    weights: tuple[float, ...] = (0.8, 0.1, 0.1),
    names: tuple[str, ...] = ("train", "val", "test"),
    pairs: DataFrame | None = None,
    **dedup_kwargs,
) -> DataFrame:
    """Cluster-aware train/val/test split: the near-dup CLUSTER is the
    split unit, so no near-duplicate pair ever straddles a split boundary
    — the structural fix for the train-test leakage Lee et al. 2022
    measured when documents are split independently.

    Assignment is a seedless md5 threshold on the cluster id (the
    stratified-sample rule applied to clusters): deterministic, engine
    replayable, and stable under corpus growth for unchanged clusters.

    Output: doc_id, cluster_id, split.  Scale shape: dup_clusters' cost
    plus one projection; the split itself adds no shuffle.
    """
    if len(weights) != len(names) or not names:
        raise ValueError("weights and names must align")
    if abs(sum(weights) - 1.0) > 1e-9:
        raise ValueError("weights must sum to 1")
    from .dedup import dup_clusters

    clusters = dup_clusters(docs, pairs=pairs, **dedup_kwargs).select(
        "doc_id", "cluster_id"
    )
    frac = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("split:"), F.col("cluster_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        / F.lit(float(1 << 32))
    )
    split = None
    hi = 0.0
    for w, name in zip(weights[:-1], names[:-1]):
        hi += w
        cond = frac < hi
        split = F.when(cond, name) if split is None else split.when(cond, name)
    split = F.lit(names[0]) if split is None else split.otherwise(names[-1])
    return clusters.select("doc_id", "cluster_id", split.alias("split"))


def rag_chunks(
    docs: DataFrame,
    size: int = 32,
    overlap: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """Overlapping retrieval chunks: sliding ``size``-token windows with
    ``overlap`` tokens shared between neighbours (stride = size−overlap) —
    the chunking every RAG indexing pipeline runs before embedding, where
    the overlap keeps sentence context from being cut at window edges.

    Chunk *i* covers tokens ``[i·stride, i·stride + size)``; a document of
    ``n ≤ size`` tokens yields exactly one chunk, else
    ``ceil((n − size)/stride) + 1`` so the final window always reaches the
    last token.  Output: (doc_id, chunk_id, chunk_text, n_tokens).

    Shape: one projection + posexplode — linear in corpus tokens with an
    overlap-factor constant (size/stride), no shuffle at all; the output
    feeds the embedding stage partition-parallel.
    """
    if not 0 <= overlap < size:
        raise ValueError(f"need 0 <= overlap < size, got {overlap}/{size}")
    stride = size - overlap
    spans = bind_col(
        tokens_col(F.col(text_col)),
        lambda toks: F.transform(
            F.sequence(
                F.lit(0),
                F.when(F.size(toks) <= size, F.lit(0)).otherwise(
                    F.ceil(
                        (F.size(toks) - size) / F.lit(float(stride))
                    ).cast("int")
                ),
            ),
            lambda i: F.array_join(F.slice(toks, i * stride + 1, size), " "),
        ),
    )
    out = docs.select(
        "doc_id", F.posexplode(spans).alias("chunk_id", "chunk_text")
    )
    return out.withColumn(
        "n_tokens", F.size(tokens_col(F.col("chunk_text"))).cast("long")
    )
