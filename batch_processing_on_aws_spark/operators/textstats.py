"""Text analysis operators for training-data pipelines (M8).

Language-ID (stopword-hit heuristic), quality scoring, token counting,
and document fingerprinting over the ``documents`` table — all
expressed with built-in JVM functions (split / regexp / array ops /
md5), zero Python UDFs, so they whole-stage-codegen and scale
linearly with no shuffle (they are pure projections).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = r"\s+"
# BPE-ish word/number/punct splitter for token *estimation* — groups
# letter-runs, digit-runs, and single punctuation marks.
BPE_ISH_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# Tiny built-in stopword inventories for the n-gram/stopword language
# heuristic. Deliberately short: the point is a deterministic,
# SQL-expressible scorer, not linguistic completeness.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "it", "for", "was"),
    "fr": ("le", "la", "les", "de", "des", "et", "est", "que", "pour", "dans"),
    "de": ("der", "die", "das", "und", "ist", "von", "zu", "mit", "den", "nicht"),
    "es": ("el", "la", "los", "de", "que", "y", "es", "en", "por", "para"),
}


def tokens(col: Column) -> Column:
    """Whitespace tokens of trimmed text; empty text ⇒ empty array."""
    t = F.trim(col)
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, TOKEN_SPLIT_RE)
    )


def token_count(col: Column) -> Column:
    return F.size(tokens(col)).cast("long")


def bpe_ish_token_count(col: Column) -> Column:
    """Count of BPE-ish sub-word units (letter runs / digit runs /
    punctuation marks) — a cheap proxy for tokenizer cost accounting."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_ISH_RE), 0)).cast("long")


def _count_matches(col: Column, pattern: str) -> Column:
    """Number of matches of ``pattern`` = chars removed when stripping
    them, for single-char classes."""
    return (F.length(col) - F.length(F.regexp_replace(col, pattern, ""))).cast("long")


def text_quality(
    df: DataFrame, text_col: str = "text", keep: tuple[str, ...] = ()
) -> DataFrame:
    """Quality-scoring projection: length, token stats, punctuation /
    digit / uppercase ratios, mean word length. Heuristics follow the
    public C4/Gopher-style filters (length + symbol ratios).

    ``keep`` appends passthrough input columns (round-14) so callers
    composing several per-row gate projections (quality + fingerprint
    + ...) can chain them in ONE scan instead of re-scanning and
    joining per operator."""
    t = F.col(text_col)
    toks = tokens(t)
    n_chars = F.length(t).cast("long")
    n_tokens = F.size(toks).cast("long")
    safe_chars = F.greatest(n_chars, F.lit(1)).cast("double")
    safe_toks = F.greatest(n_tokens, F.lit(1)).cast("double")
    return df.select(
        "doc_id",
        *[F.col(c) for c in keep],
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.round(
            F.aggregate(
                toks, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
            )
            / safe_toks,
            4,
        ).alias("mean_token_len"),
        F.round(_count_matches(t, r"[^A-Za-z0-9\s]") / safe_chars, 4).alias(
            "punct_ratio"
        ),
        F.round(_count_matches(t, r"[0-9]") / safe_chars, 4).alias("digit_ratio"),
        F.round(_count_matches(t, r"[A-Z]") / safe_chars, 4).alias("upper_ratio"),
    )


def language_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Language-ID heuristic: fraction of tokens that are stopwords of
    each candidate language; predicted language = argmax (threshold
    0 ⇒ 'und').

    Shape: explode tokens → per-doc hash-aggregate of stopword hits
    (one ``sum(case when tok in (...))`` per language, codegen'd with
    map-side partials) — ~5× faster than the equivalent
    ``size(filter(tokens, isin))`` array expression, which runs
    interpreted per element. ``explode_outer`` keeps empty documents
    (score 0 / 'und')."""
    toks = F.transform(tokens(F.col(text_col)), lambda x: F.lower(x))
    exploded = df.select(F.col("doc_id"), F.explode_outer(toks).alias("__t"))
    n = F.greatest(F.count("__t"), F.lit(1)).cast("double")
    scored = exploded.groupBy("doc_id").agg(
        *[
            F.round(
                F.sum(F.when(F.col("__t").isin(*sw), 1).otherwise(0)) / n, 4
            ).alias(f"score_{lang}")
            for lang, sw in STOPWORDS.items()
        ]
    )
    langs = list(STOPWORDS)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pred = F.when(best <= 0, F.lit("und"))
    for lang in langs:
        pred = pred.when(F.col(f"score_{lang}") == best, F.lit(lang))
    return scored.select(
        "doc_id", *[f"score_{lang}" for lang in langs], pred.alias("pred_lang")
    )


def fingerprint(
    df: DataFrame, text_col: str = "text", keep: tuple[str, ...] = ()
) -> DataFrame:
    """Document fingerprints: full-text md5 plus a normalized md5
    (lowercased, whitespace-collapsed) that catches
    formatting-only duplicates. ``keep`` appends passthrough input
    columns (see :func:`text_quality`)."""
    t = F.col(text_col)
    norm = F.regexp_replace(F.lower(F.trim(t)), r"\s+", " ")
    return df.select(
        "doc_id",
        *[F.col(c) for c in keep],
        F.md5(t).alias("md5"),
        F.md5(norm).alias("md5_normalized"),
    )


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    n: int = 3,
    partitions: int | None = None,
) -> DataFrame:
    """Within-document repetition signals (Gopher/Dolma-style quality
    filters): over the doc's word ``n``-gram stream —

    - ``total_grams`` / ``distinct_grams``: window count and its
      distinct count (a short doc, ≤ n tokens, is one gram);
    - ``dup_gram_ratio``: 1 − distinct/total — the "fraction of
      duplicated n-grams" filter;
    - ``top_gram_share``: the most frequent gram's share of the stream
      — catches boilerplate loops a global dedup never sees.

    Shape: explode the (non-distinct) gram stream → two-level
    hash-aggregate: (doc, gram) counts, then per-doc sum/count/max.
    Both shuffles carry gram-count rows (≤ tokens per doc), partials
    collapse map-side, and every ratio divides exact integers — so the
    DuckDB oracle matches bit-for-bit. ``explode_outer`` on the
    wrapped-in-when expression keeps empty docs (ratio 0).

    ``fan_out`` first, gram expression INSIDE the generator: a
    single-file corpus scans as one partition, which would run the
    tokenize+window single-core (measured 5× at sf0.1 — same trap as
    ``neardup.shingle_index``, see there and PLANS.md).
    """
    from .partitioning import fan_out

    df = fan_out(df, partitions)
    toks = tokens(F.col(text_col))
    k = F.size(toks)
    # the same windowing as shingles_from_tokens but WITHOUT the
    # distinct — repetition is precisely what distinct destroys
    grams = F.when(k <= n, F.array(F.array_join(toks, " "))).otherwise(
        F.transform(
            F.sequence(F.lit(0), k - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j + 1) for j in range(n)]
            ),
        )
    )
    per_gram = (
        df.select(F.col("doc_id"), F.explode_outer(grams).alias("__g"))
        .groupBy("doc_id", "__g")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    total = F.sum(F.when(F.col("__g").isNotNull(), F.col("__c")).otherwise(0))
    distinct = F.sum(F.when(F.col("__g").isNotNull(), 1).otherwise(0))
    top = F.max(F.when(F.col("__g").isNotNull(), F.col("__c")).otherwise(0))
    safe_total = F.greatest(total, F.lit(1)).cast("double")
    return per_gram.groupBy("doc_id").agg(
        total.cast("long").alias("total_grams"),
        distinct.cast("long").alias("distinct_grams"),
        F.round((total - distinct) / safe_total, 6).alias("dup_gram_ratio"),
        F.round(top / safe_total, 6).alias("top_gram_share"),
    )


def token_rarity_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    rare_max_count: int = 2,
    partitions: int | None = None,
) -> DataFrame:
    """Corpus-frequency-based document quality signals — the
    unigram-LM-score family, kept in exact integer arithmetic so the
    result is bit-stable under any aggregation order (a float
    log-prob sum would depend on partial-aggregation order and break
    cross-engine hashing):

    - ``min_token_freq`` / ``median_token_freq``: corpus frequency of
      the doc's rarest / median token — low values flag
      gibberish-heavy docs;
    - ``rare_token_ratio``: fraction of the doc's tokens whose corpus
      count ≤ ``rare_max_count`` (exact integer ratio).

    Shape: one corpus-wide token hash-agg (map-side partials), then an
    equi-join of the exploded doc tokens to the frequency table, then
    a per-doc hash-agg. Two shuffles on the token key, one on the doc
    key; the frequency table is Zipf-skewed exactly where map-side
    combine absorbs it. ``fan_out`` first — single-file corpora
    otherwise tokenize on one core (see ``repetition_stats``).
    """
    from .partitioning import fan_out

    toks = F.transform(tokens(F.col(text_col)), lambda x: F.lower(x))
    # explode_outer keeps zero-token documents as a single null-token
    # row (same contract as language_scores): every input doc gets an
    # output row — n_tokens 0, null freq stats, ratio 0.0 — instead of
    # silently vanishing from downstream audits
    exploded = fan_out(df, partitions).select(
        F.col(id_col), F.explode_outer(toks).alias("__t")
    )
    freq = (
        exploded.where(F.col("__t").isNotNull())
        .groupBy("__t")
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    joined = exploded.join(freq, "__t", "left")
    n = F.count("__t")  # count() over a column skips nulls
    return joined.groupBy(id_col).agg(
        n.cast("long").alias("n_tokens"),
        F.min("__cnt").cast("long").alias("min_token_freq"),
        # median of integers: exact (midpoint of two ints is .0/.5)
        F.median("__cnt").alias("median_token_freq"),
        F.when(
            n > 0,
            F.round(
                F.sum(F.when(F.col("__cnt") <= rare_max_count, 1).otherwise(0))
                / n,
                4,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("rare_token_ratio"),
    )


def distinctive_tokens(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    partitions: int | None = None,
) -> DataFrame:
    """Per-document top-``k`` distinctive tokens — the tf-idf keyword
    primitive, ranked LEXICOGRAPHICALLY on (tf desc, df asc, token
    asc) instead of the float tf·idf product: the ordering a float
    score induces up to log-monotonicity, with zero floating-point in
    the rank (a float score ties differently across engines; integer
    lexicographic rank is bit-stable — same trade as
    ``token_rarity_stats``).

    Shape: doc-token tf hash-agg → token df hash-agg (distinct docs)
    → equi-join on token → per-doc rank window. The df table is the
    Zipf-skewed side; both aggs take map-side partials, and the
    window partitions by doc (bounded by doc vocabulary).

    Output: (id, token, tf, df, rank 1..k).
    """
    from pyspark.sql import Window

    from .partitioning import fan_out

    toks = F.transform(tokens(F.col(text_col)), lambda x: F.lower(x))
    exploded = fan_out(df, partitions).select(F.col(id_col), F.explode(toks).alias("token"))
    tf = exploded.groupBy(id_col, "token").agg(
        F.count(F.lit(1)).alias("tf")
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy(id_col).orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("token").asc()
    )
    return (
        tf.join(dfreq, "token")
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(id_col, "token", "tf", "df", "rank")
    )


def token_frequencies(
    df: DataFrame,
    text_col: str = "text",
    k: int = 50,
    partitions: int | None = None,
) -> DataFrame:
    """Corpus-level token frequency table (top ``k``): the
    vocabulary-building / heavy-hitter primitive. Lowercased
    whitespace tokens → two-phase hash-aggregate (map-side partials
    mean the shuffle carries one row per distinct token per partition,
    not per occurrence); top-k is deterministic via the (count desc,
    token asc) total order on the tiny aggregated side.

    ``fan_out`` first so a single-file corpus doesn't tokenize on one
    core (see ``repetition_stats``)."""
    from .partitioning import fan_out

    toks = F.transform(tokens(F.col(text_col)), lambda x: F.lower(x))
    return (
        fan_out(df, partitions).select(F.explode(toks).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("occurrences"))
        .orderBy(F.col("occurrences").desc(), F.col("token").asc())
        .limit(k)
    )


def bigram_rarity_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    rare_max_count: int = 2,
    partitions: int | None = None,
) -> DataFrame:
    """Conditional-frequency document signals — the bigram step of the
    LM-score family (`token_rarity_stats` is the unigram step; together
    they give a CCNet-style fluency filter), in the same exact integer
    arithmetic so results are bit-stable under any aggregation order:

    - ``n_bigrams``: positional (token, next-token) pairs in the doc;
    - ``min_bigram_freq`` / ``median_bigram_freq``: corpus frequency
      of the doc's rarest / median bigram — a doc can be built of
      common words in incoherent order, which unigram stats miss and
      low bigram frequency catches;
    - ``rare_bigram_ratio``: fraction of the doc's bigrams whose
      corpus count ≤ ``rare_max_count``.

    Docs with fewer than 2 tokens surface with ``n_bigrams`` 0 and
    null freq stats rather than vanishing (same contract as the
    unigram stats). Shape is identical too: corpus-wide bigram
    hash-agg (map-side partials absorb the Zipf head), equi-join of
    the exploded doc bigrams to the frequency table, per-doc hash-agg.
    The bigram expression stays inside the Generate over the
    materialized token array (see ``shingle_index`` for the pushdown
    trap this avoids)."""
    from .partitioning import fan_out

    toks = F.col("__toks")
    k = F.size(toks)
    bigrams = F.when(
        k >= 2,
        F.transform(
            F.sequence(F.lit(0), k - 2),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i + 1), F.element_at(toks, i + 2)
            ),
        ),
    ).otherwise(F.array(F.lit(None).cast("string")))
    lowered = F.transform(tokens(F.col(text_col)), lambda x: F.lower(x))
    exploded = (
        fan_out(df, partitions)
        .select(F.col(id_col), lowered.alias("__toks"))
        .select(F.col(id_col), F.explode(bigrams).alias("__bg"))
    )
    freq = (
        exploded.where(F.col("__bg").isNotNull())
        .groupBy("__bg")
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    joined = exploded.join(freq, "__bg", "left")
    n = F.count("__bg")
    return joined.groupBy(id_col).agg(
        n.cast("long").alias("n_bigrams"),
        F.min("__cnt").cast("long").alias("min_bigram_freq"),
        F.median("__cnt").alias("median_bigram_freq"),
        F.when(
            n > 0,
            F.round(
                F.sum(F.when(F.col("__cnt") <= rare_max_count, 1).otherwise(0))
                / n,
                4,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("rare_bigram_ratio"),
    )


def bigram_lm_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    partitions: int | None = None,
) -> DataFrame:
    """Bigram language-model fluency score per document — the
    CCNet-style "perplexity under a corpus LM" curation signal, one
    level up from :func:`token_rarity_stats`' unigram family: a doc of
    individually common words in gibberish ORDER scores badly here and
    fine there.

    Model: add-one-smoothed bigram LM trained on the corpus itself —
    p(w₂|w₁) = (c(w₁,w₂) + 1) / (c(w₁,·) + V), V = distinct unigrams.
    Per token the negative log-likelihood is quantized ONCE to
    micro-nats (``round(-ln(p)·10⁶)`` — an exact BIGINT), so every
    aggregation after the quantization is integer arithmetic and the
    result is bit-stable under any partitioning/order — the same trick
    that makes the rest of this module hash-exact cross-engine, here
    buying an actual log-prob score instead of avoiding it. -ln(p) is
    evaluated on (count, count, V) integer triples that both engines
    see identically, so the only float op happens on identical inputs.

    Output per doc: ``n_bigrams`` (0 for docs under 2 tokens),
    ``nll_micro`` (total micro-nats, NULL when no bigrams),
    ``avg_nll`` (mean nats/token as double, the score to threshold
    on; NULL when no bigrams).

    Shape: one corpus bigram hash-agg (map-side partials absorb the
    Zipf head), context counts as a second tiny agg OVER the bigram
    table, V as a broadcast 1-row crossJoin, then an equi-join of the
    exploded doc bigram stream to the two count tables and a per-doc
    hash-agg — two shuffles on narrow keys, no window, no Python.
    """
    from .partitioning import fan_out

    toks = F.transform(tokens(F.col(text_col)), lambda x: F.lower(x))
    docs = fan_out(df, partitions).select(
        F.col(id_col).alias("__id"), toks.alias("__t")
    )
    k = F.size("__t")
    bigrams = F.when(
        k >= 2,
        F.zip_with(
            F.slice("__t", 1, k - 1),
            F.slice("__t", 2, k - 1),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        ),
    )
    stream = docs.select("__id", F.explode_outer(bigrams).alias("bg"))
    pairs = stream.where(F.col("bg").isNotNull()).select(
        "__id", "bg.w1", "bg.w2"
    )
    c2 = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("__c2"))
    c1 = c2.groupBy("w1").agg(F.sum("__c2").alias("__c1"))
    vocab = docs.select(F.explode("__t").alias("u")).agg(
        F.countDistinct("u").alias("__v")
    )
    nll_micro = F.round(
        -F.log((F.col("__c2") + 1) / (F.col("__c1") + F.col("__v")))
        * F.lit(1_000_000.0)
    ).cast("long")
    scored = (
        pairs.join(c2, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .select("__id", nll_micro.alias("__nm"))
        .groupBy("__id")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum("__nm").alias("nll_micro"),
        )
    )
    base = docs.select(F.col("__id")).distinct()
    return base.join(scored, "__id", "left").select(
        F.col("__id").alias(id_col),
        F.coalesce(F.col("__n"), F.lit(0)).cast("long").alias("n_bigrams"),
        F.col("nll_micro"),
        F.round(
            F.col("nll_micro") / F.col("__n") / F.lit(1_000_000.0), 6
        ).alias("avg_nll"),
    )


def bm25_partial_micro(
    tf: Column,
    doc_len: Column,
    df_count: Column,
    n_docs: Column,
    sum_len: Column,
    k1: float = 1.2,
    b: float = 0.75,
) -> Column:
    """Per-(doc, term) BM25 partial score in micro-units BIGINT —
    the ONE shared float expression behind :func:`bm25_search` and
    the standing :class:`~.text_index.TextIndex`, so one-shot search
    and the incrementally-maintained index cannot drift apart. All
    five operands are exact BIGINTs; the constants are written as
    float EXPRESSIONS ((k1 + 1.0), (1.0 − b)) so the engine and the
    DuckDB oracle round identically (the bigram-LM pattern)."""
    avg_len = sum_len / n_docs
    idf = F.log(
        F.lit(1.0) + (n_docs - df_count + F.lit(0.5)) / (df_count + F.lit(0.5))
    )
    tf_norm = (tf * F.lit(k1 + 1.0)) / (
        tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * doc_len / avg_len)
    )
    return F.round(idf * tf_norm * F.lit(1_000_000.0)).cast("long")


def bm25_search(
    df: DataFrame,
    query_terms: Sequence[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 10,
    partitions: int | None = None,
) -> DataFrame:
    """BM25 ranked retrieval over the corpus — the query-mining
    primitive (find the documents most relevant to a probe query:
    seed-document expansion, topic auditing, eval-set curation).
    Robertson/Sparck Jones weights in the Lucene formulation:
    idf = ln(1 + (N − df + 0.5)/(df + 0.5)), tf-saturated by
    k1 and length-normalized by b against the corpus mean length.

    Cross-engine exactness: tf/df/doc_len/N are exact integers,
    avg_len is ONE division of two BIGINTs, each (doc, term) partial
    score is a single float expression over those identical operands
    quantized to micro-units BIGINT, and the doc score is the integer
    SUM of its term partials (the bigram-LM pattern) — so ranking and
    scores replay hash-exact in SQL.

    Shape: the token stream is filtered to the probe terms BEFORE any
    aggregation (an isin over a literal list — Catalyst folds it into
    the scan-side filter), so tf/df aggregate only matching
    postings; N and avg_len ride as broadcast 1-row scalars; the
    final top-k is a global ``orderBy(...).limit(k)`` which compiles
    to TakeOrderedAndProject (never a single-reducer window).
    """
    from .partitioning import fan_out

    terms = [t.lower() for t in query_terms]
    toks = F.transform(tokens(F.col(text_col)), lambda x: F.lower(x))
    docs = fan_out(df, partitions).select(
        F.col(id_col), toks.alias("__t")
    )
    lens = docs.select(
        F.col(id_col), F.size("__t").cast("long").alias("__len")
    )
    postings = (
        docs.select(F.col(id_col), F.explode("__t").alias("__tok"))
        .where(F.col("__tok").isin(terms))
        .groupBy(id_col, "__tok")
        .agg(F.count(F.lit(1)).cast("long").alias("__tf"))
    )
    dfreq = postings.groupBy("__tok").agg(
        F.count(F.lit(1)).cast("long").alias("__df")
    )
    totals = lens.agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum("__len").alias("__sumlen"),
    )
    part_micro = bm25_partial_micro(
        F.col("__tf"), F.col("__len"), F.col("__df"),
        F.col("__n"), F.col("__sumlen"), k1=k1, b=b,
    )
    scored = (
        postings.join(lens, id_col)
        .join(F.broadcast(dfreq), "__tok")
        .crossJoin(F.broadcast(totals))
        .select(F.col(id_col), part_micro.alias("__pm"))
        .groupBy(id_col)
        .agg(F.sum("__pm").cast("long").alias("score_micro"))
    )
    return scored.orderBy(
        F.col("score_micro").desc(), F.col(id_col).asc()
    ).limit(top_k)


def phrase_search(
    df: DataFrame,
    phrase: Sequence[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    partitions: int | None = None,
) -> DataFrame:
    """Exact phrase matching over the corpus — the positional-postings
    query BM25's bag-of-terms ranking cannot answer (Lucene's
    PhraseQuery): a document matches where the phrase's tokens occur
    at CONSECUTIVE positions. Output: (id, n_matches, first_pos),
    matched docs only; positions are 0-based token offsets.

    Shape: ONE posexplode of the token stream filtered to the phrase's
    terms BEFORE aggregation (original positions survive the filter,
    so consecutiveness is checked on the true token offsets while the
    exploded stream is O(matching tokens), never O(corpus tokens));
    one per-doc hash-agg collects each term's position list; the
    consecutive-run check is a per-row array filter —
    ``p ∈ pos(t₁) with p+i ∈ pos(tᵢ₊₁) ∀i`` — fully JVM-side, so the
    DuckDB oracle replays it with ``list_filter``/``list_contains``
    verbatim. Repeated terms inside the phrase work (each position
    list is collected per DISTINCT term). No window, no self-join:
    the per-doc state is bounded by the phrase terms' occurrence
    count."""
    from .partitioning import fan_out

    terms = [t.lower() for t in phrase]
    if not terms:
        raise ValueError("empty phrase")
    uniq = sorted(set(terms))
    toks = F.transform(tokens(F.col(text_col)), lambda x: F.lower(x))
    pos = (
        fan_out(df, partitions)
        .select(F.col(id_col), F.posexplode(toks).alias("__p", "__tok"))
        .where(F.col("__tok").isin(uniq))
    )
    per_term = [
        F.sort_array(
            F.collect_list(
                F.when(F.col("__tok") == t, F.col("__p"))
            )
        ).alias(f"__pos_{i}")
        for i, t in enumerate(uniq)
    ]
    grouped = pos.groupBy(id_col).agg(*per_term)
    idx = {t: i for i, t in enumerate(uniq)}
    starts = F.col(f"__pos_{idx[terms[0]]}")
    matches = F.filter(
        starts,
        lambda p: _phrase_tail_check(p, terms, idx),
    )
    return (
        grouped.select(
            F.col(id_col),
            F.size(matches).cast("long").alias("n_matches"),
            F.array_min(matches).cast("long").alias("first_pos"),
        )
        .where(F.col("n_matches") > 0)
    )


def _phrase_tail_check(p, terms, idx):
    """Predicate for one candidate start ``p``: every later phrase
    term must occur at its offset. Built as a fold of
    ``array_contains`` columns — pure JVM expressions."""
    cond = F.lit(True)
    for off, t in enumerate(terms[1:], start=1):
        cond = cond & F.array_contains(
            F.col(f"__pos_{idx[t]}"), p + F.lit(off)
        )
    return cond


def phrase_snippets(
    df: DataFrame,
    phrase: Sequence[str],
    context: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keyword-in-context snippets for a phrase — the search-result
    presentation step on top of :func:`phrase_search`: matched docs
    with ``context`` tokens of surrounding text around the FIRST
    occurrence. Output: (id, n_matches, first_pos, snippet), matched
    docs only; the snippet is the lowercased token window rejoined
    with single spaces (matching is case-folded, so the excerpt is
    too).

    Shape: ZERO shuffle — candidate starts enumerate per-row
    (``sequence(0, len−k)`` filtered by a positional token compare),
    the window is an ``slice`` + ``array_join``, all inside
    whole-stage codegen. The per-row scan touches every doc's token
    array (no posting-filter prune), which is the right trade for a
    presentation query that runs AFTER retrieval narrowed the set;
    for corpus-wide match mining use :func:`phrase_search` (filtered
    posexplode) or the standing index's positional postings."""
    terms = [t.lower() for t in phrase]
    if not terms:
        raise ValueError("empty phrase")
    k = len(terms)
    # substring prefilter (round-14): a doc can only match if every
    # term appears as a substring of the lowercased text — tokens are
    # whitespace splits, so token equality implies containment. The
    # contains() chain runs in whole-stage codegen BEFORE the
    # tokenize + per-position enumeration, which is the expensive
    # part; non-matching docs (the vast majority) never pay it.
    # Conservative (never drops a match): false positives proceed to
    # the exact positional compare below.
    pre = df
    low = F.lower(F.col(text_col))
    for t in terms:
        pre = pre.where(low.contains(F.lit(t)))
    toks = F.transform(tokens(F.col(text_col)), lambda x: F.lower(x))
    base = pre.select(F.col(id_col), toks.alias("__t"))
    n = F.size("__t")

    def is_match(p):
        cond = F.lit(True)
        for i, t in enumerate(terms):
            cond = cond & (
                F.element_at(F.col("__t"), p + F.lit(i + 1)) == F.lit(t)
            )
        return cond

    starts = F.when(
        n >= k, F.filter(F.sequence(F.lit(0), n - k), is_match)
    ).otherwise(F.array().cast("array<int>"))
    # `__s` rides through a single-element explode (round-14): with a
    # plain Project + `size(__s) > 0` filter, predicate pushdown
    # substitutes the FULL tokenize+enumerate expression into the
    # Filter — every element_at re-derives transform(split(text))
    # from scratch below the projection (measured 14x the projection
    # cost at sf0.1: 3.5 s vs 0.25 s; Spark 4 pushes through a
    # Project even when the condition is nondeterministic-tainted).
    # A filter on a GENERATOR output cannot be pushed below its
    # Generate, so the enumeration runs exactly once per doc —
    # the established shingle_index idiom (operators/neardup.py).
    # explode(array(x)) emits exactly one row per doc: row set
    # unchanged, still zero shuffle.
    with_starts = base.select(
        F.col(id_col), F.col("__t"), F.explode(F.array(starts)).alias("__s")
    ).where(F.size("__s") > 0)
    first = F.array_min(F.col("__s"))
    win_start = F.greatest(first + F.lit(1 - context), F.lit(1))
    win_end = F.least(first + F.lit(k + context), F.size("__t"))
    return with_starts.select(
        F.col(id_col),
        F.size("__s").cast("long").alias("n_matches"),
        first.cast("long").alias("first_pos"),
        F.array_join(
            F.slice(F.col("__t"), win_start, win_end - win_start + F.lit(1)),
            " ",
        ).alias("snippet"),
    )


def tfidf_cosine_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    max_df: int = 50,
    partitions: int | None = None,
) -> DataFrame:
    """All-pairs TF-IDF cosine similarity join — the WEIGHTED sibling
    of the set-similarity pair miners (``neardup.rare_jaccard_pairs``
    counts shared members; this weighs them): SMART "ltc" weights
    w = (1 + ln tf) · ln((N+1)/(df+1)), pairs scored by the cosine of
    their weight vectors. Catches templated rewrites that shuffle
    common words (Jaccard-blind) while staying robust to padding
    (containment-blind) — the near-dup lens production text curation
    runs alongside MinHash.

    Candidate contract (same as the rare-shingle family): a pair is
    considered iff it shares ≥ 1 DISTINCTIVE term (document frequency
    ≤ ``max_df``). Pairs glued together only by stopword-frequency
    terms are excluded BY DEFINITION — at corpus scale those carry no
    similarity signal, and the cap bounds the self-join fan-out at
    max_df² per term. The cosine itself is then EXACT over the FULL
    weight vectors of each candidate pair (every shared term, common
    or rare, contributes to the dot product).

    Cross-engine exactness: tf/df/N are exact integers; each (doc,
    term) weight is ONE float expression over them quantized to
    milli-units BIGINT (the ``bm25_search`` pattern) — the integer
    vector IS the operator's definition, so dot products and norms
    are overflow-safe BIGINT sums (w ≤ ~2.4e5 even at N=1e10 docs,
    tf=1e4 ⇒ Σw² ≤ ~5.5e15 ≪ 2⁶³) and the final cosine is one float
    expression (dot / (√norm_a·√norm_b)) over identical integers,
    micro-quantized. A SQL oracle replays everything hash-exact.

    Plan shape: one explode + hash-agg builds postings; df and N ride
    as one shuffle join + one broadcast scalar; the weights table is
    localCheckpoint'd once (it feeds the norm agg, both self-join
    sides, and both dot-product sides); candidates come from the
    df-capped self-join; the dot product is two hash joins + one
    hash-agg. No windows, no cartesians, nothing data-sized on the
    driver.

    Output: (doc_id_a < doc_id_b, cosine_micro BIGINT ≥
    threshold·1e6).
    """
    from .partitioning import fan_out

    toks = F.transform(tokens(F.col(text_col)), lambda x: F.lower(x))
    docs = fan_out(df, partitions).select(
        F.col(id_col).alias("__id"), toks.alias("__t")
    )
    post = (
        docs.select("__id", F.explode("__t").alias("__tok"))
        .groupBy("__id", "__tok")
        .agg(F.count(F.lit(1)).cast("long").alias("__tf"))
    )
    dfreq = post.groupBy("__tok").agg(
        F.count(F.lit(1)).cast("long").alias("__df")
    )
    totals = docs.agg(F.count(F.lit(1)).cast("long").alias("__n"))
    w_milli = F.round(
        (F.lit(1.0) + F.log(F.col("__tf")))
        * F.log((F.col("__n") + F.lit(1.0)) / (F.col("__df") + F.lit(1.0)))
        * F.lit(1000.0)
    ).cast("long")
    # materialize the narrow weight table once: it feeds four
    # consumers (norm agg, both candidate self-join sides via `rare`,
    # both dot-product sides) and would otherwise re-run the
    # explode+agg subtree for each
    weights = (
        post.join(dfreq, "__tok")
        .crossJoin(F.broadcast(totals))
        .select("__id", "__tok", w_milli.alias("__w"), "__df")
        .where(F.col("__w") > 0)
        .localCheckpoint()
    )
    norms = weights.groupBy("__id").agg(
        F.sum(F.col("__w") * F.col("__w")).alias("__nsq")
    )
    rare = weights.where(F.col("__df") <= max_df).select("__id", "__tok")
    pairs = (
        rare.alias("a")
        .join(
            rare.alias("b"),
            on=[
                F.col("a.__tok") == F.col("b.__tok"),
                F.col("a.__id") < F.col("b.__id"),
            ],
        )
        .select(
            F.col("a.__id").alias("__ida"), F.col("b.__id").alias("__idb")
        )
        .distinct()
    )
    dot = (
        pairs.join(
            weights.select(
                F.col("__id").alias("__ida"), "__tok",
                F.col("__w").alias("__wa"),
            ),
            "__ida",
        )
        .join(
            weights.select(
                F.col("__id").alias("__idb"), "__tok",
                F.col("__w").alias("__wb"),
            ),
            ["__idb", "__tok"],
        )
        .groupBy("__ida", "__idb")
        .agg(F.sum(F.col("__wa") * F.col("__wb")).alias("__dot"))
    )
    cos_micro = F.round(
        F.col("__dot")
        / (F.sqrt(F.col("__na")) * F.sqrt(F.col("__nb")))
        * F.lit(1_000_000.0)
    ).cast("long")
    return (
        dot.join(
            norms.select(
                F.col("__id").alias("__ida"), F.col("__nsq").alias("__na")
            ),
            "__ida",
        )
        .join(
            norms.select(
                F.col("__id").alias("__idb"), F.col("__nsq").alias("__nb")
            ),
            "__idb",
        )
        .select(
            F.col("__ida").alias("doc_id_a"),
            F.col("__idb").alias("doc_id_b"),
            cos_micro.alias("cosine_micro"),
        )
        .where(
            F.col("cosine_micro") >= F.lit(int(round(threshold * 1_000_000)))
        )
    )
