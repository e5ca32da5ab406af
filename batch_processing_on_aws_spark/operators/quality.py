"""Gopher-style document quality rules (extension surface; M-ops).

The rule set published with Gopher (Rae et al. 2021, "Scaling Language
Models: ...", App. A1.1) is the de-facto baseline heuristic filter for
web-scale LLM corpora: bounds on word count and mean word length,
caps on symbol ratios, a floor on the fraction of alphabetic words,
and a minimum number of stop-word hits. This module evaluates each
rule as an independent boolean column plus the conjunction, so a
curation plan can either hard-filter (``where(keep)``) or keep the
flags for analysis/ablation.

Everything is a single JVM-side projection over the token array
(``split`` + higher-order functions) — no shuffle, no Python, no
second pass; the flags pipeline into the same scan as the rest of the
curation stack. At 100 TB this adds zero exchanges to the plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import tokens

# Small, fixed stop-word list (subset of the classic English list the
# Gopher rule uses). Kept short and inlined: the rule is "at least
# min_stopword_hits occurrences of ANY of these", not full-list
# coverage.
STOPWORDS: tuple[str, ...] = ("the", "a", "an", "of", "to", "and", "in", "is", "that", "with")


def gopher_quality(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 20,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    min_alpha_word_ratio: float = 0.8,
    min_stopword_hits: int = 2,
) -> DataFrame:
    """Evaluate the Gopher quality rules per document.

    Output: (id, word_count, mean_word_len, symbol_word_ratio,
    alpha_word_ratio, stopword_hits, flag_* booleans, keep).

    Ratios are single double divisions of exact integers — identical
    in any engine — and rounded to 4 decimals for portable hashing.
    """
    toks = tokens(F.col(text_col))
    base = df.select(F.col(id_col), toks.alias("__toks"))

    n = F.size(F.col("__toks"))
    total_chars = F.aggregate(
        F.transform(F.col("__toks"), F.length),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    n_symbol = F.aggregate(
        F.transform(
            F.col("__toks"),
            lambda t: F.regexp_count(t, F.lit(r"(#|\.\.\.)")),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    n_alpha = F.size(
        F.filter(F.col("__toks"), lambda t: t.rlike("[A-Za-z]"))
    )
    # lowercase before matching, like every sibling operator
    # (token_rarity_stats, distinctive_tokens, language_scores) — a
    # Title-Case headline's 'The'/'In' are still stopword hits
    n_stop = F.size(
        F.filter(F.col("__toks"), lambda t: F.lower(t).isin(*STOPWORDS))
    )

    stats = base.select(
        F.col(id_col),
        n.cast("long").alias("word_count"),
        F.when(n > 0, F.round(total_chars.cast("double") / n, 4))
        .otherwise(F.lit(0.0))
        .alias("mean_word_len"),
        F.when(n > 0, F.round(n_symbol.cast("double") / n, 4))
        .otherwise(F.lit(0.0))
        .alias("symbol_word_ratio"),
        F.when(n > 0, F.round(n_alpha.cast("double") / n, 4))
        .otherwise(F.lit(0.0))
        .alias("alpha_word_ratio"),
        n_stop.cast("long").alias("stopword_hits"),
    )
    flags = stats.select(
        "*",
        F.col("word_count").between(min_words, max_words).alias("flag_word_count"),
        F.col("mean_word_len")
        .between(min_mean_word_len, max_mean_word_len)
        .alias("flag_mean_word_len"),
        (F.col("symbol_word_ratio") <= max_symbol_word_ratio).alias(
            "flag_symbol_ratio"
        ),
        (F.col("alpha_word_ratio") >= min_alpha_word_ratio).alias(
            "flag_alpha_ratio"
        ),
        (F.col("stopword_hits") >= min_stopword_hits).alias("flag_stopwords"),
    )
    keep = (
        F.col("flag_word_count")
        & F.col("flag_mean_word_len")
        & F.col("flag_symbol_ratio")
        & F.col("flag_alpha_ratio")
        & F.col("flag_stopwords")
    )
    return flags.select("*", keep.alias("keep"))


# Fixed, interpretable weights for the linear quality model below —
# illustrative stand-ins in the spirit of a trained fasttext/logistic
# quality classifier (the deployment slot for real trained weights).
# Kept as module constants so the DuckDB oracle inlines the SAME
# numbers.
QUALITY_WEIGHTS = {
    "bias": -1.5,
    "len": 2.0,       # bounded word-count feature, LEAST(n,500)/500
    "stop": 0.8,      # bounded stopword-hit feature, LEAST(h,20)/20
    "alpha": 1.5,     # alpha-word ratio
    "symbol": -6.0,   # symbol-word ratio (strong penalty)
    "mwl": 0.1,       # mean word length
}


def quality_logit(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Linear quality-classifier score — the model-based stage stacked
    on the Gopher rule features (the CCNet/fasttext-classifier shape:
    handcrafted features x fixed weights -> log-odds). Emits the raw
    logit, not a sigmoid: +, x and / on doubles are exactly specified
    by IEEE 754 and reproduce bit-for-bit in any engine when the
    association order matches, while exp() is libm-dependent — so the
    logit hashes cross-engine and the sigmoid would not. A threshold
    on the logit IS a threshold on the probability (monotone), so
    nothing is lost: ``keep`` = logit > 0 = p > 0.5.

    Output: (id, quality_logit rounded to 6, keep). Zero shuffles —
    one projection pipelined into the Gopher feature scan.

    Scale note: features are the exact-ratio columns of
    :func:`gopher_quality`; the weights are module constants
    (``QUALITY_WEIGHTS``) so the oracle and any retrained deployment
    agree on a single source of truth.
    """
    w = QUALITY_WEIGHTS
    stats = gopher_quality(df, text_col=text_col, id_col=id_col)
    f_len = F.least(F.col("word_count"), F.lit(500)).cast("double") / 500.0
    f_stop = F.least(F.col("stopword_hits"), F.lit(20)).cast("double") / 20.0
    # association order is part of the cross-engine contract: the SQL
    # oracle writes the same left-to-right chain
    z = (
        F.lit(w["bias"])
        + F.lit(w["len"]) * f_len
        + F.lit(w["stop"]) * f_stop
        + F.lit(w["alpha"]) * F.col("alpha_word_ratio")
        + F.lit(w["symbol"]) * F.col("symbol_word_ratio")
        + F.lit(w["mwl"]) * F.col("mean_word_len")
    )
    return stats.select(
        F.col(id_col),
        F.round(z, 6).alias("quality_logit"),
        (z > 0.0).alias("keep"),
    )
