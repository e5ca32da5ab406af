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
