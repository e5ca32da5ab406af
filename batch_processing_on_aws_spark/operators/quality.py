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
    weights: dict | None = None,
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
    w = QUALITY_WEIGHTS if weights is None else weights
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


def _logit_features(row) -> list[float]:
    """The classifier's feature transform, shared by the Spark-side
    trainer and the oracle generator so their design matrices are
    bit-identical: [bounded-len, bounded-stop, alpha, symbol, mwl] —
    the SAME transform (and the same ORDER as the weight keys len/
    stop/alpha/symbol/mwl) that :func:`quality_logit` applies."""
    return [
        min(row["word_count"], 500) / 500.0,
        min(row["stopword_hits"], 20) / 20.0,
        row["alpha_word_ratio"],
        row["symbol_word_ratio"],
        row["mean_word_len"],
    ]


def _fit_logistic(X, y, n_iter: int, lr: float, l2: float):
    """Full-batch gradient descent on standardized features — one pure
    deterministic numpy function, shared verbatim by the Spark-side
    trainer and the DuckDB oracle generator so both produce IDENTICAL
    float64 weights from an identical (identically ORDERED) sample.
    Returns (bias, weights) in the ORIGINAL feature space."""
    import numpy as np

    X = np.asarray(X, dtype="float64")
    y = np.asarray(y, dtype="float64")
    mu = X.mean(axis=0)
    sd = X.std(axis=0)
    sd = np.where(sd == 0.0, 1.0, sd)
    Xs = (X - mu) / sd
    n, d = Xs.shape
    w = np.zeros(d)
    b = 0.0
    for _ in range(n_iter):
        z = Xs @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        err = p - y
        w -= lr * (Xs.T @ err / n + l2 * w)
        b -= lr * float(err.mean())
    w_raw = w / sd
    b_raw = b - float((w * mu / sd).sum())
    return b_raw, w_raw


def train_quality_classifier(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    label_col: Column | None = None,
    n_train: int = 4096,
    n_iter: int = 300,
    lr: float = 1.0,
    l2: float = 1e-3,
    seed: int = 42,
) -> dict:
    """TRAIN the linear quality classifier instead of shipping fixed
    weights — the missing step between the Gopher features and
    :func:`quality_logit`'s scoring projection (production pipelines
    train fastText/logistic classifiers on labeled seed sets; this is
    the linear case, in-engine). Labels default to the Gopher rule
    verdict (``keep``), i.e. distilling the hard rule set into a
    smooth, thresholdable score; pass ``label_col`` (a 0/1 column on
    the gopher_quality output) for real labels.

    Scale shape — the k-means/IVF pattern exactly
    (similarity._train_centroids): the trainer sees only a BOUNDED
    deterministic sample (the ``n_train`` rows with the smallest
    ``md5(seed || ':' || id)``, a TakeOrdered — no full sort, no
    corpus shuffle) and fits driver-side with numpy; the CORPUS-sized
    work is the scoring projection, which stays zero-shuffle. md5
    rather than xxhash64 so the draw — and therefore the trained
    weights — reproduce outside Spark, which is what lets the DuckDB
    oracle re-train identical weights and inline them as literals.

    Returns the weight dict in :data:`QUALITY_WEIGHTS` form
    (bias/len/stop/alpha/symbol/mwl), ready for
    ``quality_logit(df, weights=...)``.
    """
    stats = gopher_quality(df, text_col=text_col, id_col=id_col)
    label = F.col("keep").cast("double") if label_col is None else label_col
    sample = (
        stats.select(
            F.col(id_col).alias("__id"),
            "word_count",
            "stopword_hits",
            "alpha_word_ratio",
            "symbol_word_ratio",
            "mean_word_len",
            label.alias("__y"),
        )
        .orderBy(
            F.md5(F.concat(F.lit(f"{seed}:"), F.col("__id").cast("string"))),
            F.col("__id"),
        )
        .limit(n_train)
        .collect()
    )
    X = [_logit_features(r) for r in sample]
    y = [float(r["__y"]) for r in sample]
    b, w = _fit_logistic(X, y, n_iter=n_iter, lr=lr, l2=l2)
    return {
        "bias": float(b),
        "len": float(w[0]),
        "stop": float(w[1]),
        "alpha": float(w[2]),
        "symbol": float(w[3]),
        "mwl": float(w[4]),
    }
