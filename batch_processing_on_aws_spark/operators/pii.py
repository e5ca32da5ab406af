"""PII detection and redaction (extension surface; LLM-curation M-ops).

Training-data pipelines scrub personally identifiable information
before a corpus ships: emails, IP addresses, SSNs, phone numbers get
masked with typed placeholder tokens, and per-document match counts
feed the curation audit trail (how much PII did this source carry?).

All detection is JVM-side regex (``regexp_count`` /
``regexp_replace``) — a pure projection, no shuffle, no Python. At
100 TB this is a map-only pass that pipelines into whatever scan the
curation plan already does; the count aggregation (if requested) is a
hash-agg with map-side partials.

The patterns deliberately use only the regex subset shared by Java's
engine (Spark) and RE2 (DuckDB, the correctness oracle): character
classes, bounded repetition, non-capturing groups, ``\\b`` word
boundaries. No backreferences, no lookaround — which RE2 rejects —
so every pattern runs identically in both engines AND stays
linear-time (lookaround-free regex is what you want on adversarial
100 TB text anyway: Java's backtracking engine degrades
super-linearly on pathological inputs otherwise).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Ordered: masks are applied in this sequence, and each category's
# COUNT is measured on the text as already masked by the previous
# stages — so the audit counts always equal the placeholder tokens
# actually emitted, even for nested spans (an IP or phone inside an
# email local part is consumed by the earlier email mask and counted
# zero, exactly matching the redacted output).
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ipv4": (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    "ssn": (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    "phone": (r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
}


def pii_count(col: Column, kind: str) -> Column:
    """Number of matches of one PII pattern in the RAW text column.

    NOT the same number as :func:`redact_pii`'s ``n_<kind>`` for
    nested spans: redact_pii counts each category on the text as
    already masked by the previous categories (an IP inside an email
    local part counts 0 there because the email mask consumed it),
    while this helper sees the unmasked text and counts it. Use
    redact_pii's columns when the audit must reconcile with the
    redacted output; use this for standalone raw-prevalence scans."""
    pattern, _ = PII_PATTERNS[kind]
    return F.regexp_count(col, F.lit(pattern))


def redact(col: Column, kinds: tuple[str, ...] = tuple(PII_PATTERNS)) -> Column:
    """Text with every match of the selected patterns replaced by its
    typed placeholder. ``regexp_replace`` replaces ALL occurrences in
    both Spark and DuckDB (the latter with the 'g' flag in the oracle
    twin)."""
    out = col
    for kind in kinds:
        pattern, token = PII_PATTERNS[kind]
        out = F.regexp_replace(out, pattern, token)
    return out


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document PII scrub: match counts per category plus the
    fully redacted text. Each count is measured AFTER the previous
    categories' masks (see PII_PATTERNS), so per category
    ``n_<kind> == redacted.count('<KIND>')`` holds exactly — the
    invariant tests/test_curation_properties.py pins.

    Output: (id, n_email, n_ipv4, n_ssn, n_phone, redacted).
    """
    staged = F.col(text_col)
    counts = []
    for kind in PII_PATTERNS:
        pattern, token = PII_PATTERNS[kind]
        counts.append(F.regexp_count(staged, F.lit(pattern)).alias(f"n_{kind}"))
        staged = F.regexp_replace(staged, pattern, token)
    return df.select(F.col(id_col), *counts, staged.alias("redacted"))


def k_anonymity_violations(
    df: DataFrame,
    quasi_cols: list[str],
    k: int = 5,
) -> DataFrame:
    """Quasi-identifier combinations shared by FEWER than ``k`` rows
    — the re-identification risk audit (Sweeney 2002: a record is
    k-anonymous when at least k−1 others share its quasi-identifier
    tuple; small equivalence classes are the linkable ones). The
    release-gate companion to regex PII scrubbing: redaction removes
    DIRECT identifiers, this measures whether the remaining
    attribute combinations still single people out.

    Output: one row per violating combination (quasi columns,
    n_rows) — the worklist for suppression or generalization.
    ONE hash-agg with map-side partials (NULL is a value: an absent
    attribute still forms an equivalence class); at 100 TB the
    grouping is the same shuffle any per-group audit pays, and the
    output is bounded by the violating-class count, not the table."""
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
        .where(F.col("n_rows") < k)
    )
