"""URL extraction, normalization, and domain statistics (extension
surface; M-ops).

Web-derived training corpora carry URLs both as metadata and inline in
text; curation needs (a) per-document link extraction, (b) a canonical
URL form so the same resource dedups across cosmetic variants, and
(c) per-domain corpus statistics (the standard input to domain-level
quality weighting and blocklists).

Extraction and normalization are pure JVM regex projections — no
shuffle, no Python. The domain rollup is one hash-agg with map-side
partials: at 100 TB the only exchange is on the (low-cardinality,
possibly skewed) domain key, and hot domains are exactly the
map-side-combine friendly case.

Patterns stay inside the Java/RE2 shared regex subset (no lookaround,
no backreferences) so the DuckDB oracle runs them verbatim.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# the final alternation refuses sentence punctuation, so a URL at the
# end of a clause ('see https://x.com.' / '(https://x.com/y)') doesn't
# swallow the terminator into the host/path — without this the
# blocklist gate compares 'bad.com.' against 'bad.com' and misses.
# Balanced '( … )' groups are matched as single units (body and final
# alternation), so the common wiki-text shape
# ('https://en.wikipedia.org/wiki/Foo_(bar)') keeps its parens while a
# clause-closing bare ')' is still refused — a unit pops off whole
# under backtracking, which a flat [^\s]* body would prevent (it eats
# the '(' and the terminal alternative can never win). The body is *
# (not +) so single-character hosts ('https://x') match too. Cost:
# UNbalanced parens mid-URL now truncate at the '(' — the rarer shape.
# Still lookaround/backreference-free: runs verbatim on Java AND RE2
# (both use leftmost-first alternation semantics).
URL_RE = r"https?://(?:[^\s()]|\([^\s()]*\))*(?:\([^\s()]*\)|[^\s.,;:!?)(\]])"
# host = authority up to the first '/', '?', '#', or ':' (port dropped)
_HOST_RE = r"^https?://([^/?#:\s]+)"
# path = everything after the authority, before query/fragment
_PATH_RE = r"^https?://[^/?#\s]+([^?#\s]*)"


def extract_urls(col: Column) -> Column:
    """Array of raw URL matches in a text column."""
    return F.regexp_extract_all(col, F.lit(URL_RE), F.lit(0))


def url_domain(url: Column) -> Column:
    """Lower-cased host with any leading ``www.`` stripped."""
    host = F.lower(F.regexp_extract(url, _HOST_RE, 1))
    return F.regexp_replace(host, r"^www\.", "")


def normalize_url(url: Column) -> Column:
    """Canonical form: https scheme, normalized domain, path as-is
    (query string and fragment dropped — the classic tracking-param
    scrub, coarse-grained on purpose: exact query semantics are
    site-specific and a curation dedup wants recall)."""
    return F.concat(
        F.lit("https://"), url_domain(url), F.regexp_extract(url, _PATH_RE, 1)
    )


def doc_urls(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One row per (document, URL occurrence): raw match, normalized
    form, domain. Explode of a regex-extract array — the generator
    runs after whatever partitioning the scan has; no shuffle."""
    url = F.explode(extract_urls(F.col(text_col))).alias("url")
    return df.select(F.col(id_col), url).select(
        F.col(id_col),
        "url",
        normalize_url(F.col("url")).alias("normalized_url"),
        url_domain(F.col("url")).alias("domain"),
    )


def domain_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-domain corpus statistics: URL occurrences, distinct
    normalized URLs, distinct documents. One exchange (hash-agg on
    domain); distinct counts are exact (two-level agg under AQE)."""
    u = doc_urls(df, text_col, id_col)
    return u.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.countDistinct("normalized_url").alias("n_unique_urls"),
        F.countDistinct(id_col).alias("n_docs"),
    )


def filter_blocklisted_docs(
    df: DataFrame,
    blocklist: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    domain_col: str = "domain",
) -> DataFrame:
    """Drop every document that links to ANY blocklisted domain — the
    standard web-corpus hygiene gate (spam/adult/malware domain lists).

    The blocklist arrives as a DataFrame (domains are data, not code:
    lists are large, versioned, and change without redeploys). Plan:
    extract per-doc domains (map-only), LEFT SEMI join doc-ids against
    the blocklist collisions, then LEFT ANTI the originals — two
    narrow id-keyed shuffles; the blocklist side broadcasts when small
    (the common case: even huge public lists are ~1M rows of short
    strings). Matching is on the normalized (lowercased, www-stripped)
    registered host, exact — subdomain-suffix policies belong in the
    blocklist expansion step, not the join.
    """
    hits = (
        doc_urls(df, text_col, id_col)
        .join(
            F.broadcast(blocklist.select(F.col(domain_col).alias("domain"))),
            "domain",
            "left_semi",
        )
        .select(id_col)
    )
    return df.join(hits, id_col, "left_anti")
