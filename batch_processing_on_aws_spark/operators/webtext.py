"""HTML → main-text extraction (extension surface; LLM-pipeline web
corpus preparation).

Every web-scale training corpus starts as crawled HTML; the first
pipeline stage strips markup, scripts, styles, and entities down to
the running text (the role trafilatura/jusText/BeautifulSoup play in
single-node pipelines — e.g. the C4 and RefinedWeb preparation steps).
The reference consumes pre-extracted CSV/JSON
(journey-data-transformation.py:36-60 reads already-tabular rides), so
this is engine extension, not parity.

Spark-first shape: the whole extraction is a fixed chain of
``regexp_replace`` expressions — JVM-side, whole-stage-codegen'd, no
Python in the hot path, trivially parallel over a 100 TB crawl with
zero shuffles. A DOM parser would be more faithful on pathological
markup but forces row-at-a-time Python; the regex chain is the
standard large-scale trade (C4 used essentially this plus langdetect)
and is bit-reproducible in any RE2/Java-regex engine, which is what
makes the DuckDB oracle possible. No backreferences are used (RE2
compatibility); every pattern is linear-time.

Extraction order matters and is part of the contract:

1. drop <script>/<style> blocks WITH their contents (non-greedy,
   dotall) — their text is never prose;
2. drop HTML comments;
3. turn block-level boundaries (<br>, </p>, </div>, </h1..6>, </li>,
   </tr>) into spaces so words from adjacent blocks don't fuse;
4. drop every remaining tag;
5. decode the six entities that dominate real crawls (&nbsp; &lt;
   &gt; &quot; &#39; and LAST &amp; — decoding &amp; earlier would
   double-decode "&amp;lt;");
6. collapse whitespace runs and trim.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (pattern, replacement) chain — the single source of truth; the
# golden oracle (plans/golden.py::_html_main_text_sql) renders the
# same chain as DuckDB regexp_replace calls with the 'g' option.
HTML_STRIP_CHAIN: list[tuple[str, str]] = [
    (r"(?is)<script\b[^>]*>.*?</script\s*>", " "),
    (r"(?is)<style\b[^>]*>.*?</style\s*>", " "),
    (r"(?s)<!--.*?-->", " "),
    (r"(?i)<(?:br|/p|/div|/h[1-6]|/li|/tr)[^>]*>", " "),
    (r"(?s)<[^>]*>", ""),
    (r"&nbsp;", " "),
    (r"&lt;", "<"),
    (r"&gt;", ">"),
    (r"&quot;", "\""),
    (r"&#39;", "'"),
    (r"&amp;", "&"),
    (r"\s+", " "),
]


def strip_html(col: Column) -> Column:
    """The extraction chain as one Column expression (codegen'd)."""
    out = col
    for pat, repl in HTML_STRIP_CHAIN:
        out = F.regexp_replace(out, pat, repl)
    return F.trim(out)


def _char_count(col: Column, pattern: str, width: int = 1) -> Column:
    """Occurrences of ``pattern`` in ``col`` via the length-difference
    trick — bit-exact in any engine (no regexp_count portability
    concerns); ``width`` = characters removed per match."""
    return (
        (F.length(col) - F.length(F.regexp_replace(col, pattern, "")))
        / F.lit(width)
    ).cast("long")


def encoding_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document encoding-hygiene signals — the filter that catches
    decode damage BEFORE the linguistic quality stages (a mojibake doc
    can have fine word lengths and stopword ratios):

    - ``n_chars``: codepoint length;
    - ``replacement_ratio``: U+FFFD (the decoder's "I gave up" char)
      per char — any nonzero value means the upstream byte stream was
      decoded with the wrong codec;
    - ``control_ratio``: C0 controls except tab/newline/CR, plus DEL —
      binary junk masquerading as text;
    - ``nonascii_ratio``: share of non-ASCII codepoints (a language-
      aware consumer compares it against the doc's declared lang);
    - ``mojibake_hits``: occurrences of the two classic UTF-8-read-as-
      Latin-1 artifacts ('Ã' from two-byte sequences, 'â€' from
      punctuation) — counted as plain substrings, no charset
      heuristics.

    Exact integer counts (length-difference trick, JVM regex) with one
    rounded division each — no shuffle, pure projection, same
    cross-engine determinism contract as the rest of the text family.
    """
    t = F.col(text_col)
    n = F.length(t).cast("long")
    denom = F.greatest(n, F.lit(1))
    repl = _char_count(t, "�")
    ctrl = _char_count(t, r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]")
    nonascii = _char_count(t, r"[^\x00-\x7F]")
    moji = _char_count(t, "Ã") + _char_count(t, "â€", width=2)
    return df.select(
        F.col(id_col),
        n.alias("n_chars"),
        F.round(repl / denom, 6).alias("replacement_ratio"),
        F.round(ctrl / denom, 6).alias("control_ratio"),
        F.round(nonascii / denom, 6).alias("nonascii_ratio"),
        moji.alias("mojibake_hits"),
    )


def extract_main_text(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """(id, text, text_len, html_len, text_density) per document.

    ``text_density`` = extracted-text length / raw-HTML length — the
    classic boilerplate signal (low density = navigation/markup-heavy
    pages worth dropping before the quality stages). Integer lengths,
    one rounded division; no shuffle at all — this is a projection.

    ``keep`` appends passthrough input columns (round-14): when the
    upstream frame is an opaque, expensive subplan (a mapInPandas WARC
    parse), re-attaching its metadata with a self-join would execute
    that subplan twice — carrying the columns through the projection
    keeps it one pass.
    """
    text = strip_html(F.col(html_col))
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in keep],
        text.alias("text"),
        F.length(text).cast("long").alias("text_len"),
        F.length(F.col(html_col)).cast("long").alias("html_len"),
        F.round(
            F.length(text) / F.greatest(F.length(F.col(html_col)), F.lit(1)),
            6,
        ).alias("text_density"),
    )
