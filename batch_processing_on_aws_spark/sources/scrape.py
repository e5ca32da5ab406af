"""S6 — link discovery: HTML index page → links manifest.

The reference walks the TfL cycling-data index with Selenium +
BeautifulSoup (init_3_web_scraping_dag.py:26-98): find the first
<table>, skip rows until the ``usage-stats/`` folder marker, then for
every file row keep ``{last-date-in-filename: href}`` for filenames
whose trailing year is in scope, and dump the dict to
links_dictionary.json for the ingestion DAG.

This module is the engine-side equivalent, split in two:

- :func:`parse_table_links` — generic, dependency-free (stdlib
  ``html.parser``) extraction of (cells, href) per row of the FIRST
  table on the page. Browser automation stays out of scope: the
  reference only needs Selenium because the TfL index is rendered
  client-side; given the HTML, parsing is pure.

  PERMANENT SCOPE CUT — failure mode, stated plainly: this parser
  sees only server-rendered HTML. An index page whose table is
  populated by client-side JavaScript (the reference drives a real
  Chrome for exactly this reason, init_3_web_scraping_dag.py:37-43)
  yields ZERO rows here, loudly (empty manifest), never silently
  wrong data. Users scraping JS-rendered pages must pre-render
  upstream (headless browser, crawl service) and hand this module
  the resulting HTML; pulling a browser into the engine container
  is deliberately out of scope for a data-plane library.
- :func:`tfl_usage_links` — the reference's selection policy
  (folder marker → capture; filename ``…17Mar2021-23Mar2021.csv`` →
  key ``23Mar2021``; keep years in scope), reproduced faithfully.
  One documented deviation: the reference declares ``filetype='csv'``
  but never applies it (init_3_web_scraping_dag.py:59); here the
  extension filter is real (pass ``filetype=None`` for bug-compatible
  behavior).

Output feeds :func:`..sources.lake.manifest_from_links` →
``pending_entries`` → ``land_file``, closing the last reference stage
that was previously consumed but not produced.

Control-plane utility, deliberately driver-side: one page, a few
hundred rows — the engine-side work starts at the scan of the landed
files.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Mapping, Sequence
from urllib.parse import urljoin


class _FirstTableLinks(HTMLParser):
    """Rows of the first <table>: cell texts + first anchor href."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._table_depth = 0
        self._done = False
        self._in_row = False
        self._in_cell = False
        self._text: list[str] = []
        self._cells: list[str] = []
        self._href: str | None = None
        self.rows: list[tuple[list[str], str | None]] = []

    def handle_starttag(self, tag, attrs):
        if self._done:
            return
        if tag == "table":
            self._table_depth += 1
        elif self._table_depth:
            if tag == "tr":
                self._in_row, self._cells, self._href = True, [], None
            elif tag in ("td", "th") and self._in_row:
                self._in_cell, self._text = True, []
            elif tag == "a" and self._in_cell and self._href is None:
                self._href = dict(attrs).get("href")

    def handle_endtag(self, tag):
        if self._done:
            return
        if tag == "table" and self._table_depth:
            self._table_depth -= 1
            if self._table_depth == 0:
                self._done = True
        elif tag in ("td", "th") and self._in_cell:
            self._in_cell = False
            self._cells.append("".join(self._text).strip())
        elif tag == "tr" and self._in_row:
            self._in_row = False
            if self._cells:
                self.rows.append((self._cells, self._href))

    def handle_data(self, data):
        if self._in_cell:
            self._text.append(data)


def parse_table_links(html: str) -> list[tuple[list[str], str | None]]:
    """``[(cell_texts, first_href_or_None), …]`` for each row of the
    first table on the page (header rows included; nested tables fold
    into the outer one, matching BeautifulSoup's ``find('table')``
    scope in the reference)."""
    p = _FirstTableLinks()
    p.feed(html)
    p.close()
    return p.rows


def tfl_usage_links(
    rows: Sequence[tuple[list[str], str | None]],
    *,
    folder_name: str = "usage-stats/",
    years: Sequence[int] = (2021, 2022),
    filetype: str | None = "csv",
    base_url: str | None = None,
) -> dict[str, str]:
    """The reference's links_extractor policy
    (init_3_web_scraping_dag.py:49-88) over parsed rows: ignore rows
    until the first cell equals ``folder_name``; afterwards treat each
    row's first cell as a filename, keep it when the 4 chars before the
    extension are a year in ``years`` (and, unlike the reference's
    dead variable, when the extension matches ``filetype``); key it by
    the segment after the last ``-`` (the extract's end date).

    Later duplicates win, like repeated dict assignment in the
    reference. Relative hrefs resolve against ``base_url``."""
    capture = False
    out: dict[str, str] = {}
    year_set = {str(y) for y in years}
    for cells, href in rows:
        if not cells:
            continue
        if not capture:
            if cells[0] == folder_name:
                capture = True
            continue
        filename = cells[0]
        parts = filename.split(".")
        if len(parts) < 2:
            continue
        if filetype is not None and parts[-1].lower() != filetype.lower():
            continue
        stem = parts[-2]
        year = stem[-4:]
        if not year.isdigit() or year not in year_set:
            continue
        if href is None:
            continue
        key = stem.split("-")[-1]
        out[key] = urljoin(base_url, href) if base_url else href
    return out


def discover_links(
    html: str, **policy
) -> Mapping[str, str]:
    """One-call pipeline: HTML page → ``{logical_key: url}`` ready for
    :func:`..sources.lake.manifest_from_links`."""
    return tfl_usage_links(parse_table_links(html), **policy)
