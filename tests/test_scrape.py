"""S6 link discovery: fixture index page → links manifest →
pending_entries — the full reference web-scraping stage
(init_3_web_scraping_dag.py) exercised end-to-end in-engine."""

import os

from batch_processing_on_aws_spark.sources.lake import (
    manifest_from_links,
    pending_entries,
)
from batch_processing_on_aws_spark.sources.scrape import (
    discover_links,
    parse_table_links,
    tfl_usage_links,
)

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "tfl_index.html")


def _html():
    with open(FIXTURE, encoding="utf-8") as f:
        return f.read()


def test_parse_first_table_only():
    rows = parse_table_links(_html())
    texts = [c[0] for c, _ in rows]
    assert "SecondTable17Mar2021-23Mar2021.csv" not in texts  # 2nd table
    assert "usage-stats/" in texts
    assert ["Name", "Size", "Modified"] == rows[0][0]  # header kept raw


def test_tfl_policy_matches_reference_semantics():
    links = discover_links(_html(), base_url="https://host.example")
    # pre-marker rows skipped (Stations.csv has a fine year-less name),
    # out-of-scope year (2018) skipped, non-csv (txt, .bak) skipped,
    # relative href resolved, key = segment after last '-'.
    assert links == {
        "02Feb2021": "https://host.example/usage-stats/250JourneyDataExtract27Jan2021-02Feb2021.csv",
        "23Mar2021": "https://host.example/usage-stats/257JourneyDataExtract17Mar2021-23Mar2021.csv",
        "11Jan2022": "https://host.example/usage-stats/301JourneyDataExtract05Jan2022-11Jan2022.csv",
    }


def test_bug_compatible_extension_filter():
    # filetype=None reproduces the reference's dead extension filter
    # (init_3_web_scraping_dag.py:59 declares filetype='csv', never
    # applies it): 'notes-march2021.txt' stems to 'notes-march2021',
    # trailing '2021' passes the year check, so the txt sneaks in —
    # exactly what the real filter prevents. '….csv.bak' is dropped in
    # both modes (split('.')[-2] == 'csv', not a year).
    loose = tfl_usage_links(parse_table_links(_html()), filetype=None)
    strict = tfl_usage_links(parse_table_links(_html()))
    assert "march2021" in loose and "march2021" not in strict
    assert not any(u.endswith(".bak") for u in loose.values())
    assert not any("2018" in k for k in loose)  # year scope still applies


def test_year_scope():
    links = discover_links(_html(), years=(2022,))
    assert set(links) == {"11Jan2022"}


def test_manifest_roundtrip_pending(spark):
    links = discover_links(_html(), base_url="https://host.example")
    manifest = manifest_from_links(spark, links)
    processed = manifest_from_links(
        spark, {"02Feb2021": "https://host.example/already-done.csv"}
    )
    pending = pending_entries(manifest, processed)
    got = {r["logical_key"] for r in pending.collect()}
    assert got == {"23Mar2021", "11Jan2022"}
