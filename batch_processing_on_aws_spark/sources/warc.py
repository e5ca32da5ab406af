"""WARC crawl-container source (round-9 verdict task 6).

The reference pipeline lands web data one HTTP fetch at a time
(reference: airflow/dags/scripts — the journey CSV fetch — and this
repo's ``sources/scrape.py`` link-discovery stage). Real crawl
corpora arrive instead as WARC containers (ISO 28500: Common Crawl,
Internet Archive), each file holding thousands of framed records —
this module is the entry stage the webtext family
(``operators/webtext.py::extract_main_text``) assumes: container
bytes → (url, fetch_ts, http_status, html) rows.

Parsing is pure stdlib (the container format is length-framed text
headers + payload bytes; per-record-gzip ``.warc.gz`` members
decompress with ``zlib`` wbits=31 in a multi-member loop).

Scale shape: one container = one ``binaryFile`` row = one parse task,
so parallelism is the file count — exactly how crawl corpora are laid
out (Common Crawl ships ~1 GB WARCs in the tens of thousands per
snapshot). The parse is a streaming ``mapInPandas`` projection: no
shuffle, no driver involvement; record rows flow straight into the
webtext/dedup/quality stages. Arrow batch sizing follows the
multimodal module's convention (MB-scale payload rows).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

WARC_RECORD_SCHEMA = (
    "warc_file string, record_type string, url string, "
    "fetch_ts timestamp, http_status int, content_type string, "
    "html string, n_payload_bytes long"
)


def _gunzip_members(data: bytes) -> bytes:
    """Decompress a concatenation of gzip members (the .warc.gz
    layout: one member per record) into one byte stream."""
    import zlib

    out = bytearray()
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=31)
        out += d.decompress(data[pos:])
        out += d.flush()
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:
            raise ValueError("corrupt gzip member in WARC")
        pos += consumed
    return bytes(out)


def _parse_http_payload(payload: bytes):
    """HTTP response payload → (status, content_type, body). Returns
    (None, None, payload) when the payload is not an HTTP message."""
    if not payload.startswith(b"HTTP/"):
        return None, None, payload
    head, sep, body = payload.partition(b"\r\n\r\n")
    if not sep:
        return None, None, payload
    lines = head.split(b"\r\n")
    parts = lines[0].split(b" ", 2)
    try:
        status = int(parts[1])
    except (IndexError, ValueError):
        return None, None, payload
    ctype = None
    for ln in lines[1:]:
        k, _, v = ln.partition(b":")
        if k.strip().lower() == b"content-type":
            ctype = v.strip().decode("latin-1")
            break
    return status, ctype, body


def parse_warc_records(data: bytes) -> Iterator[dict]:
    """Parse one WARC container (plain ``.warc`` or per-record-gzip
    ``.warc.gz``) into record dicts: ``record_type``, ``url``,
    ``date`` (the raw WARC-Date string), ``content_type`` (the HTTP
    one for response records, else the WARC one), ``http_status``,
    ``payload`` (body bytes — HTTP headers already split off for
    response records). Raises ``ValueError`` on framing corruption
    (bad version line, missing/invalid Content-Length) — a truncated
    crawl file should fail loudly, not yield half its records."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    pos = 0
    while pos < len(data):
        # skip inter-record CRLF padding
        while data[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= len(data):
            return
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end < 0:
            raise ValueError("truncated WARC record header")
        header = data[pos:head_end].decode("utf-8", errors="replace")
        lines = header.split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError(f"bad WARC version line {lines[0]!r}")
        fields: dict[str, str] = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(":")
            fields[k.strip().lower()] = v.strip()
        try:
            length = int(fields["content-length"])
        except (KeyError, ValueError) as e:
            raise ValueError("WARC record missing Content-Length") from e
        body = data[head_end + 4 : head_end + 4 + length]
        if len(body) != length:
            raise ValueError("truncated WARC record payload")
        pos = head_end + 4 + length
        rtype = fields.get("warc-type", "")
        wctype = fields.get("content-type")
        status, http_ctype, payload = (None, None, body)
        if rtype == "response" and (wctype or "").startswith(
            "application/http"
        ):
            status, http_ctype, payload = _parse_http_payload(body)
        yield {
            "record_type": rtype,
            "url": fields.get("warc-target-uri"),
            "date": fields.get("warc-date"),
            "content_type": http_ctype or wctype,
            "http_status": status,
            "payload": payload,
        }


def _records_pdf(file_name, data: bytes):
    """One container → the pandas frame of its WARC_RECORD_SCHEMA
    rows (html decoded as UTF-8-replace for text/html responses)."""
    import pandas as pd

    rows = []
    for r in parse_warc_records(data):
        is_html = (r["content_type"] or "").split(";")[0].strip() in (
            "text/html",
            "application/xhtml+xml",
        )
        rows.append(
            {
                "warc_file": file_name,
                "record_type": r["record_type"],
                "url": r["url"],
                "fetch_ts": pd.to_datetime(
                    r["date"], utc=True, errors="coerce"
                ),
                "http_status": r["http_status"],
                "content_type": r["content_type"],
                "html": (
                    r["payload"].decode("utf-8", errors="replace")
                    if is_html
                    else None
                ),
                "n_payload_bytes": len(r["payload"]),
            }
        )
    pdf = pd.DataFrame(
        rows,
        columns=[
            "warc_file", "record_type", "url", "fetch_ts",
            "http_status", "content_type", "html", "n_payload_bytes",
        ],
    )
    if len(pdf):
        pdf["fetch_ts"] = pd.to_datetime(pdf["fetch_ts"]).dt.tz_localize(
            None
        )
        pdf["http_status"] = pdf["http_status"].astype("Int32")
        pdf["n_payload_bytes"] = pdf["n_payload_bytes"].astype("int64")
    return pdf


def warc_records(
    df: DataFrame, file_col: str = "path", data_col: str = "content"
) -> DataFrame:
    """Container-bytes DataFrame → record rows (WARC_RECORD_SCHEMA).
    The in-engine core of :func:`read_warc`, reusable when containers
    are synthesized or arrive through another source (e.g. a lake
    landing table of fetched bodies)."""

    def parse(batches):
        for pdf in batches:
            for fname, data in zip(pdf[file_col], pdf[data_col]):
                out = _records_pdf(fname, bytes(data))
                if len(out):
                    yield out

    return df.mapInPandas(parse, schema=WARC_RECORD_SCHEMA)


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Read WARC container files (glob patterns welcome — the same
    multi-file semantics as every other reader here) into record
    rows. ``.warc.gz`` per-record-gzip members are handled
    transparently by the parser."""
    from .readers import read_binary_files

    return warc_records(read_binary_files(spark, path))
