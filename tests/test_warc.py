"""WARC container source (sources/warc.py): framing, gzip members,
HTTP splitting, glob/multi-file scan."""

import gzip

import pytest

from batch_processing_on_aws_spark.sources.warc import (
    parse_warc_records,
    read_warc,
)


def _record(url, body, rtype="response", date="2024-03-01T12:00:00Z",
            http=True, extra_headers=""):
    if http:
        payload = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            + f"Content-Length: {len(body)}\r\n\r\n".encode()
            + body
        )
        ctype = "application/http; msgtype=response"
    else:
        payload = body
        ctype = "text/plain"
    return (
        f"WARC/1.0\r\n"
        f"WARC-Type: {rtype}\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {date}\r\n"
        f"Content-Type: {ctype}\r\n{extra_headers}"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode() + payload + b"\r\n\r\n"


def test_parse_plain_container_mixed_records():
    data = (
        _record("http://a.test/1", b"<html><body>one</body></html>")
        + _record("http://a.test/2", b"just bytes", rtype="metadata",
                  http=False)
        + _record("http://a.test/3", b"<html><body>three</body></html>")
    )
    recs = list(parse_warc_records(data))
    assert [r["record_type"] for r in recs] == [
        "response", "metadata", "response",
    ]
    assert recs[0]["http_status"] == 200
    assert recs[0]["content_type"] == "text/html"
    assert recs[0]["payload"] == b"<html><body>one</body></html>"
    assert recs[1]["http_status"] is None
    assert recs[1]["payload"] == b"just bytes"
    assert recs[2]["url"] == "http://a.test/3"


def test_parse_gzip_members_and_binary_payload():
    plain = _record("http://a.test/img", b"\xff\xd8notreallyjpeg",
                    http=False)
    # two independent gzip members, the .warc.gz layout
    data = gzip.compress(plain, mtime=0) + gzip.compress(
        _record("http://a.test/x", b"<html>x</html>"), mtime=0
    )
    recs = list(parse_warc_records(data))
    assert len(recs) == 2
    assert recs[0]["payload"] == b"\xff\xd8notreallyjpeg"
    assert recs[1]["http_status"] == 200


def test_parse_rejects_corruption_loudly():
    good = _record("http://a.test/1", b"<html>ok</html>")
    with pytest.raises(ValueError, match="version"):
        list(parse_warc_records(b"NOTW/1.0\r\nX: y\r\n\r\n"))
    with pytest.raises(ValueError, match="Content-Length"):
        list(parse_warc_records(
            b"WARC/1.0\r\nWARC-Type: response\r\n\r\nbody"
        ))
    with pytest.raises(ValueError, match="truncated WARC record payload"):
        list(parse_warc_records(good[: len(good) - 20]))


def test_read_warc_glob_multi_file(spark, tmp_path):
    d = tmp_path / "crawl"
    d.mkdir()
    (d / "a.warc").write_bytes(
        _record("http://a.test/1", b"<html><body>alpha</body></html>")
        + _record("http://a.test/2", b"<html><body>beta</body></html>",
                  date="2024-03-02T00:00:00Z")
    )
    (d / "b.warc.gz").write_bytes(
        gzip.compress(
            _record("http://b.test/9", b"<html><body>gamma</body></html>"),
            mtime=0,
        )
    )
    (d / "ignore.txt").write_bytes(b"not a warc")
    df = read_warc(spark, f"file://{d}/*.warc*")
    rows = {r["url"]: r for r in df.collect()}
    assert set(rows) == {
        "http://a.test/1", "http://a.test/2", "http://b.test/9",
    }
    assert rows["http://b.test/9"]["html"] == (
        "<html><body>gamma</body></html>"
    )
    assert rows["http://a.test/2"]["fetch_ts"].day == 2
    assert all(r["http_status"] == 200 for r in rows.values())
    assert rows["http://a.test/1"]["warc_file"].endswith("a.warc")
    # non-HTML payloads surface as NULL html but keep their bytes count
    assert rows["http://a.test/1"]["n_payload_bytes"] == len(
        b"<html><body>alpha</body></html>"
    )
