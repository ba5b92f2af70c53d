"""WARC source + HTML text extraction tests (sources/warc.py,
functions/htmltext.py): record codec round-trips (plain and
gzip-member-per-record), HTTP payload splitting, malformed-input
errors, the Spark one-task-per-file scan, executor-side archive
staging, and extraction semantics."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from introduction_in_big_data_spark.functions.htmltext import (
    html_title,
    html_to_text,
)
from introduction_in_big_data_spark.sources import warc


def _resp(url, body):
    return {"url": url, "payload": warc.http_response_payload(body)}


@pytest.mark.parametrize("compress", [True, False])
def test_record_roundtrip(tmp_path, compress):
    p = str(tmp_path / ("a.warc.gz" if compress else "a.warc"))
    warc.write_warc(
        p,
        [
            _resp("http://x/1", b"hello"),
            {"type": "warcinfo", "content_type": "application/warc-fields",
             "payload": b"software: test\r\n"},
            _resp("http://x/2", b"<b>bye</b>"),
        ],
        compress=compress,
    )
    with open(p, "rb") as fh:
        recs = list(warc.parse_warc_stream(fh.read()))
    assert [r["type"] for r in recs] == ["response", "warcinfo", "response"]
    ctype, body = warc.split_http_response(recs[0]["payload"])
    assert body == b"hello" and ctype == "text/html"
    assert recs[1]["payload"] == b"software: test\r\n"


def test_malformed_warc_raises():
    with pytest.raises(warc.WarcError, match="version"):
        list(warc.parse_warc_stream(b"HTTP/1.1 200 OK\r\n\r\n"))
    # truncated payload
    rec = (
        b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 100\r\n\r\nshort"
    )
    with pytest.raises(warc.WarcError, match="payload"):
        list(warc.parse_warc_stream(rec))
    with pytest.raises(warc.WarcError, match="Content-Length"):
        list(warc.parse_warc_stream(b"WARC/1.0\r\nWARC-Type: x\r\n\r\n"))


def test_html_to_text_semantics():
    html = (
        "<html><head><title>A  Title</title><style>p{color:red}</style>"
        "</head><body><p>Hello&amp;\n  world</p>"
        "<script>var x = 'DROPPED';</script>"
        "<div>tail</div></body></html>"
    )
    assert html_to_text(html) == "Hello& world tail"
    assert html_title(html) == "A Title"
    assert html_to_text("") == ""
    assert html_to_text("<p>unclosed <b>bold") == "unclosed bold"


def test_spark_read_warc_and_executor_staging(spark, tmp_path):
    """Executor-side write_warc_dir → read_warc round trip: one task
    per file, response payloads split, bodies byte-exact."""
    d = str(tmp_path / "archives")
    df = spark.createDataFrame(
        [(f"http://corpus/{i}", f"body {i}".encode()) for i in range(20)],
        "url string, body binary",
    ).repartition(3)
    warc.write_warc_dir(df, d)
    assert len([f for f in os.listdir(d) if f.endswith(".warc.gz")]) == 3

    out = warc.read_warc(spark, d)
    rows = {r.url: bytes(r.body) for r in out.collect()}
    assert rows == {f"http://corpus/{i}": f"body {i}".encode() for i in range(20)}
    assert out.rdd.getNumPartitions() == 3
    assert {r.http_content_type for r in out.collect()} == {"text/html"}


def test_extract_html_text_operator(spark):
    from introduction_in_big_data_spark.operators.text import extract_html_text

    df = spark.createDataFrame(
        [(1, "<p>a  b</p><script>x</script>"), (2, None)],
        "id long, html string",
    )
    out = {r.id: r.text for r in extract_html_text(df, "html").collect()}
    assert out == {1: "a b", 2: None}
