"""WARC source tests: hand-built WET/WARC fixtures (the format spec is
simple enough to write literally) read back through the distributed
reader — record splitting, header parsing, type filtering, HTTP-head
stripping, and the documents-shape adapter."""

import gzip
import os

from pyspark.sql import functions as F

from knowledge_graph_etl_spark.sources.warc import (
    read_warc,
    strip_http_headers,
    warc_to_documents,
)


def _record(rtype, uri, rid, content, extra=()):
    head = [
        f"WARC-Type: {rtype}",
        f"WARC-Date: 2026-01-01T00:00:00Z",
        f"WARC-Record-ID: <urn:uuid:{rid}>",
        f"Content-Length: {len(content.encode())}",
    ]
    if uri:
        head.insert(1, f"WARC-Target-URI: {uri}")
    head.extend(extra)
    return "WARC/1.0\r\n" + "\r\n".join(head) + "\r\n\r\n" + content + "\r\n\r\n"


def _fixture():
    info = _record("warcinfo", None, "info-1", "software: test\r\n")
    wet1 = _record(
        "conversion", "https://example.org/page1", "wet-1",
        "Extracted text of page one.\nSecond line.",
    )
    wet2 = _record(
        "conversion", "https://other.example.net/a/b", "wet-2",
        "Another page's text.",
    )
    resp = _record(
        "response", "https://example.org/raw", "resp-1",
        "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<html>body text</html>",
    )
    return info + wet1 + wet2 + resp


def test_read_warc_records_and_filter(spark, tmp_path):
    p = str(tmp_path / "crawl.warc")
    with open(p, "w", newline="") as f:
        f.write(_fixture())
    # default filter: conversion + response
    recs = {r["record_id"]: r for r in read_warc(spark, p).collect()}
    assert set(recs) == {"urn:uuid:wet-1", "urn:uuid:wet-2", "urn:uuid:resp-1"}
    w1 = recs["urn:uuid:wet-1"]
    assert w1["record_type"] == "conversion"
    assert w1["target_uri"] == "https://example.org/page1"
    assert w1["warc_date"] == "2026-01-01T00:00:00Z"
    assert w1["content"] == "Extracted text of page one.\nSecond line."
    assert w1["content_length"] == len(w1["content"].encode())
    # record_types=None keeps warcinfo too
    all_recs = read_warc(spark, p, record_types=None)
    assert all_recs.count() == 4
    assert all_recs.where(F.col("record_type") == "warcinfo").count() == 1


def test_payload_mentioning_warc_version_does_not_split(spark, tmp_path):
    # a page ABOUT the WARC format: contains the literal version line
    # bytes mid-payload — under boundary framing this must stay one record
    body = "Each record starts with WARC/1.0\r\nand then headers follow."
    rec = _record("conversion", "https://example.org/doc", "warc-doc", body)
    p = str(tmp_path / "m.warc")
    with open(p, "w", newline="") as f:
        f.write(rec)
    rows = read_warc(spark, p).collect()
    assert len(rows) == 1
    assert rows[0]["content"] == body


def test_embedded_record_collision_drops_typeless_fragment(spark, tmp_path):
    # a payload embedding a verbatim CRLF-framed record boundary DOES
    # split (line-separator framing can't avoid it — documented); the
    # leading fragment keeps its headers, the mid-payload tail has no
    # WARC-Type and must be dropped, and the embedded record parses
    inner = _record("response", "https://inner.example/x", "inner-1", "IN")
    body = "quoting a record:\r\n\r\n" + inner + "tail text after"
    rec = _record("metadata", "https://example.org/q", "quoter", body)
    ok = _record("conversion", "https://example.org/ok", "ok-1", "fine")
    p = str(tmp_path / "e.warc")
    with open(p, "w", newline="") as f:
        f.write(rec + ok)
    rows = read_warc(spark, p, record_types=None).collect()
    ids = {r["record_id"] for r in rows}
    assert "urn:uuid:quoter" in ids and "urn:uuid:ok-1" in ids
    assert "urn:uuid:inner-1" in ids  # embedded frame parses as a record
    # no typeless payload-tail fragments survive
    assert all(r["record_type"] != "" for r in rows)


def test_warc_1_1_records_parse(spark, tmp_path):
    rec = _record("conversion", "https://example.org/v11", "v11-1", "text")
    rec = rec.replace("WARC/1.0\r\n", "WARC/1.1\r\n")
    p = str(tmp_path / "v11.warc")
    with open(p, "w", newline="") as f:
        f.write(rec + _fixture())
    rows = {r["record_id"] for r in read_warc(spark, p).collect()}
    assert "urn:uuid:v11-1" in rows and len(rows) == 4


def test_read_warc_gzip_member(spark, tmp_path):
    p = str(tmp_path / "crawl.warc.gz")
    with gzip.open(p, "wt", newline="") as f:
        f.write(_fixture())
    assert read_warc(spark, p).count() == 3


def test_strip_http_headers_and_documents_shape(spark, tmp_path):
    p = str(tmp_path / "c.warc")
    with open(p, "w", newline="") as f:
        f.write(_fixture())
    docs = {r["doc_id"]: r for r in warc_to_documents(spark, p).collect()}
    assert docs["urn:uuid:resp-1"]["text"] == "<html>body text</html>"
    assert docs["urn:uuid:resp-1"]["source"] == "example.org"
    assert docs["urn:uuid:wet-2"]["source"] == "other.example.net"
    assert docs["urn:uuid:wet-1"]["n_chars"] == len(
        "Extracted text of page one.\nSecond line."
    )
    # the output feeds the curation family directly
    from knowledge_graph_etl_spark.extensions.curation import gopher_quality_flags

    out = gopher_quality_flags(warc_to_documents(spark, p))
    assert out.count() == 3
