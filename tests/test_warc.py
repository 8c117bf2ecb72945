"""WARC codec + Spark ingest surface."""

import pytest
from pyspark.sql import functions as F

from iceberg_python_spark.operators.warc import (
    decode_warc,
    encode_warc,
    warc_records,
)

RECS = [
    {"warc_type": "warcinfo", "record_id": "urn:uuid:0",
     "block": b"software: engine\r\n", "content_type": "application/warc-fields"},
    {"warc_type": "request", "record_id": "urn:uuid:1",
     "target_uri": "https://example.org/a",
     "block": b"GET /a HTTP/1.1\r\nHost: example.org\r\n\r\n",
     "content_type": "application/http;msgtype=request"},
    {"warc_type": "response", "record_id": "urn:uuid:2",
     "target_uri": "https://example.org/a", "http_status": 200,
     "body": "<html><body><p>héllo\nworld</p></body></html>".encode()},
    {"warc_type": "response", "record_id": "urn:uuid:3",
     "target_uri": "https://example.org/b", "http_status": 404,
     "body": b"not found"},
]


@pytest.mark.parametrize("gz", [False, True])
def test_warc_roundtrip(gz):
    out = decode_warc(encode_warc(RECS, gzip_per_record=gz))
    assert [r["warc_type"] for r in out] == ["warcinfo", "request", "response", "response"]
    assert out[0]["http_status"] is None and out[0]["body"] == b"software: engine\r\n"
    # request blocks are application/http but have no digit status
    assert out[1]["http_status"] is None
    assert out[2]["http_status"] == 200
    assert out[2]["body"].decode() == "<html><body><p>héllo\nworld</p></body></html>"
    assert out[2]["http_content_type"] == "text/html; charset=utf-8"
    assert out[3]["http_status"] == 404 and out[3]["record_id"] == "urn:uuid:3"


def test_warc_truncation_and_garbage_gate():
    data = encode_warc(RECS)
    with pytest.raises(ValueError):
        decode_warc(data[: len(data) - 30])  # short block
    with pytest.raises(ValueError):
        decode_warc(b"HTTP/1.1 200 OK\r\n\r\n")  # not WARC
    with pytest.raises(ValueError):
        decode_warc(encode_warc(RECS, gzip_per_record=True)[:40])


def test_warc_records_spark_surface(spark):
    """One row per record, per-payload error isolation: a corrupt
    archive in the corpus yields its error row while every other
    payload parses fully."""
    good = encode_warc(RECS, gzip_per_record=True)
    rows = [(0, bytearray(good)), (1, bytearray(b"garbage")), (2, bytearray(good))]
    df = spark.createDataFrame(rows, "id: long, payload: binary")
    out = warc_records(df, "id", "payload").collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["src_id"], []).append(r)
    assert len(by_src[0]) == 4 and all(r["parse_ok"] for r in by_src[0])
    assert len(by_src[1]) == 1 and not by_src[1][0]["parse_ok"]
    assert "ValueError" in by_src[1][0]["error"]
    resp = [r for r in by_src[2] if r["warc_type"] == "response"]
    assert {r["http_status"] for r in resp} == {200, 404}
    assert bytes(resp[0]["body"]).decode().startswith("<html>")


from hypothesis import given, settings
from hypothesis import strategies as st


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["response", "request", "warcinfo", "metadata"]),
            st.binary(min_size=0, max_size=200),
            st.integers(200, 599),
        ),
        min_size=1,
        max_size=6,
    ),
    st.booleans(),
)
@settings(max_examples=40, deadline=None)
def test_warc_roundtrip_property(specs, gz):
    """Any record mix (including bodies containing CRLF, gzip magic,
    and 'WARC/' lookalikes) frames and parses back exactly — record
    splitting is length arithmetic, so adversarial bodies can't
    desynchronize it."""
    recs = []
    for i, (wtype, body, status) in enumerate(specs):
        if wtype == "response":
            recs.append({"warc_type": wtype, "record_id": f"urn:uuid:{i}",
                         "target_uri": f"https://x.example/{i}",
                         "http_status": status, "body": body})
        else:
            recs.append({"warc_type": wtype, "record_id": f"urn:uuid:{i}",
                         "block": b"WARC/1.1\r\n" + body,  # lookalike block
                         "content_type": "application/octet-stream"})
    out = decode_warc(encode_warc(recs, gzip_per_record=gz))
    assert len(out) == len(recs)
    for i, ((wtype, body, status), rec) in enumerate(zip(specs, out)):
        assert rec["warc_type"] == wtype and rec["record_id"] == f"urn:uuid:{i}"
        if wtype == "response":
            assert rec["http_status"] == status and rec["body"] == body
        else:
            assert rec["body"] == b"WARC/1.1\r\n" + body


def test_warc_streaming_iter_matches_batch():
    """The streaming parser (the file-scale path) yields exactly what
    decode_warc yields, for both layouts and pathological read sizes,
    including bodies larger than the 1 MB buffer-trim threshold."""
    import io

    recs = [
        {"warc_type": "response", "record_id": f"urn:uuid:{i}",
         "target_uri": f"https://x/{i}", "http_status": 200 + i,
         "body": bytes([i % 256]) * (i * 997 % 5000)}
        for i in range(25)
    ] + [{"warc_type": "response", "record_id": "urn:uuid:big",
          "http_status": 200, "body": b"B" * (3 << 20)}]

    class TinyReads(io.RawIOBase):
        def __init__(self, data, sz):
            self.b, self.sz = io.BytesIO(data), sz

        def read(self, n=-1):
            return self.b.read(min(n if n and n > 0 else self.sz, self.sz))

    from iceberg_python_spark.operators.warc import iter_warc_records

    for gz in (False, True):
        data = encode_warc(recs, gzip_per_record=gz)
        want = decode_warc(data)
        for sz in (7, 4096, 1 << 22):
            got = list(iter_warc_records(TinyReads(data, sz)))
            assert got == want, (gz, sz)


def test_warc_records_from_paths(spark, tmp_path):
    """File-scale surface: one task per archive path, records streamed
    executor-side; a corrupt file yields its error row while other
    files parse fully."""
    from iceberg_python_spark.operators.warc import warc_records_from_paths

    f1 = tmp_path / "a.warc.gz"
    f1.write_bytes(encode_warc(RECS, gzip_per_record=True))
    f2 = tmp_path / "b.warc"
    f2.write_bytes(encode_warc(RECS))
    f3 = tmp_path / "c.warc"
    f3.write_bytes(b"this is not a warc file")
    paths = spark.createDataFrame(
        [(str(f1),), (str(f2),), (str(f3),)], "path: string"
    ).repartition(3)
    out = warc_records_from_paths(paths).collect()
    by_path = {}
    for r in out:
        by_path.setdefault(r["path"].rsplit("/", 1)[-1], []).append(r)
    for name in ("a.warc.gz", "b.warc"):
        rows = by_path[name]
        assert len(rows) == 4 and all(r["parse_ok"] for r in rows)
        resp = sorted(r["http_status"] for r in rows if r["warc_type"] == "response")
        assert resp == [200, 404]
    (bad,) = by_path["c.warc"]
    assert not bad["parse_ok"] and "ValueError" in bad["error"]


def test_warc_to_documents_end_to_end(spark, tmp_path):
    """Archive bytes -> documents-shaped rows in one call: only 200
    text responses survive, bodies are HTML-stripped, source is the
    URI host, doc_id is stable across re-reads."""
    from iceberg_python_spark.operators.warc import (
        warc_records_from_paths,
        warc_to_documents,
    )

    recs = [
        {"warc_type": "warcinfo", "record_id": "urn:uuid:info",
         "block": b"x", "content_type": "application/warc-fields"},
        {"warc_type": "response", "record_id": "urn:uuid:p1",
         "target_uri": "https://news.example.org/a", "http_status": 200,
         "body": b"<html><body><p>Breaking:&amp; the dog barks</p></body></html>"},
        {"warc_type": "response", "record_id": "urn:uuid:p2",
         "target_uri": "https://blog.example.net/b", "http_status": 404,
         "body": b"<p>not found</p>"},
        {"warc_type": "response", "record_id": "urn:uuid:p3",
         "target_uri": "https://blog.example.net/c", "http_status": 200,
         "body": b"<p>the cat naps</p>"},
    ]
    f = tmp_path / "crawl.warc.gz"
    f.write_bytes(encode_warc(recs, gzip_per_record=True))
    paths = spark.createDataFrame([(str(f),)], "path: string")
    docs1 = warc_to_documents(warc_records_from_paths(paths)).orderBy("source")
    rows = docs1.collect()
    assert [r["source"] for r in rows] == ["blog.example.net", "news.example.org"]
    texts = {r["source"]: r["text"] for r in rows}
    assert texts["news.example.org"] == "Breaking:& the dog barks"
    assert texts["blog.example.net"] == "the cat naps"
    assert all(r["n_chars"] == len(r["text"]) and r["lang"] is not None for r in rows)
    # doc_id stability across re-reads of the same crawl
    docs2 = warc_to_documents(warc_records_from_paths(paths))
    assert sorted(r["doc_id"] for r in rows) == sorted(
        r["doc_id"] for r in docs2.collect()
    )


def test_warc_to_documents_duplicate_record_ids(spark):
    """ADVICE r12: re-crawled archives repeat record ids; the doc_id
    equi-joins inside warc_to_documents must not fan duplicates out
    multiplicatively (n dups -> n^3 rows)."""
    from iceberg_python_spark.operators.warc import warc_to_documents

    rec = {"warc_type": "response", "record_id": "urn:uuid:dup",
           "target_uri": "https://example.org/a", "http_status": 200,
           "body": b"<p>the dog barks at the cat</p>"}
    payload = encode_warc([rec, rec, rec])  # 3 identical record ids
    df = spark.createDataFrame([(0, bytearray(payload))], "id: long, payload: binary")
    docs = warc_to_documents(warc_records(df, "id", "payload")).collect()
    assert len(docs) == 1  # not 27
    assert docs[0]["text"] == "the dog barks at the cat"


def test_warc_stream_short_reads():
    """ADVICE r12: a file-like that legally returns 1-byte short reads
    must still route a gzip stream down the gzip path."""
    import io

    from iceberg_python_spark.operators.warc import iter_warc_records

    class Dribble:
        def __init__(self, data):
            self._b = io.BytesIO(data)

        def read(self, n=-1):
            return self._b.read(min(n, 1) if n and n > 0 else n)

    gz = encode_warc(RECS, gzip_per_record=True)
    got = list(iter_warc_records(Dribble(gz)))
    want = decode_warc(gz)
    assert [r["record_id"] for r in got] == [r["record_id"] for r in want]
    assert got[2]["body"] == want[2]["body"]
    # plain (non-gzip) short-read stream still parses too
    plain = encode_warc(RECS, gzip_per_record=False)
    got2 = list(iter_warc_records(Dribble(plain)))
    assert [r["record_id"] for r in got2] == [r["record_id"] for r in want]
