"""WARC (Web ARChive, ISO 28500 / WARC/1.1) ingestion — the container
crawl corpora actually arrive in (Common Crawl ships WARC; WET/WAT are
derived views of it). The engine's text-curation pillar starts from a
``documents`` table; this is the step that PRODUCES that table from
archive bytes.

Format (all public spec): a WARC file is a concatenation of records —
``WARC/1.1`` version line, CRLF-separated named headers, blank line,
exactly ``Content-Length`` bytes of block, then a CRLF CRLF trailer.
Each record MAY be its own gzip member; members are concatenated
back-to-back (the spec's recommended layout, so records are
independently seekable). ``response``/``request`` records carry a full
HTTP message as their block; the page body follows the HTTP headers.

Spark shape (100 TB): WARC payloads (or whole files via
``spark.read.format("binaryFile")``) flow through Arrow-batched
``mapInPandas`` — one output row per WARC record, per-PAYLOAD error
capture (a truncated archive yields its parse error, not a failed
job). Record splitting is Content-Length arithmetic, not scanning, so
cost is O(records + header bytes); bodies are sliced, never copied
through regex. The writer exists for oracle rows and tests
(deterministic record ids are the caller's job — no RNG here).
"""

from __future__ import annotations

import zlib
from typing import Any, Dict, Iterator, List, Optional, Sequence

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql import types as T

_CRLF = b"\r\n"


def encode_warc(
    records: Sequence[Dict[str, Any]], gzip_per_record: bool = False
) -> bytes:
    """Serialize records, each a dict with ``warc_type``, ``record_id``,
    optional ``target_uri`` / ``warc_date`` / ``content_type``, and
    either ``block`` (raw bytes) or ``http_status`` + ``http_headers``
    + ``body`` (an application/http response block is assembled).
    ``gzip_per_record`` emits one gzip member per record (the spec's
    seekable layout)."""
    out = bytearray()
    for r in records:
        if "block" in r:
            block = bytes(r["block"])
            ctype = r.get("content_type", "application/octet-stream")
        else:
            body = bytes(r.get("body", b""))
            status = int(r.get("http_status", 200))
            http = bytearray(f"HTTP/1.1 {status} OK".encode() + _CRLF)
            headers = dict(r.get("http_headers", {}))
            headers.setdefault("Content-Type", "text/html; charset=utf-8")
            headers.setdefault("Content-Length", str(len(body)))
            for k, v in headers.items():
                http += f"{k}: {v}".encode() + _CRLF
            http += _CRLF + body
            block = bytes(http)
            ctype = r.get("content_type", "application/http;msgtype=response")
        head = bytearray(b"WARC/1.1" + _CRLF)
        head += f"WARC-Type: {r['warc_type']}".encode() + _CRLF
        head += f"WARC-Record-ID: <{r['record_id']}>".encode() + _CRLF
        head += f"WARC-Date: {r.get('warc_date', '2026-01-01T00:00:00Z')}".encode() + _CRLF
        if r.get("target_uri"):
            head += f"WARC-Target-URI: {r['target_uri']}".encode() + _CRLF
        head += f"Content-Type: {ctype}".encode() + _CRLF
        head += f"Content-Length: {len(block)}".encode() + _CRLF
        rec = bytes(head) + _CRLF + block + _CRLF + _CRLF
        if gzip_per_record:
            co = zlib.compressobj(6, zlib.DEFLATED, 31)
            out += co.compress(rec) + co.flush()
        else:
            out += rec
    return bytes(out)


def _gunzip_members(data: bytes) -> bytes:
    """Concatenated gzip members -> concatenated plain bytes."""
    out = bytearray()
    rest = data
    while rest[:2] == b"\x1f\x8b":
        d = zlib.decompressobj(31)
        try:
            out += d.decompress(rest)
            out += d.flush()
        except zlib.error as e:
            raise ValueError(f"corrupt gzip member in WARC: {e}") from e
        if not d.eof:
            raise ValueError("truncated gzip member in WARC")
        rest = d.unused_data
    if rest:
        raise ValueError("trailing non-gzip bytes after gzip members")
    return bytes(out)


def decode_warc(data: bytes) -> List[Dict[str, Any]]:
    """Parse a WARC file (plain or per-record-gzip) into record dicts:
    ``warc_type, record_id, target_uri, warc_date, content_type,
    http_status, http_content_type, body``. For ``application/http``
    blocks the HTTP envelope is split off and ``body`` is the message
    body; other blocks pass through as ``body`` with null status."""
    if data[:2] == b"\x28\xb5":  # zstd magic prefix (.warc.zst)
        raise NotImplementedError(
            "zstd-compressed WARC needs the zstandard library"
        )
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    records: List[Dict[str, Any]] = []
    pos = 0
    while pos < len(data):
        # tolerate inter-record padding CRLFs
        while data[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= len(data):
            break
        if not data[pos : pos + 5] == b"WARC/":
            raise ValueError(f"not a WARC record at offset {pos}")
        hdr_end = data.find(_CRLF + _CRLF, pos)
        if hdr_end < 0:
            raise ValueError("truncated WARC record header")
        lines = data[pos:hdr_end].split(_CRLF)
        headers: Dict[str, str] = {}
        for ln in lines[1:]:
            k, _, v = ln.decode("utf-8", "replace").partition(":")
            headers[k.strip().lower()] = v.strip()
        cl = headers.get("content-length", "")
        if not cl.isdigit():  # absent or corrupt — never KeyError/int() escape
            raise ValueError("WARC record missing a numeric Content-Length")
        length = int(cl)
        block = data[hdr_end + 4 : hdr_end + 4 + length]
        if len(block) != length:
            raise ValueError("truncated WARC block")
        rec: Dict[str, Any] = {
            "warc_type": headers.get("warc-type"),
            "record_id": headers.get("warc-record-id", "").strip("<>"),
            "target_uri": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "content_type": headers.get("content-type"),
            "http_status": None,
            "http_content_type": None,
            "body": block,
        }
        if (rec["content_type"] or "").startswith("application/http"):
            split = block.find(_CRLF + _CRLF)
            if split >= 0:
                http_lines = block[:split].split(_CRLF)
                status_parts = http_lines[0].split(None, 2)
                if len(status_parts) >= 2 and status_parts[1].isdigit():
                    rec["http_status"] = int(status_parts[1])
                for ln in http_lines[1:]:
                    k, _, v = ln.decode("utf-8", "replace").partition(":")
                    if k.strip().lower() == "content-type":
                        rec["http_content_type"] = v.strip()
                rec["body"] = block[split + 4 :]
        records.append(rec)
        pos = hdr_end + 4 + length
    return records


WARC_SCHEMA = T.StructType(
    [
        T.StructField("src_id", T.LongType()),
        T.StructField("rec_index", T.IntegerType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("record_id", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("http_status", T.IntegerType()),
        T.StructField("http_content_type", T.StringType()),
        T.StructField("body", T.BinaryType()),
        T.StructField("parse_ok", T.BooleanType()),
        T.StructField("error", T.StringType()),
    ]
)


def warc_records(df: DataFrame, id_col: str, binary_col: str) -> DataFrame:
    """One row per WARC record per payload — the archive-to-table step
    of a crawl-ingest pipeline. A payload that fails to parse yields
    one ``parse_ok=false`` row carrying the error; good payloads never
    pay for bad neighbors."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in WARC_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for i, b in zip(pdf[id_col], pdf[binary_col]):
                base = {c: None for c in cols}
                base.update(src_id=int(i), parse_ok=False)
                try:
                    for j, rec in enumerate(decode_warc(bytes(b))):
                        row = dict(base, rec_index=j, parse_ok=True, **rec)
                        row.pop("content_type", None)
                        rows.append({c: row.get(c) for c in cols})
                except Exception as exc:
                    base["error"] = f"{type(exc).__name__}: {exc}"
                    rows.append(base)
            yield pd.DataFrame(rows, columns=cols)

    return df.select(F.col(id_col), F.col(binary_col)).mapInPandas(
        run, schema=WARC_SCHEMA
    )


# ---------------------------------------------------------------------------
# STREAMING file-scale reads — Common Crawl WARCs are ~1 GB per file;
# a whole-file binary column would hold the file in task memory (and
# Spark binary values cap at 2 GB). The streaming path keeps memory at
# O(largest record + decompress chunk): records are parsed out of a
# rolling buffer fed by incremental gzip-member decompression, and the
# Spark surface takes a DataFrame of PATHS (one task per file, opened
# executor-side through the engine's scheme-aware FileIO).
# ---------------------------------------------------------------------------

_CHUNK = 1 << 20


def _iter_decompressed(stream) -> Iterator[bytes]:
    """Plain or concatenated-gzip-member stream -> plain byte chunks,
    incrementally (never the whole file)."""
    # file-likes may legally return short reads — loop until 2 bytes
    # or EOF, else a 1-byte first read makes a gzip stream take the
    # plain-bytes path and fail later as 'not a WARC record' (ADVICE
    # r12)
    first = b""
    while len(first) < 2:
        b = stream.read(2 - len(first))
        if not b:
            break
        first += b
    if not first:
        return
    if first == b"\x28\xb5":  # zstd magic prefix (.warc.zst)
        raise NotImplementedError(
            "zstd-compressed WARC needs the zstandard library"
        )
    if first != b"\x1f\x8b":
        yield first
        while True:
            b = stream.read(_CHUNK)
            if not b:
                return
            yield b
        return
    d = zlib.decompressobj(31)
    pending = first
    while True:
        if not pending:
            pending = stream.read(_CHUNK)
            if not pending:
                if not d.eof:
                    raise ValueError("truncated gzip member in WARC")
                return
        out = d.decompress(pending)
        if out:
            yield out
        if d.eof:
            pending = d.unused_data
            # the next member's magic may straddle the read boundary
            while len(pending) < 2:
                more = stream.read(2 - len(pending))
                if not more:
                    if pending:
                        raise ValueError("trailing non-gzip bytes after gzip members")
                    return
                pending += more
            if pending[:2] != b"\x1f\x8b":
                raise ValueError("trailing non-gzip bytes after gzip members")
            d = zlib.decompressobj(31)
        else:
            pending = b""


def iter_warc_records(stream) -> Iterator[Dict[str, Any]]:
    """Yield record dicts (the :func:`decode_warc` shape) from a
    file-like binary stream, plain or per-record-gzip, holding only
    the current record in memory."""
    chunks = _iter_decompressed(stream)
    buf = bytearray()
    pos = 0
    done = False

    def fill(need: int) -> bool:
        # appends only — offsets into buf stay valid across calls;
        # the consumed prefix is trimmed at record boundaries
        nonlocal buf, done
        while len(buf) - pos < need and not done:
            try:
                buf += next(chunks)
            except StopIteration:
                done = True
        return len(buf) - pos >= need

    while True:
        while fill(2) and buf[pos : pos + 2] == _CRLF:
            pos += 2
        if not fill(5):
            return
        if bytes(buf[pos : pos + 5]) != b"WARC/":
            raise ValueError("not a WARC record in stream")
        hint = pos  # resume the separator search where it last ended
        while True:
            hdr_end = buf.find(_CRLF + _CRLF, hint)
            if hdr_end >= 0:
                break
            # the separator may straddle the old buffer end by 3 bytes
            hint = max(pos, len(buf) - 3)
            before = len(buf)
            fill(len(buf) - pos + 1)  # any amount of new bytes re-tries
            if len(buf) == before:
                raise ValueError("truncated WARC record header")
        lines = bytes(buf[pos:hdr_end]).split(_CRLF)
        headers: Dict[str, str] = {}
        for ln in lines[1:]:
            k, _, v = ln.decode("utf-8", "replace").partition(":")
            headers[k.strip().lower()] = v.strip()
        length = int(headers["content-length"])
        block_start = hdr_end + 4
        if not fill(block_start - pos + length):
            raise ValueError("truncated WARC block")
        block = bytes(buf[block_start : block_start + length])
        pos = block_start + length
        if pos > _CHUNK:  # trim consumed prefix so memory stays bounded
            del buf[:pos]
            pos = 0
        rec: Dict[str, Any] = {
            "warc_type": headers.get("warc-type"),
            "record_id": headers.get("warc-record-id", "").strip("<>"),
            "target_uri": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "content_type": headers.get("content-type"),
            "http_status": None,
            "http_content_type": None,
            "body": block,
        }
        if (rec["content_type"] or "").startswith("application/http"):
            split = block.find(_CRLF + _CRLF)
            if split >= 0:
                http_lines = block[:split].split(_CRLF)
                status_parts = http_lines[0].split(None, 2)
                if len(status_parts) >= 2 and status_parts[1].isdigit():
                    rec["http_status"] = int(status_parts[1])
                for ln in http_lines[1:]:
                    k, _, v = ln.decode("utf-8", "replace").partition(":")
                    if k.strip().lower() == "content-type":
                        rec["http_content_type"] = v.strip()
                rec["body"] = block[split + 4 :]
        yield rec


def _open_stream(path: str):
    from ..io.fileio import is_remote, split_scheme, to_local, _pa_fs

    scheme, _ = split_scheme(path)
    if scheme in (None, "file"):
        return open(to_local(path), "rb")
    fs, rel = _pa_fs(path)
    return fs.open_input_stream(rel)


WARC_PATH_SCHEMA = T.StructType(
    [T.StructField("path", T.StringType())]
    + [f for f in WARC_SCHEMA.fields if f.name != "src_id"]
)


def warc_records_from_paths(
    paths: DataFrame, path_col: str = "path", batch_records: int = 256
) -> DataFrame:
    """One row per WARC record from a DataFrame of FILE PATHS — the
    file-scale ingest surface (one task per archive, opened
    executor-side through the engine's scheme-aware FileIO, records
    streamed with O(record) memory). Repartition the path list to
    spread archives across executors. A file that fails mid-stream
    yields its parsed records plus one error row."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in WARC_PATH_SCHEMA.fields]
        for pdf in batches:
            for p in pdf[path_col]:
                rows: list = []
                try:
                    with _open_stream(str(p)) as f:
                        for j, rec in enumerate(iter_warc_records(f)):
                            rec.pop("content_type", None)
                            rows.append(
                                dict({c: None for c in cols}, path=str(p),
                                     rec_index=j, parse_ok=True, **rec)
                            )
                            if len(rows) >= batch_records:
                                yield pd.DataFrame(
                                    [{c: r.get(c) for c in cols} for r in rows],
                                    columns=cols,
                                )
                                rows = []
                except Exception as exc:
                    rows.append(
                        dict({c: None for c in cols}, path=str(p),
                             parse_ok=False, error=f"{type(exc).__name__}: {exc}")
                    )
                if rows:
                    yield pd.DataFrame(
                        [{c: r.get(c) for c in cols} for r in rows], columns=cols
                    )

    return paths.select(F.col(path_col)).mapInPandas(run, schema=WARC_PATH_SCHEMA)


def warc_to_documents(records: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """The canonical crawl-ingest composition: WARC record rows (from
    :func:`warc_records` or :func:`warc_records_from_paths`) ->
    documents-shaped rows ``(doc_id, text, lang, source, n_chars)``
    ready to append to a documents table and flow into the curation
    pipeline. Keeps successful HTTP 200 text/html-ish responses;
    ``doc_id`` is the xxhash64 of the WARC record id (stable across
    re-reads of the same crawl), ``source`` is the target URI's host,
    ``text`` is the HTML-stripped body, ``lang`` the n-gram guess.
    Pure column expressions plus the existing text operators — no new
    Python in the path."""
    from .text import language_id, strip_html

    resp = records.where(
        F.col("parse_ok")
        & (F.col("warc_type") == "response")
        & (F.col("http_status") == 200)
        & (
            F.col("http_content_type").isNull()
            | F.col("http_content_type").startswith("text/")
        )
    ).select(
        F.xxhash64("record_id").alias(id_col),
        F.col("body").cast("string").alias("text"),
        F.parse_url(F.col("target_uri"), F.lit("HOST")).alias("source"),
    )
    # Re-crawled archives repeat record ids; the three equi-joins
    # below key on doc_id, so n duplicates would fan out to n^3 rows
    # (ADVICE r12). Keep one deterministic winner per doc_id (ordered
    # by content, not partition layout) before fanning into the joins.
    w = Window.partitionBy(id_col).orderBy("text", "source")
    resp = (
        resp.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    stripped = strip_html(resp, "text", id_col)
    lang = language_id(stripped, "text", id_col)
    return (
        stripped.join(lang, id_col)
        .join(resp.select(id_col, "source"), id_col)
        .select(
            id_col,
            "text",
            F.col("lang_guess").alias("lang"),
            "source",
            F.length("text").alias("n_chars"),
        )
    )
