"""PDF text-extraction: round trip, foreign layouts, gates, Spark surface."""

import re
import struct
import zlib

import pytest
from pyspark.sql import functions as F

from iceberg_python_spark.operators.pdf import (
    PdfDocument,
    decode_pdf_text,
    encode_pdf,
    pdf_pages,
)


def test_roundtrip_escapes_and_unicode():
    pages = [
        "hello world\nsecond line",
        "parens (nested (deep)) and \\ backslash",
        "ünïcödé µ — em-dash\ttab",
        "",  # empty page
        "trailing newline\n",
    ]
    for compress in (True, False):
        assert decode_pdf_text(encode_pdf(pages, compress=compress)) == pages


def _min_pdf(objs, root=1, trailer_extra=""):
    """Hand-assemble a classic-xref PDF from numbered object bodies."""
    out = bytearray(b"%PDF-1.4\n")
    offsets = {}
    for num, body in objs:
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_off = len(out)
    mx = max(offsets) + 1
    out += f"xref\n0 {mx}\n".encode()
    out += b"0000000000 65535 f \n"
    for i in range(1, mx):
        if i in offsets:
            out += f"{offsets[i]:010d} 00000 n \n".encode()
        else:
            out += b"0000000000 65535 f \n"
    out += (
        f"trailer\n<< /Size {mx} /Root {root} 0 R {trailer_extra}>>\n"
        f"startxref\n{xref_off}\n%%EOF\n"
    ).encode()
    return bytes(out)


def test_foreign_layout_tj_arrays_hex_strings_quote_ops():
    """Text via TJ kerning arrays, <hex> strings, and the ' operator —
    none of which our writer emits."""
    content = (
        b"BT /F1 10 Tf 72 720 Td "
        b"[(Hel) -20 (lo) 5 ( wor) (ld)] TJ "
        b"(, next) Tj "
        b"<20616E6420686578> Tj "  # " and hex"
        b"(line two) ' "
        b"ET"
    )
    objs = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
        (3, b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"),
        (4, b"<< /Length %d >>\nstream\n%s\nendstream" % (len(content), content)),
    ]
    assert decode_pdf_text(_min_pdf(objs)) == ["Hello world, next and hex\nline two"]


def test_foreign_layout_nested_kids_and_contents_array():
    """A nested /Pages tree and a page whose /Contents is an ARRAY of
    streams (spec: they form one logical stream)."""
    # the spec forbids tokens spanning the stream boundary — split
    # between two Tj shows, which must still fuse into one line
    c1 = b"BT 72 720 Td (part one) Tj"
    c2 = b"( and part two) Tj ET"
    objs = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [5 0 R 4 0 R] /Count 2 >>"),
        (3, b"<< /Type /Page /Parent 5 0 R /Contents [6 0 R 7 0 R] >>"),
        (4, b"<< /Type /Page /Parent 2 0 R /Contents 8 0 R >>"),
        (5, b"<< /Type /Pages /Kids [3 0 R] /Count 1 /Parent 2 0 R >>"),
        (6, b"<< /Length %d >>\nstream\n%s\nendstream" % (len(c1), c1)),
        (7, b"<< /Length %d >>\nstream\n%s\nendstream" % (len(c2), c2)),
        (8, b"<< /Length 24 >>\nstream\nBT 0 0 Td (second) Tj ET\nendstream"),
    ]
    # NB: object 8's /Length is deliberately exact: "BT 0 0 Td (second) Tj ET" is 25
    objs[7] = (8, b"<< /Length 25 >>\nstream\nBT 0 0 Td (second) Tj ET\nendstream")
    assert decode_pdf_text(_min_pdf(objs)) == ["part one and part two", "second"]


def test_indirect_length_and_prev_chain():
    """/Length as an indirect reference, and an incremental-update
    file whose second xref section /Prev-chains to the first."""
    content = b"BT (v2 text) Tj ET"
    base_objs = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
        (3, b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"),
        (4, b"<< /Length 5 0 R >>\nstream\nBT (v1 text) Tj ET\nendstream"),
        (5, str(len(b"BT (v1 text) Tj ET")).encode()),
    ]
    base = _min_pdf(base_objs)
    assert decode_pdf_text(base) == ["v1 text"]
    # incremental update: append a replacement object 4 + new xref
    m = list(re.finditer(rb"startxref\s+(\d+)", base))[-1]
    prev_off = int(m.group(1))
    upd = bytearray(base)
    new4_off = len(upd)
    body = b"<< /Length %d >>\nstream\n%s\nendstream" % (len(content), content)
    upd += b"4 0 obj\n" + body + b"\nendobj\n"
    x2 = len(upd)
    upd += b"xref\n4 1\n" + f"{new4_off:010d} 00000 n \n".encode()
    upd += (
        f"trailer\n<< /Size 6 /Root 1 0 R /Prev {prev_off} >>\n"
        f"startxref\n{x2}\n%%EOF\n"
    ).encode()
    assert decode_pdf_text(bytes(upd)) == ["v2 text"]


def test_xref_stream_file_falls_back_to_object_scan():
    """A PDF 1.5 file whose startxref points at a cross-reference
    STREAM: offsets are recovered by scanning object headers."""
    content = b"BT (modern xref) Tj ET"
    out = bytearray(b"%PDF-1.5\n")
    objs = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
        (3, b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"),
        (4, b"<< /Length %d >>\nstream\n%s\nendstream" % (len(content), content)),
    ]
    for num, body in objs:
        out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    # fake xref stream object (we never parse its payload)
    xs_off = len(out)
    xs = zlib.compress(b"\x00" * 25)
    out += b"5 0 obj\n<< /Type /XRef /Size 6 /W [1 2 2] /Root 1 0 R /Filter /FlateDecode /Length %d >>\nstream\n%s\nendstream\nendobj\n" % (len(xs), xs)
    out += b"startxref\n%d\n%%%%EOF\n" % xs_off
    assert decode_pdf_text(bytes(out)) == ["modern xref"]


def test_gates_encrypted_objstm_truncated_badfilter():
    data = encode_pdf(["secret"])
    # r17: encryption with an EMPTY user password decrypts for real
    # (test_pdf_encryption); a trailer naming a MISSING /Encrypt object
    # is corrupt structure -> ValueError
    enc = data.replace(b"/Root 1 0 R", b"/Root 1 0 R /Encrypt 9 0 R")
    with pytest.raises(ValueError):
        decode_pdf_text(enc)
    with pytest.raises(ValueError):
        decode_pdf_text(b"%PDF-1.4\ngarbage with no structure at all")
    with pytest.raises((ValueError, NotImplementedError)):
        decode_pdf_text(data[: len(data) // 2])
    # r17: LZWDecode is implemented — zlib bytes mislabeled as LZW are
    # a ValueError; a genuinely unsupported filter still gates by name
    lzw = data.replace(b"/Filter /FlateDecode", b"/Filter /LZWDecode")
    with pytest.raises(ValueError):
        decode_pdf_text(lzw)
    crypt = data.replace(b"/Filter /FlateDecode", b"/Filter /CryptDecode")
    with pytest.raises(NotImplementedError, match="CryptDecode"):
        decode_pdf_text(crypt)
    # corrupt flate payload inside a valid structure
    doc = PdfDocument(data)
    s = doc.resolve(doc.pages()[0]["Contents"])
    broken = data.replace(s.raw, bytes(len(s.raw)))
    with pytest.raises(ValueError, match="FlateDecode"):
        decode_pdf_text(broken)


def test_cyclic_structures_raise_not_hang():
    """ADVICE r13: a self-referential indirect object must raise (not
    spin resolve() forever), and a /Kids tree referencing an ancestor
    must raise ValueError (not RecursionError) — one crafted payload
    can never hang or crash the whole Spark job."""
    # 4 0 obj 4 0 R endobj — resolve() cycle, reached via /Contents
    cyc = _min_pdf(
        [
            (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
            (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
            (3, b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"),
            (4, b"4 0 R"),
        ]
    )
    with pytest.raises(ValueError, match="cycle"):
        decode_pdf_text(cyc)
    # two-object reference cycle (5 -> 6 -> 5)
    cyc2 = _min_pdf(
        [
            (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
            (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
            (3, b"<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>"),
            (5, b"6 0 R"),
            (6, b"5 0 R"),
        ]
    )
    with pytest.raises(ValueError, match="cycle"):
        decode_pdf_text(cyc2)
    # page tree whose Kids points back at the root Pages node
    ktree = _min_pdf(
        [
            (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
            (2, b"<< /Type /Pages /Kids [2 0 R] /Count 1 >>"),
        ]
    )
    with pytest.raises(ValueError, match="cycle|256 levels"):
        decode_pdf_text(ktree)


def test_pdf_pages_spark_surface(spark):
    """One row per page; a corrupt payload yields its error row while
    every other payload parses fully."""
    good = encode_pdf(["page one text", "page two\nwith lines"])
    single = encode_pdf(["only"], compress=False)
    rows = [
        (0, bytearray(good)),
        (1, bytearray(b"%PDF-1.4 but junk")),
        (2, bytearray(single)),
    ]
    df = spark.createDataFrame(rows, "id: long, payload: binary")
    out = pdf_pages(df, "id", "payload").collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["src_id"], []).append(r)
    assert [r["page_no"] for r in sorted(by_src[0], key=lambda r: r["page_no"])] == [1, 2]
    assert sorted(r["text"] for r in by_src[0]) == ["page one text", "page two\nwith lines"]
    assert all(r["n_pages"] == 2 and r["parse_ok"] for r in by_src[0])
    (bad,) = by_src[1]
    assert not bad["parse_ok"] and "ValueError" in bad["error"]
    (one,) = by_src[2]
    assert one["text"] == "only" and one["n_chars"] == 4 and one["n_pages"] == 1


from hypothesis import given, settings
from hypothesis import strategies as st


@given(
    st.lists(
        st.text(
            alphabet=st.characters(blacklist_categories=("Cs",)),  # no lone surrogates
            max_size=200,
        ),
        min_size=1,
        max_size=4,
    ),
    st.booleans(),
)
@settings(max_examples=60, deadline=None)
def test_pdf_roundtrip_property(pages, compress):
    """Any unicode page texts (control chars, parens, backslashes,
    newlines, emoji) survive encode -> decode exactly."""
    assert decode_pdf_text(encode_pdf(pages, compress=compress)) == pages


from hypothesis import given, settings
from hypothesis import strategies as st


@given(st.binary(max_size=400))
@settings(max_examples=150, deadline=None)
def test_pdf_garbage_never_hangs_or_leaks(payload):
    """The error-isolation contract under fuzz: arbitrary bytes (with
    and without a PDF magic prefix) either parse or raise one of the
    caught exception types — never hang, never escape the pdf_pages
    catch list."""
    for data in (payload, b"%PDF-1.4\n" + payload):
        try:
            decode_pdf_text(data)
        except (ValueError, NotImplementedError, KeyError, IndexError, RecursionError):
            pass


# ---------------------------------------------------------------------------
# PDF 1.5 modern file structure (r17): xref streams, /ObjStm, predictors
# ---------------------------------------------------------------------------

from iceberg_python_spark.operators.pdf import encode_pdf_modern


def test_modern_pdf_roundtrip_through_real_15_paths():
    """encode_pdf_modern emits the post-2005 layout (ObjStm + xref
    STREAM + Predictor 12) and the reader must resolve it through the
    real 1.5 machinery — NOT the object-header scan fallback."""
    pages = ["Hello world\nline two", "Page two text", "", "Third page ünïcödé"]
    modern = encode_pdf_modern(pages)
    assert decode_pdf_text(modern) == pages
    # deterministic bytes, and text-identical to the classic writer
    assert encode_pdf_modern(pages) == modern
    assert decode_pdf_text(encode_pdf(pages)) == pages
    doc = PdfDocument(modern)
    doc.pages()
    assert doc._in_objstm, "catalog/page dicts must be ObjStm-packed"
    assert not doc._scanned, "must use the xref stream, not the scan fallback"


def test_modern_pdf_damaged_xref_recovers_packed_catalog():
    """Corrupting the xref stream forces the object-header scan, which
    must still reach the catalog INSIDE the /ObjStm."""
    pages = ["recovered one", "recovered two"]
    data = bytearray(encode_pdf_modern(pages))
    ix = data.rfind(b"startxref")
    off = int(data[ix + 10 : data.find(b"\n", ix + 10)])
    data[off : off + 4] = b"ZZZZ"
    doc = PdfDocument(bytes(data))
    assert doc._scanned
    assert decode_pdf_text(bytes(data)) == pages


def test_hybrid_reference_file_xrefstm_key():
    """§7.5.8.4 hybrid file: a CLASSIC xref section whose trailer
    carries /XRefStm pointing at the stream that maps the
    ObjStm-packed objects. startxref targets the classic section."""
    pages = ["hybrid page"]
    base = encode_pdf_modern(pages)
    ix = base.rfind(b"startxref")
    xs_off = int(base[ix + 10 : base.find(b"\n", ix + 10)])
    body = base[:ix]  # keep objects + xref stream, drop old startxref
    out = bytearray(body)
    classic_off = len(out)
    out += b"xref\n0 1\n0000000000 65535 f \n"
    out += (
        b"trailer\n<< /Size 99 /Root 1 0 R /XRefStm %d >>\n"
        b"startxref\n%d\n%%%%EOF\n" % (xs_off, classic_off)
    )
    doc = PdfDocument(bytes(out))
    doc.pages()
    assert doc._in_objstm and not doc._scanned
    assert decode_pdf_text(bytes(out)) == pages


def test_unpredict_png_all_row_filters_and_tiff():
    """_unpredict must reverse every PNG row filter regardless of the
    nominal Predictor value (the tag byte per row governs), plus TIFF
    horizontal differencing (Predictor 2)."""
    import numpy as np

    doc = PdfDocument(encode_pdf(["x"]))
    rows = np.array(
        [[3, 200, 7, 255], [0, 9, 250, 1], [128, 64, 32, 16]], dtype=np.uint8
    )
    bpp, ncols = 1, 4
    # forward-filter row i with filter (i % 5) cycling Sub/Up/Average/Paeth/None
    filt = bytearray()
    prev = np.zeros(ncols, np.int32)
    for i, row in enumerate(rows.astype(np.int32)):
        tag = [1, 2, 3, 4, 0][i % 5]
        filt.append(tag)
        left = np.concatenate([[0] * bpp, row[:-bpp]])
        pleft = np.concatenate([[0] * bpp, prev[:-bpp]])
        if tag == 0:
            enc = row
        elif tag == 1:
            enc = row - left
        elif tag == 2:
            enc = row - prev
        elif tag == 3:
            enc = row - (left + prev) // 2
        else:
            p = left + prev - pleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - pleft)
            pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, pleft))
            enc = row - pred
        filt += (enc % 256).astype(np.uint8).tobytes()
        prev = row
    got = doc._unpredict(bytes(filt), {"Predictor": 12, "Columns": ncols})
    assert got == rows.tobytes()
    # TIFF predictor 2, Colors 2: per-lane cumulative sums
    raw = np.array([[10, 5, 250, 7, 3, 9]], dtype=np.uint8)
    diff = raw.astype(np.int32).copy()
    diff[:, 2::2] = raw[:, 2::2].astype(np.int32) - raw[:, 0:-2:2]
    diff[:, 3::2] = raw[:, 3::2].astype(np.int32) - raw[:, 1:-2:2]
    got2 = doc._unpredict(
        (diff % 256).astype(np.uint8).tobytes(),
        {"Predictor": 2, "Colors": 2, "Columns": 3},
    )
    assert got2 == raw.tobytes()
    with pytest.raises(ValueError, match="Predictor 7"):
        doc._unpredict(b"\x00" * 4, {"Predictor": 7, "Columns": 4})


def test_modern_pdf_malformed_structures_raise_not_hang():
    """Crafted 1.5 structures: self-referencing ObjStm, xref pointing
    into a non-ObjStm, bad /W widths, short xref payload — all raise
    ValueError (or recover via scan) rather than hanging or escaping."""
    pages = ["victim"]
    base = encode_pdf_modern(pages)
    # (a) truncate the xref stream payload -> scan fallback still reads
    short = base.replace(b"/W [1 4 2]", b"/W [1 8 8]")
    assert decode_pdf_text(short) == pages  # falls back to scan, recovers
    # (b) ObjStm that claims itself as container for a member
    doc = PdfDocument(base)
    objstm_num = next(iter(doc._in_objstm.values()))[0]
    doc2 = PdfDocument(base)
    doc2._in_objstm[objstm_num] = (objstm_num, 0)
    doc2._offsets.pop(objstm_num, None)
    with pytest.raises(ValueError, match="references itself"):
        doc2.obj(objstm_num)
    # (c) xref type-2 entry pointing into a non-ObjStm object
    doc3 = PdfDocument(base)
    any_top = next(iter(doc3._offsets))
    packed_num = next(iter(doc3._in_objstm))
    doc3._in_objstm[packed_num] = (any_top, 0)
    with pytest.raises(ValueError):
        doc3.obj(packed_num)


# ---------------------------------------------------------------------------
# r17: byte filters, image XObjects, scanned-document path
# ---------------------------------------------------------------------------

import numpy as np

from iceberg_python_spark.operators.pdf import (
    decode_pdf_images,
    encode_pdf_scanned,
    pdf_images,
)


def test_byte_filters_roundtrip_through_reader():
    """LZW / RunLength / ASCIIHex / ASCII85 content streams extract the
    same text as Flate (filters re-encoded by hand onto a known body)."""
    from iceberg_python_spark.operators.pdf import (
        _ascii85_decode,
        _asciihex_decode,
        _runlength_decode,
        _runlength_encode,
    )
    from iceberg_python_spark.operators.tiff import _tiff_lzw_decode, _tiff_lzw_encode

    body = b"BT /F1 12 Tf 72 720 Td (filter page) Tj ET"
    import base64

    variants = {
        b"/LZWDecode": _tiff_lzw_encode(body),
        b"/RunLengthDecode": _runlength_encode(body),
        b"/ASCIIHexDecode": body.hex().encode() + b">",
        b"/ASCII85Decode": base64.a85encode(body) + b"~>",
    }
    for fname, raw in variants.items():
        out = bytearray(b"%PDF-1.4\n")
        objs = [
            (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
            (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
            (3, b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"),
            (4, b"<< /Length %d /Filter %s >>\nstream\n%s\nendstream" % (len(raw), fname, raw)),
        ]
        offs = {}
        for num, b in objs:
            offs[num] = len(out)
            out += b"%d 0 obj\n" % num + b + b"\nendobj\n"
        xr = len(out)
        out += b"xref\n0 5\n0000000000 65535 f \n"
        for num in range(1, 5):
            out += b"%010d 00000 n \n" % offs[num]
        out += b"trailer\n<< /Size 5 /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n" % xr
        assert decode_pdf_text(bytes(out)) == ["filter page"], fname
    # decoder primitives: exactness + EOD handling
    assert _runlength_decode(_runlength_encode(b"aaaabcdddddd" * 9)) == b"aaaabcdddddd" * 9
    assert _asciihex_decode(b"48 65 6c 6c 6f>") == b"Hello"
    assert _ascii85_decode(base64.a85encode(b"Hello world") + b"~>ignored") == b"Hello world"
    assert _tiff_lzw_decode(_tiff_lzw_encode(b"x" * 5000), 5000) == b"x" * 5000


def test_scanned_pdf_images_all_encodings():
    """encode_pdf_scanned -> decode_pdf_images across every image
    filter; text layer extracts alongside."""
    rng = np.random.default_rng(4)
    ink = (rng.random((30, 40)) < 0.4).astype(np.uint8)
    rgb = rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)
    gray = rng.integers(0, 256, (16, 20), dtype=np.uint8)
    bilevel_want = ((1 - ink) * 255).astype(np.uint8)
    cases = [
        ("ccitt-g4", ink, bilevel_want),
        ("ccitt-g3", ink, bilevel_want),
        ("ccitt-mh", ink, bilevel_want),
        ("flate", rgb, rgb),
        ("flate", gray, gray),
        ("lzw", gray, gray),
        ("rle-hex", gray, gray),
    ]
    for filt, img, want in cases:
        data = encode_pdf_scanned([img, img], image_filter=filt, texts=["s1", "s2"])
        assert encode_pdf_scanned([img, img], image_filter=filt, texts=["s1", "s2"]) == data
        imgs = decode_pdf_images(data)
        assert [r["page_no"] for r in imgs] == [1, 2], filt
        assert (imgs[0]["pixels"] == want).all(), filt
        assert decode_pdf_text(data) == ["s1", "s2"], filt
    # DCT is lossy: dims + bounded error, byte-deterministic
    data = encode_pdf_scanned([rgb], image_filter="dct")
    px = decode_pdf_images(data)[0]["pixels"]
    assert px.shape == rgb.shape
    assert np.abs(px.astype(int) - rgb.astype(int)).mean() < 12
    # dims-vs-dict contract
    bad = data.replace(b"/Width 32", b"/Width 31")
    with pytest.raises(ValueError):
        decode_pdf_images(bad)
    # JBIG2 gates by name
    jb = encode_pdf_scanned([ink], image_filter="ccitt-g4").replace(
        b"/CCITTFaxDecode", b"/JBIG2Decode\x20\x20"
    )
    with pytest.raises((NotImplementedError, ValueError)):
        decode_pdf_images(jb)


def test_pdf_images_spark_surface(spark):
    rng = np.random.default_rng(9)
    ink = (rng.random((20, 30)) < 0.5).astype(np.uint8)
    good = encode_pdf_scanned([ink, 1 - ink], image_filter="ccitt-g4", texts=["a", "b"])
    rows = [(1, good), (2, b"%PDF-1.4 not really")]
    df = spark.createDataFrame(rows, "id long, payload binary")
    out = pdf_images(df, "id", "payload").orderBy("src_id", "page_no").collect()
    ok = [r for r in out if r.parse_ok]
    assert [(r.src_id, r.page_no) for r in ok] == [(1, 1), (1, 2)]
    assert ok[0].width == 30 and ok[0].height == 20
    assert ok[0].phash != ok[1].phash  # inverted page hashes differently
    assert any(r.src_id == 2 and not r.parse_ok for r in out)
