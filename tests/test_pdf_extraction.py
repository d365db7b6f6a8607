"""S1 — real-PDF extraction through the non-stub decode path.

The fixture builder emits genuine one-page PDFs (catalog/pages/page objects
plus a content stream, uncompressed or FlateDecode).  Assertions replicate
the reference's paragraph semantics (pdf_text_extractor.py:54-117): split on
blank lines, drop paragraphs with < min_paragraph_length alphabetic chars.
"""

from __future__ import annotations

import zlib

from aicoe_osc_demo_spark.sources.extraction import (
    _decode_pages,
    _decode_pdf_stdlib,
    extract_text,
)

_LONG_1 = "This opening paragraph certainly carries enough alphabetic characters"
_LONG_2 = "A second real paragraph also clearing the thirty alpha character floor"
_SHORT = "too short"


def _page_stream(compress: bool) -> bytes:
    ops = (
        b"BT /F1 12 Tf 72 720 Td "
        b"(" + _LONG_1.encode() + b") Tj 0 -14 Td "
        b"() Tj 0 -14 Td "
        b"(" + _SHORT.encode() + b") Tj 0 -14 Td "
        b"() Tj 0 -14 Td "
        b"[(" + _LONG_2[:20].encode() + b") (" + _LONG_2[20:].encode() + b")] TJ "
        b"ET"
    )
    return zlib.compress(ops) if compress else ops


def _pdf_bytes(compress: bool = False) -> bytes:
    stream = _page_stream(compress)
    filt = b" /Filter /FlateDecode" if compress else b""
    objs = [
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n",
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R "
        b"/MediaBox [0 0 612 792] >> endobj\n",
        b"4 0 obj << /Length " + str(len(stream)).encode() + filt + b" >>\nstream\n"
        + stream
        + b"\nendstream\nendobj\n",
        b"5 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> endobj\n",
    ]
    return b"%PDF-1.4\n" + b"".join(objs) + b"%%EOF\n"


def test_stdlib_pdf_decode_plain_and_flate():
    for compress in (False, True):
        pages = _decode_pdf_stdlib(_pdf_bytes(compress))
        assert len(pages) == 1
        assert _LONG_1 in pages[0]
        assert _LONG_2 in pages[0]  # TJ array parts concatenated
        assert "\n\n" in pages[0]  # empty Tj became the blank-line separator


def test_decode_pages_routes_pdf_bytes():
    # %PDF magic routes to the stdlib reader; other bytes keep the utf-8 stub
    assert _LONG_1 in _decode_pages(_pdf_bytes())[0]
    assert _decode_pages("plain\ftext".encode()) == ["plain", "text"]


def test_extract_text_real_pdf_paragraph_filter(spark, tmp_path):
    (tmp_path / "report.pdf").write_bytes(_pdf_bytes(compress=False))
    (tmp_path / "zipped.pdf").write_bytes(_pdf_bytes(compress=True))
    binary = spark.read.format("binaryFile").load(str(tmp_path))
    out = extract_text(binary, min_paragraph_length=30).collect()
    by_pdf: dict[str, list[str]] = {}
    for r in out:
        by_pdf.setdefault(r.pdf_name, []).append(r.paragraph)
        assert r.page == 0
    for name in ("report.pdf", "zipped.pdf"):
        paras = by_pdf[name]
        # the <30-alpha paragraph is dropped, both long ones survive
        assert len(paras) == 2
        assert _LONG_1 in paras[0]
        assert all(_SHORT != p for p in paras)
