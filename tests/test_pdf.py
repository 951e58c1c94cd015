"""PDF content-stream extraction (extract/pdf.py) + the PDF corpus mix."""

from __future__ import annotations

import zlib

from dpo_ocr_spark.corpus import expected_text, render_pdf
from dpo_ocr_spark.extract.pdf import (
    _decode_pdf_string,
    _parse_content,
    extract_pdf,
)
from dpo_ocr_spark.extract.stage import _extract_one

TEXTS = [
    "alpha beta gamma delta epsilon zeta eta theta iota kappa",
    "short one",
    "double  space preserved here and  there",
    "日本語 mixed ascii テスト words and ünïcödé",
    "paren (tricky) and \\backslash\\ word",
    "x",
]


def test_roundtrip_flate_and_raw():
    for i, t in enumerate(TEXTS):
        for doc_id in (i * 2, i * 2 + 1):  # even = FlateDecode, odd = raw
            got, tokens, blocks = extract_pdf(render_pdf(doc_id, t))
            assert got == expected_text(t), (doc_id, t)
            n_lines = expected_text(t).count("\n") + 1
            assert len(blocks) == n_lines
            # token shape mirrors extract_html: block == word_line == line
            for tok in tokens:
                assert tok[1] == tok[3] and tok[6] == 1.0 and tok[7] is None
                start, end = tok[8], tok[9]
                assert got[start:end] == tok[5]


def test_dispatch_kind_pdf():
    kind, text, tokens, _blocks, nb = _extract_one(render_pdf(2, TEXTS[0]), None)
    assert kind == "pdf" and nb > 0
    assert text == expected_text(TEXTS[0]) and len(tokens) == 10
    # garbage that claims to be PDF quarantines instead of aborting
    kind, text, *_ = _extract_one(b"%PDF-1.4\nstream\n\x00\xff", None)
    assert kind in ("pdf", "error")


def test_string_escapes():
    assert _decode_pdf_string(rb"a\(b\)c\\d", False) == "a(b)c\\d"
    assert _decode_pdf_string(rb"tab\there\nnl", False) == "tab\there\nnl"
    assert _decode_pdf_string(rb"\101\102\103", False) == "ABC"
    assert _decode_pdf_string(rb"\61\62", False) == "12"
    # line continuation joins
    assert _decode_pdf_string(b"ab\\\ncd", False) == "abcd"
    # hex: UTF-16BE with BOM vs plain latin-1 bytes
    assert _decode_pdf_string(b"FEFF65E5672C", True) == "日本"
    assert _decode_pdf_string(b"48 49", True) == "HI"
    assert _decode_pdf_string(b"484", True) == "H@"  # odd digit pads 0


def test_td_tstar_tj_array_parsing():
    content = (
        b"BT /F1 10 Tf 20 TL 72 700 Td (first) Tj "
        b"T* (second) Tj 0 -20 Td [(thi)(rd)] TJ ET"
    )
    shows = _parse_content(content)
    assert [s for _x, _y, s in shows] == ["first", "second", "thi", "rd"]
    ys = [y for _x, y, s in shows]
    assert ys[0] == 700 and ys[1] == 680 and ys[2] == 660
    # grouping: three lines, TJ pieces share the third line
    pdf = (
        b"%PDF-1.4\n1 0 obj\n<< /Length "
        + str(len(content)).encode()
        + b" >>\nstream\n" + content + b"\nendstream\nendobj\n"
    )
    text, tokens, _ = extract_pdf(pdf)
    assert text == "first\nsecond\nthi rd"


def test_pdf_gate_query(spark):
    from dpo_ocr_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    a = {
        (r["url"], r["text"])
        for r in QUERIES["extract_text_pdf"](spark, sf).collect()
    }
    b = {
        (r["url"], r["text"])
        for r in QUERIES["extract_text"](spark, sf).collect()
    }
    assert a == b


def test_inline_dict_does_not_hang_or_show():
    # marked-content dicts (every tagged PDF): scanner must both make
    # progress and not emit the dict's string operands as shows
    shows = _parse_content(
        b"BT /Span << /ActualText (hidden) >> BDC (visible) Tj EMC ET"
    )
    assert [s for _x, _y, s in shows] == ["visible"]


def test_indirect_length_falls_back_to_heuristic():
    from dpo_ocr_spark.extract.pdf import _streams_of

    pdf = (
        b"%PDF-1.4\n1 0 obj\n<< /Length 2 0 R >>\nstream\n"
        b"BT (ok) Tj ET\nendstream\nendobj\n2 0 obj\n13\nendobj\n"
    )
    assert _streams_of(pdf) == [b"BT (ok) Tj ET"]
    text, *_ = extract_pdf(pdf)
    assert text == "ok"
