"""Extraction kernels: byte-identity, spans, boilerplate stripping.

Pure-Python tests (no Spark) — the kernels are pure functions of the
payload bytes, which is exactly what makes them safe inside Arrow batches.
"""

from __future__ import annotations

import duckdb
import pytest

from dpo_ocr_spark.corpus import (
    expected_text,
    is_layout_doc,
    render_html,
    render_layout,
    split_paragraphs,
    token_confidence,
)
from dpo_ocr_spark.extract.html import extract_html, segment_html
from dpo_ocr_spark.extract.layout import extract_layout

DOCS = duckdb.sql(
    "select doc_id, text from '/root/testdata/sf0.001/documents.parquet'"
).fetchall()


def test_byte_identical_text_all_docs():
    for doc_id, text in DOCS:
        exp = expected_text(text)
        if is_layout_doc(doc_id):
            got, _, _ = extract_layout(render_layout(doc_id, text))
        else:
            got, _, _ = extract_html(render_html(doc_id, text))
        assert got == exp, f"doc {doc_id} text not byte-identical"


def test_token_spans_slice_text():
    for doc_id, text in DOCS[:50]:
        payload = (
            render_layout(doc_id, text)
            if is_layout_doc(doc_id)
            else render_html(doc_id, text)
        )
        got, tokens, _ = (
            extract_layout(payload) if is_layout_doc(doc_id) else extract_html(payload)
        )
        for t in tokens:
            word, start, end = t[5], t[8], t[9]
            assert got[start:end] == word


def test_reading_order_ids_monotone():
    doc_id, text = next((d, t) for d, t in DOCS if is_layout_doc(d))
    _, tokens, _ = extract_layout(render_layout(doc_id, text))
    keys = [(t[0], t[1], t[3], t[4]) for t in tokens]  # page,block,line,word
    assert keys == sorted(keys)
    assert [t[4] for t in tokens] == list(range(len(tokens)))


def test_boilerplate_stripped():
    html = render_html(7, "alpha beta gamma delta epsilon zeta")
    segs = segment_html(html)
    joined = "\n".join(segs)
    for boiler in ("Home", "Archive", "Sponsored", "Privacy", "Share",
                   "Document 7", "Doc 7", "trackPageView", "margin:0"):
        assert boiler not in joined
    assert "alpha" in joined


def test_link_density_threshold():
    # a block that is mostly links must be dropped even outside kill tags
    page = (b"<html><body><div><a href='x'>click here now</a> ok</div>"
            b"<p>real body content words</p></body></html>")
    segs = segment_html(page)
    assert segs == ["real body content words"]


def test_plain_entities_unescaped():
    page = b"<html><body><p>a &amp; b &lt;c&gt;</p></body></html>"
    assert segment_html(page) == ["a & b <c>"]


def test_split_paragraphs_contract():
    assert split_paragraphs("a b") == ["a b"]
    assert split_paragraphs("a b c") == ["a", "b", "c"]
    assert split_paragraphs("a b c d") == ["a b", "c", "d"]  # cuts at 2, 3
    words = [f"w{i}" for i in range(10)]
    paras = split_paragraphs(" ".join(words))
    assert " ".join(paras).split(" ") == words


def test_confidence_formula_range():
    vals = [token_confidence(w, i) for i, w in enumerate(["a", "bb", "ccc"] * 40)]
    assert all(0.0 <= v <= 1.0 for v in vals)
    assert any(v <= 0.70 for v in vals) and any(v >= 0.85 for v in vals)


def test_layout_block_bbox_envelope():
    doc_id, text = next((d, t) for d, t in DOCS if is_layout_doc(d))
    _, tokens, blocks = extract_layout(render_layout(doc_id, text))
    for page, b, conf, bbox in blocks:
        xs = [v for t in tokens if t[1] == b for v in t[7][0::2]]
        ys = [v for t in tokens if t[1] == b for v in t[7][1::2]]
        assert bbox[0] == min(xs) and bbox[2] == max(xs)
        assert bbox[1] == min(ys) and bbox[5] == max(ys)
