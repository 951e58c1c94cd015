"""The Arrow-batched extraction stage (the engine's S3 operator).

``extract_pages`` maps the input_hint frame (url, warc_ts, html, text, lang)
to one wide result row per url: extracted text + token records + block
records + size metrics — the Spark re-expression of the reference's
per-document emit fan-out (run_gvision_ocr.py:375-387 word INSERTs,
:261-269 block INSERTs, :166-168 fulltext) as a single ``mapInPandas``
producing every artifact at once (SURVEY.md §3.1 stage 6).

Scale notes:
- narrow transformation: no shuffle — decode pipelines directly over the
  (optionally salted, see ``scale.salted_repartition``) input partitions;
- payload dispatch sniffs the first byte ('{' → layout JSON, else HTML),
  so mixed corpora need no per-kind job split;
- zero per-row Python at the Spark level: one Python invocation per Arrow
  batch (``spark.sql.execution.arrow.maxRecordsPerBatch`` caps batch bytes).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

from ..nogc import nogc_batches
from ..schemas import EXTRACT_RESULT
from .html import extract_html
from .layout import extract_layout


def _extract_one(payload: bytes | None, pre_text: str | None):
    """(kind, text, tokens, blocks, n_bytes). Pure function of the row.

    Error containment: a malformed payload yields a quarantine row
    (payload_kind='error', text=None) instead of failing the task — at
    10¹² rows a single bad page must never abort the job; quarantined
    urls stay visible for reprocessing (they appear in lineage counts
    but produce no text/tokens).
    """
    if payload is None or len(payload) == 0:
        # pre-extracted text passthrough (input_hint allows text w/o html)
        text = pre_text or ""
        return "text", text, [], [], 0
    try:
        if payload[:1] == b"{":
            text, tokens, blocks = extract_layout(payload)
            return "layout", text, tokens, blocks, len(payload)
        if payload[:5] == b"%PDF-":
            from .pdf import extract_pdf

            text, tokens, blocks = extract_pdf(payload)
            return "pdf", text, tokens, blocks, len(payload)
        text, tokens, blocks = extract_html(payload)
        return "html", text, tokens, blocks, len(payload)
    except Exception:
        return "error", None, [], [], len(payload)


@nogc_batches
def _extract_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        kinds, texts, toks, blks, nbytes, ntoks = [], [], [], [], [], []
        for payload, pre in zip(pdf["html"], pdf["text"]):
            kind, text, tokens, blocks, nb = _extract_one(payload, pre)
            kinds.append(kind)
            texts.append(text)
            toks.append(tokens)
            blks.append(blocks)
            nbytes.append(nb)
            ntoks.append(len(tokens))
        yield pd.DataFrame(
            {
                "url": pdf["url"],
                "warc_ts": pdf["warc_ts"],
                "lang": pdf["lang"],
                "payload_kind": kinds,
                "text": texts,
                "n_bytes": nbytes,
                "n_tokens": ntoks,
                "tokens": toks,
                "blocks": blks,
            }
        )


def extract_pages(web_pages: DataFrame) -> DataFrame:
    """web_pages (WEB_PAGES schema) → EXTRACT_RESULT frame, no shuffle."""
    return web_pages.mapInPandas(_extract_batches, schema=EXTRACT_RESULT)
