"""Arrow-native extraction stage (``mapInArrow`` fast path).

Same semantics as ``stage.extract_pages`` (byte-identical output rows),
different serialization strategy: the per-batch result is assembled
directly as pyarrow arrays — flat token/block field columns + list
offsets — instead of pandas object columns of per-document tuple lists.
That skips both pandas conversions (Arrow→pandas on the way in,
pandas→Arrow on the way out), which profiling showed to be ~25% of the
per-core round trip for the nested ``tokens``/``blocks`` columns:
object-dtype lists of tuples are re-walked element-by-element by the
pandas→Arrow converter, while ``ListArray.from_arrays`` over flat
columns is a single O(n) build.

The pandas stage stays as the reference implementation; equivalence is
pinned by tests/test_extract.py::test_arrow_stage_equivalence.

Scale notes (same as stage.py): narrow transformation, no shuffle, one
Python invocation per Arrow batch, per-row error quarantine inside
``_extract_one``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyarrow as pa

from pyspark.sql import DataFrame

from ..nogc import nogc_batches
from ..schemas import EXTRACT_RESULT
from .stage import _extract_one

_INT32 = pa.int32()
_INT64 = pa.int64()

# Byte-bound on the payload decoded per emitted batch. The Spark-level
# knob (arrow.maxRecordsPerBatch) counts ROWS, but page payloads span
# ~1 KB (link farms) to ~1 MB (article pages) — a row cap alone is
# either IPC-bound on small docs or memory-unsafe on big ones. We keep
# the row cap high (session.ARROW_MAX_RECORDS) and bound MEMORY here by
# slicing incoming batches (zero-copy) to ~16 MB of payload each, which
# caps the nested token/block output per batch regardless of doc size.
TARGET_PAYLOAD_BYTES = 16 << 20


def _byte_bounded(
    it: Iterator[pa.RecordBatch],
) -> Iterator[pa.RecordBatch]:
    for batch in it:
        payload_bytes = batch.column("html").nbytes
        if payload_bytes <= TARGET_PAYLOAD_BYTES or batch.num_rows < 2:
            yield batch
            continue
        n_slices = -(-payload_bytes // TARGET_PAYLOAD_BYTES)
        step = max(1, -(-batch.num_rows // n_slices))
        for lo in range(0, batch.num_rows, step):
            yield batch.slice(lo, step)

_TOKEN_TYPE = pa.struct(
    [
        pa.field("page", _INT32, False),
        pa.field("block", _INT32, False),
        pa.field("para", _INT32, False),
        pa.field("word_line", _INT32, False),
        pa.field("word", _INT32, False),
        pa.field("word_text", pa.string(), False),
        pa.field("confidence", pa.float64(), False),
        pa.field("bbox", pa.list_(_INT32)),
        pa.field("start", _INT64),
        pa.field("end", _INT64),
    ]
)

_BLOCK_TYPE = pa.struct(
    [
        pa.field("page", _INT32, False),
        pa.field("block", _INT32, False),
        pa.field("confidence", pa.float64()),
        pa.field("bbox", pa.list_(_INT32)),
    ]
)


def _nested_list_array(
    offsets: list[int], cols: list[list], struct_type: pa.StructType
) -> pa.ListArray:
    """Flat field columns + per-doc offsets → list<struct<...>> array."""
    n = offsets[-1]
    struct = pa.StructArray.from_arrays(
        [
            pa.array(c if n else [], type=f.type)
            for c, f in zip(cols, struct_type)
        ],
        fields=list(struct_type),
    )
    return pa.ListArray.from_arrays(pa.array(offsets, _INT32), struct)


@nogc_batches
def _extract_batches_arrow(
    it: Iterator[pa.RecordBatch],
) -> Iterator[pa.RecordBatch]:
    for batch in _byte_bounded(it):
        htmls = batch.column("html").to_pylist()
        pres = batch.column("text").to_pylist()
        kinds: list[str] = []
        texts: list[str | None] = []
        nbytes: list[int] = []
        ntoks: list[int] = []
        tok_off = [0]
        blk_off = [0]
        # per-doc zip(*tokens) + extend is the measured-fastest transpose
        # (83 ms/corpus vs 459 ms for one zip(*all_rows) — zip with 270k
        # iterator arguments round-robins them per output column — and
        # 101 ms for per-column list comprehensions)
        tok_cols: list[list] = [[] for _ in range(10)]
        blk_cols: list[list] = [[] for _ in range(4)]
        for payload, pre in zip(htmls, pres):
            kind, text, tokens, blocks, nb = _extract_one(payload, pre)
            kinds.append(kind)
            texts.append(text)
            nbytes.append(nb)
            ntoks.append(len(tokens))
            tok_off.append(tok_off[-1] + len(tokens))
            blk_off.append(blk_off[-1] + len(blocks))
            if tokens:
                for col, vals in zip(tok_cols, zip(*tokens)):
                    col.extend(vals)
            if blocks:
                for col, vals in zip(blk_cols, zip(*blocks)):
                    col.extend(vals)
        yield pa.RecordBatch.from_arrays(
            [
                batch.column("url"),
                batch.column("warc_ts"),
                batch.column("lang"),
                pa.array(kinds, pa.string()),
                pa.array(texts, pa.string()),
                pa.array(nbytes, _INT64),
                pa.array(ntoks, _INT32),
                _nested_list_array(tok_off, tok_cols, _TOKEN_TYPE),
                _nested_list_array(blk_off, blk_cols, _BLOCK_TYPE),
            ],
            names=[f.name for f in EXTRACT_RESULT.fields],
        )


def extract_pages_arrow(web_pages: DataFrame) -> DataFrame:
    """web_pages (WEB_PAGES schema) → EXTRACT_RESULT frame, no shuffle.

    Drop-in replacement for ``stage.extract_pages`` on the hot path.
    """
    return web_pages.mapInArrow(_extract_batches_arrow, schema=EXTRACT_RESULT)
