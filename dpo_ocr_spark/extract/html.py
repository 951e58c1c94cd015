"""HTML main-content extraction: tag-tree segmentation + boilerplate strip.

Pure-Python deterministic parser (stdlib ``html.parser``) — this is the
engine's stand-in for the reference's external OCR/decode call
(ML/google_vision/run_gvision_ocr.py:148-155): a pure function of the raw
bytes, executed inside Arrow batches (zero per-row Python at the Spark
level; the per-document loop lives inside one vectorized UDF invocation).

Algorithm (text-density + link-density heuristics, tag-tree segmentation —
north_star):
1. stream-parse the byte payload (UTF-8, errors=replace);
2. kill entire subtrees of non-content tags (script/style/nav/header/
   footer/aside/form/...);
3. segment remaining character data at block-level tag boundaries
   (p/div/h*/li/td/...);
4. score each segment: link_density = chars inside <a> / total chars;
5. keep segments with non-empty stripped text and link_density ≤ 1/3;
6. main text = kept segments joined with '\\n' (the reference's fulltext
   convention: '\\n'-separated lines, run_gvision_ocr.py:164-168).

Token records are derived from the kept segments: whitespace tokenization
with [start,end) char spans into the final text (the Document-AI text-anchor
convention, run_docai.py:84-93), confidence 1.0 (native text has no OCR
uncertainty), reading-order ids assigned with running counters exactly like
the reference's b/p/w walk (run_gvision_ocr.py:179-181, 187, 283).
"""

from __future__ import annotations

from html.parser import HTMLParser

# Subtrees that never contribute main content.
KILL_TAGS = frozenset(
    # NB: only tags that reliably carry an end tag — void elements (meta,
    # link, br, hr) never fire handle_endtag and would wedge the counter.
    """title script style nav footer header aside noscript template form
    iframe svg button select option label figure figcaption""".split()
)

# Tags that open/close a text segment.
BLOCK_TAGS = frozenset(
    """p div h1 h2 h3 h4 h5 h6 li ul ol dl dt dd td th tr table thead tbody
    pre blockquote article section main body br hr""".split()
)

MAX_LINK_DENSITY = 1.0 / 3.0


class _Segmenter(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.segments: list[tuple[str, int, int]] = []  # (text, chars, link_chars)
        self._parts: list[str] = []
        self._chars = 0
        self._link_chars = 0
        self._kill = 0
        self._a = 0

    def _flush(self) -> None:
        if self._parts:
            text = "".join(self._parts)
            self.segments.append((text, self._chars, self._link_chars))
        self._parts = []
        self._chars = 0
        self._link_chars = 0

    def handle_starttag(self, tag: str, attrs) -> None:  # noqa: ANN001
        if tag in KILL_TAGS:
            self._kill += 1
            return
        if self._kill:
            return
        if tag in BLOCK_TAGS:
            self._flush()
        if tag == "a":
            self._a += 1

    def handle_endtag(self, tag: str) -> None:
        if tag in KILL_TAGS:
            self._kill = max(0, self._kill - 1)
            return
        if self._kill:
            return
        if tag in BLOCK_TAGS:
            self._flush()
        if tag == "a":
            self._a = max(0, self._a - 1)

    def handle_data(self, data: str) -> None:
        if self._kill or not data:
            return
        self._parts.append(data)
        self._chars += len(data)
        if self._a:
            self._link_chars += len(data)

    def close(self) -> None:  # flush trailing segment
        super().close()
        self._flush()


def segment_html(payload: bytes) -> list[str]:
    """payload bytes → kept main-content segments (boilerplate stripped)."""
    from .charset import decode_html

    parser = _Segmenter()
    parser.feed(decode_html(payload))
    parser.close()
    kept: list[str] = []
    for text, chars, link_chars in parser.segments:
        stripped = text.strip()
        if not stripped:
            continue
        if chars > 0 and link_chars / chars > MAX_LINK_DENSITY:
            continue
        kept.append(stripped)
    return kept


def extract_html(payload: bytes) -> tuple[str, list[tuple], list[tuple]]:
    """bytes → (text, tokens, blocks).

    tokens: (page, block, para, word_line, word, word_text, confidence,
             bbox|None, start, end) — TOKEN schema order.
    blocks: (page, block, confidence, bbox|None) — BLOCK schema order.

    Hot path: the regex-lexer segmenter (html_fast, ~3× the stdlib
    parser, equivalence-tested on the corpus); the stdlib segmenter
    remains the reference implementation and the fallback for inputs the
    lexer refuses.
    """
    from .html_fast import segment_html_fast

    try:
        segments = segment_html_fast(payload)
    except Exception:
        segments = segment_html(payload)
    text = "\n".join(segments)
    tokens: list[tuple] = []
    tokens_append = tokens.append
    blocks: list[tuple] = []
    widx = 0
    seg_start = 0
    for b, seg in enumerate(segments):
        blocks.append((1, b, 1.0, None))
        # Offsets are arithmetic, not searched: ``text`` is exactly the
        # segments joined by '\n' and words within a segment are joined
        # by single ' ' (split(' ') round-trips), so item j+1 starts at
        # end(item j) + 1 and the first item starts at the segment start.
        offset = seg_start
        for w in seg.split(" "):
            if w == "":
                offset += 1
                continue
            end = offset + len(w)
            tokens_append((1, b, b, b, widx, w, 1.0, None, offset, end))
            widx += 1
            offset = end + 1
        seg_start += len(seg) + 1  # '\n' between segments
    return text, tokens, blocks
