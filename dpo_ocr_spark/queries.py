"""Query registry: every implemented operator gets a ``QUERIES`` entry and,
when SQL-expressible, an ``ORACLES`` DuckDB-SQL twin (driver contract).

Oracle design rules (FP-safe hashing):
- integer-exact outputs wherever possible (counts, ``conf_x100`` sums);
- money aggregates cast to DECIMAL(18,4) *before* SUM in both engines;
- ratios computed from exact components then ``round(x, 4)`` in both.

The synthetic-corpus oracles re-derive the engine's expected output from
``documents.text`` with plain SQL — they share the determinism contract in
``corpus.py`` (url formula, ≤3-way paragraph split, conf formula).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, sql: str | None = None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn

    return deco


# ---------------------------------------------------------------------------
# Shared oracle SQL fragments (determinism contract with corpus.py)
# ---------------------------------------------------------------------------

# url formula — corpus.page_url
_URL_SQL = (
    "'https://host-' || CASE WHEN doc_id % 10 = 0 THEN 'hot' "
    "ELSE CAST(doc_id % 20 AS VARCHAR) END || '.example.org/doc/' || "
    "lpad(CAST(doc_id AS VARCHAR), 6, '0')"
)

# expected extracted text — corpus.expected_text (≤3-way paragraph split)
_ETEXT_CTE = f"""
docs AS (
  SELECT doc_id, {_URL_SQL} AS url, text, str_split(text, ' ') AS ws
  FROM documents
),
paras AS (
  SELECT doc_id, url,
    CASE WHEN len(ws) < 3 THEN text
         ELSE array_to_string(ws[1:CAST(ceil(len(ws)/3.0) AS INT)], ' ')
              || chr(10) ||
              array_to_string(ws[CAST(ceil(len(ws)/3.0) AS INT)+1:
                                 CAST(ceil(2*len(ws)/3.0) AS INT)], ' ')
              || chr(10) ||
              array_to_string(ws[CAST(ceil(2*len(ws)/3.0) AS INT)+1:len(ws)], ' ')
    END AS etext
  FROM docs
)
"""

# token stream — corpus.render_* + extract.*: block = word_line = line idx,
# global word index widx, conf_x100 per corpus.token_confidence (layout docs)
# or 100 (native HTML text).
_TOKENS_CTE = f"""
{_ETEXT_CTE},
lines AS (
  SELECT doc_id, url,
         unnest(str_split(etext, chr(10))) AS line_text,
         generate_subscripts(str_split(etext, chr(10)), 1) - 1 AS line_idx
  FROM paras
),
words AS (
  SELECT doc_id, url, line_idx,
         unnest(str_split(line_text, ' ')) AS word,
         generate_subscripts(str_split(line_text, ' '), 1) - 1 AS pos
  FROM lines
),
tok AS (
  SELECT doc_id, url,
         CAST(line_idx AS INT) AS block,
         CAST(line_idx AS INT) AS word_line,
         word,
         CAST(row_number() OVER (PARTITION BY doc_id ORDER BY line_idx, pos) - 1
              AS INT) AS widx,
         CAST(CASE WHEN doc_id % 5 = 4
              THEN (length(word)*37 + (row_number() OVER
                    (PARTITION BY doc_id ORDER BY line_idx, pos) - 1)*13) % 101
              ELSE 100 END AS INT) AS conf_x100
  FROM words
)
"""


def _tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .assemble import explode_tokens
    from .pipeline import run_extraction

    return explode_tokens(run_extraction(spark, sf_dir))


# ---------------------------------------------------------------------------
# Extraction pipeline (flagship; SURVEY.md §3.1, operators S1-S3, C15-C16)
# ---------------------------------------------------------------------------


@register(
    "extract_text",
    f"""
WITH {_ETEXT_CTE}
SELECT url, etext AS text FROM paras
""",
)
def q_extract_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end byte-identity: decode payloads (HTML boilerplate strip /
    layout parse), return per-url extracted text. Oracle re-derives the
    expected text directly from documents.text."""
    from .pipeline import run_extraction

    return run_extraction(spark, sf_dir).select("url", "text")


@register(
    "block_assembly",
    f"""
WITH {_TOKENS_CTE}
SELECT url, block, word_line,
       string_agg(word, ' ' ORDER BY widx) AS block_text,
       CAST(SUM(conf_x100) AS BIGINT) AS conf_sum_x100,
       COUNT(*) AS n_words
FROM tok
WHERE conf_x100 / 100.0 > 0.70
GROUP BY url, block, word_line
""",
)
def q_block_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A2/F1/T3: confidence-gated ordered assembly at line grain
    (reference block_identification.py:68, incl. its group-by quirk)."""
    from .assemble import _ordered_concat

    tokens = _tokens(spark, sf_dir)
    return (
        tokens.filter(F.col("confidence") > F.lit(0.70))
        .withColumn("conf_x100", F.round(F.col("confidence") * 100).cast("long"))
        .groupBy("url", "block", "word_line")
        .agg(
            _ordered_concat(["word"]).alias("block_text"),
            F.sum("conf_x100").alias("conf_sum_x100"),
            F.count("*").alias("n_words"),
        )
    )


@register(
    "reading_order",
    f"""
WITH {_TOKENS_CTE}
SELECT url, block,
       string_agg(word, ' ' ORDER BY word_line, widx) AS block_text,
       CAST(SUM(conf_x100) AS BIGINT) AS conf_sum_x100,
       COUNT(*) AS n_words
FROM tok
WHERE conf_x100 / 100.0 >= 0.85
GROUP BY url, block
""",
)
def q_reading_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-confidence full reading-order assembly per block
    (auto_id_compare.py:204-248, ORDER BY page, block, word_line, word)."""
    from .assemble import _ordered_concat

    tokens = _tokens(spark, sf_dir)
    return (
        tokens.filter(F.col("confidence") >= F.lit(0.85))
        .withColumn("conf_x100", F.round(F.col("confidence") * 100).cast("long"))
        .groupBy("url", "block")
        .agg(
            _ordered_concat(["page", "word_line", "word"]).alias("block_text"),
            F.sum("conf_x100").alias("conf_sum_x100"),
            F.count("*").alias("n_words"),
        )
    )
