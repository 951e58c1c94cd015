"""Query+oracle registrations for the eval harness and structured export.

Oracle notes:
- the golden/split/long-form tables are pure SQL re-derivations of the
  label fixture truth;
- ``eval_accuracy_exact`` encodes the December/X11 quirk in SQL: the auto
  pipeline misses every December roman date, so matched-date counts
  exclude month=12 — the oracle predicts the accuracy gap exactly;
- span offsets mirror csv_to_jsonl.py's ``find() > 0`` quirk with
  ``strpos > 1``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .queries import ORACLES, QUERIES, _LBL_CTE
from .eval import harness as H

_SIZES_SQL = ", ".join(f"('{s}', {int(s * 100)})" for s in H.SIZES)


def _register(name: str, fn, sql: str | None = None) -> None:
    QUERIES[name] = fn
    if sql is not None:
        ORACLES[name] = sql


_GOLDEN_CTE = f"""
{_LBL_CTE},
golden AS (
  SELECT url, k, cname AS collector,
         strftime(d, '%Y-%m-%d') AS verbatim_date,
         CAST((k % 40) * 100 + 100 AS VARCHAR) || chr(39) AS elevation,
         month(d) AS mon
  FROM lbl
),
glong AS (
  SELECT url, k, mon, 'collector' AS field, collector AS data FROM golden
  UNION ALL
  SELECT url, k, mon, 'verbatim_date', verbatim_date FROM golden
  UNION ALL
  SELECT url, k, mon, 'elevation', elevation FROM golden
),
sizes(reference_size, cut) AS (VALUES {_SIZES_SQL}),
sp AS (
  SELECT url, k, mon,
         CAST(reference_size AS VARCHAR) AS reference_size, cut,
         CASE WHEN (k / 100) % 100 < cut THEN 'ref' ELSE 'test' END
           AS ref_or_test
  FROM golden CROSS JOIN sizes
)
"""


def _q_golden_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    return H.golden_long(spark, sf_dir)


_register(
    "eval_golden_long",
    _q_golden_long,
    f"WITH {_GOLDEN_CTE} SELECT url, field, data FROM glong",
)


def _q_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    return H.splits(spark, sf_dir)


_register(
    "eval_splits",
    _q_splits,
    f"""
WITH {_GOLDEN_CTE}
SELECT url, reference_size, ref_or_test FROM sp
""",
)


def _label_auto_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .queries import _label_fields
    from .interpret.labels import label_blocks
    from .interpret.match import dedup_line_grain, match_collector

    base = _label_fields(spark, sf_dir)
    coll = dedup_line_grain(
        match_collector(label_blocks(spark, sf_dir), base)
    )
    from .interpret.match import merge_fields

    return merge_fields(base, coll)


def _q_accuracy_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    fields = _label_auto_fields(spark, sf_dir)
    return H.accuracy(spark, sf_dir, fields, fuzzy=False)


_register(
    "eval_accuracy_exact",
    _q_accuracy_exact,
    f"""
WITH {_GOLDEN_CTE},
test_g AS (
  SELECT g.url, g.field, g.data, g.mon, s.reference_size
  FROM glong g JOIN sp s
    ON s.url = g.url AND s.ref_or_test = 'test'
),
-- the auto pipeline reproduces golden exactly EXCEPT December roman
-- dates (X11 quirk): those blocks emit no Y-M-D date at all
matched AS (
  SELECT *, CASE WHEN field = 'verbatim_date' AND mon = 12
                 THEN NULL ELSE data END AS m
  FROM test_g
)
SELECT field, reference_size,
       round(COUNT(m) * 100.0 / COUNT(data), 2) AS pct_matched,
       COUNT(data) AS n_golden,
       COUNT(m) AS n_matched
FROM matched
GROUP BY field, reference_size
""",
)


def _q_accuracy_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    fields = _label_auto_fields(spark, sf_dir)
    return H.accuracy(spark, sf_dir, fields, fuzzy=True)


_register("eval_accuracy_trgm", _q_accuracy_fuzzy)  # pg_trgm — rows-only


# --- span export -------------------------------------------------------------


def _q_span_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .export import flatten_lines, span_records
    from .interpret.labels import label_blocks

    blocks = label_blocks(spark, sf_dir)
    lines = flatten_lines(blocks)
    fields = _label_auto_fields(spark, sf_dir)
    return span_records(lines, fields)


_register(
    "span_records",
    _q_span_records,
    f"""
WITH {_GOLDEN_CTE},
lines AS (
  -- blocks in reading order: roman-date, elevation 'Alt N', year, Coll.
  SELECT url, k, mon,
         CAST(day(d) AS VARCHAR) || '-' ||
         CASE mon WHEN 1 THEN 'I' WHEN 2 THEN 'II' WHEN 3 THEN 'III'
                  WHEN 4 THEN 'IV' WHEN 5 THEN 'V' WHEN 6 THEN 'VI'
                  WHEN 7 THEN 'VII' WHEN 8 THEN 'VIII' WHEN 9 THEN 'IX'
                  WHEN 10 THEN 'X' WHEN 11 THEN 'XI' WHEN 12 THEN 'XII' END
         || '-' || CAST(year(d) AS VARCHAR)
         || ' Alt ' || CAST((k % 40) * 100 + 100 AS VARCHAR) || chr(39)
         || ' ' || CAST(year(d) AS VARCHAR)
         || ' Coll. ' || cname AS line,
         d, cname
  FROM lbl JOIN golden USING (url, k)
),
f AS (
  -- verbatim values the auto pipeline emits per field family
  SELECT url, line, 'elevation' AS field,
         CAST((k % 40) * 100 + 100 AS VARCHAR) || chr(39) AS verbatim
  FROM lines
  UNION ALL
  SELECT url, line, 'verbatim_date',
         CASE WHEN mon = 12 THEN NULL
              ELSE CAST(day(d) AS VARCHAR) || '-' || strftime(d, '%b')
                   || '-' || CAST(year(d) AS VARCHAR) END
  FROM lines
  UNION ALL
  SELECT url, line, 'verbatim_date', CAST(year(d) AS VARCHAR) FROM lines
  UNION ALL
  SELECT url, line, 'collector', 'Coll. ' || cname FROM lines
)
SELECT url, field,
       CAST(strpos(line, verbatim) - 1 AS BIGINT) AS start,
       CAST(strpos(line, verbatim) - 1 + length(verbatim) AS BIGINT)
         AS "end",
       line AS content
FROM f
WHERE verbatim IS NOT NULL AND strpos(line, verbatim) > 1
""",
)


def _q_training_jsonl(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .export import training_jsonl

    return training_jsonl(_q_span_records(spark, sf_dir))


_register("training_jsonl", _q_training_jsonl)  # JSON shape — rows-only
