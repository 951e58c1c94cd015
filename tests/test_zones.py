"""zonal_data unit tests — per-zone word_separator (reference
database/database.sql:229-251 concatenates with ocr_zones.word_separator,
not a hardcoded space).  The sf fixtures only exercise " " separators, so
the oracle gate alone can't catch a hardcoded join string.
"""

from __future__ import annotations


def _tokens(spark, words):
    # bbox layout: [x0, y0, x1, y1, x2, y2, x3, y3]; zonal_data reads
    # elements 1/2 (x0,y0) and 5/6 (x2,y2)
    rows = [
        ("u", i, w, [x0, 0, x1, 0, x1, 10, x0, 10])
        for i, (w, x0, x1) in enumerate(words)
    ]
    return spark.createDataFrame(
        rows, "url string, word int, word_text string, bbox array<int>"
    )


def _zone(spark, sep):
    return spark.createDataFrame(
        [("zc", "col", 1, sep, 0, 0, 1000, 0, 100)],
        "zone_id string, field_name string, field_order int,"
        "word_separator string, row_no int, x0 int, x1 int, y0 int, y1 int",
    )


def test_comma_separator_honored(spark):
    from dpo_ocr_spark.zones import zonal_data

    tokens = _tokens(spark, [("alpha", 0, 50), ("beta", 60, 110)])
    [row] = zonal_data(tokens, _zone(spark, ",")).collect()
    assert row.cell_text == "alpha,beta"
    assert row.word_separator == ","
    assert row.n_words == 2


def test_space_separator_unchanged(spark):
    from dpo_ocr_spark.zones import zonal_data

    tokens = _tokens(spark, [("alpha", 0, 50), ("beta", 60, 110)])
    [row] = zonal_data(tokens, _zone(spark, " ")).collect()
    assert row.cell_text == "alpha beta"
