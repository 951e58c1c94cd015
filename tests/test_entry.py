"""Driver-contract smoke tests: entry(), queries()/oracle_sql() wiring."""

from __future__ import annotations

import __spark_entry__ as E


def test_entry_returns_rows(spark):
    df = E.entry(spark)
    assert df.count() > 0
    cols = set(df.columns)
    assert {"url", "block", "word_line", "block_text"} <= cols


def test_queries_oracles_aligned():
    qs = E.queries()
    oracles = E.oracle_sql()
    assert qs, "no queries registered"
    assert set(oracles) <= set(qs)


def test_extract_text_nonempty(spark):
    df = E.queries()["extract_text"](spark, "/root/testdata/sf0.001")
    rows = df.limit(5).collect()
    assert all(r.text and "\n" not in r.url for r in rows)
