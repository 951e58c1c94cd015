"""Iceberg source/sink layer: dispatch, conf generation, option plumbing.

The Iceberg runtime jar is not in this container, so these tests pin the
jar-agnostic contract: catalog conf contents, table-ref vs path dispatch,
the exact DataSource V2 options each reader emits (via a recording fake),
and the parquet fallback end-to-end.
"""

from __future__ import annotations

import subprocess
import sys

import pytest

from dpo_ocr_spark.sources import (
    iceberg_available,
    iceberg_session_conf,
    incremental_pages,
    is_table_ref,
    read_web_pages,
    write_results,
)

SD = "/root/testdata/sf0.001"


class _FakeReader:
    """Records format/option/load exactly as DataFrameReader receives them."""

    def __init__(self):
        self.fmt = None
        self.options: dict[str, str] = {}
        self.loaded = None

    def format(self, f):
        self.fmt = f
        return self

    def option(self, k, v):
        self.options[k] = v
        return self

    def load(self, path):
        self.loaded = path
        return self


class _FakeSpark:
    def __init__(self):
        self.read = _FakeReader()


def test_session_conf_attaches_catalog():
    conf = iceberg_session_conf(catalog="web", warehouse="s3://wh/web")
    assert conf["spark.sql.extensions"].endswith("IcebergSparkSessionExtensions")
    assert conf["spark.sql.catalog.web"].endswith("SparkCatalog")
    assert conf["spark.sql.catalog.web.warehouse"] == "s3://wh/web"
    assert conf["spark.sql.catalog.web.type"] == "hadoop"


def test_table_ref_dispatch():
    assert is_table_ref("web.crawl.pages")
    assert is_table_ref("cat.db.tbl")
    assert not is_table_ref("/data/pages")
    assert not is_table_ref("s3://bucket/pages")
    assert not is_table_ref("pages.parquet")
    assert not is_table_ref("pages")


def test_read_options_snapshot_and_asof():
    fake = _FakeSpark()
    read_web_pages(fake, "web.crawl.pages", snapshot_id=42)
    assert fake.read.fmt == "iceberg"
    assert fake.read.options == {"snapshot-id": "42"}
    assert fake.read.loaded == "web.crawl.pages"

    fake = _FakeSpark()
    read_web_pages(fake, "web.crawl.pages", as_of_ts="2026-01-01T00:00:00")
    assert fake.read.options == {"as-of-timestamp": "2026-01-01T00:00:00"}


def test_incremental_scan_options():
    fake = _FakeSpark()
    incremental_pages(fake, "web.crawl.pages", 100, 200)
    assert fake.read.options == {
        "start-snapshot-id": "100",
        "end-snapshot-id": "200",
    }
    fake = _FakeSpark()
    incremental_pages(fake, "web.crawl.pages", 100)
    assert fake.read.options == {"start-snapshot-id": "100"}


def test_time_travel_over_parquet_is_an_error():
    with pytest.raises(ValueError):
        read_web_pages(_FakeSpark(), "/data/pages", snapshot_id=1)
    with pytest.raises(ValueError):
        incremental_pages(_FakeSpark(), "/data/pages", 1)


def test_parquet_fallback_roundtrip(spark, tmp_path):
    from dpo_ocr_spark.corpus import build_web_pages

    src = str(tmp_path / "pages")
    build_web_pages(spark, SD, partitions=2).write.parquet(src)
    df = read_web_pages(spark, src)
    assert df.count() == 500
    out = str(tmp_path / "out")
    write_results(df.select("url"), out)
    assert spark.read.parquet(out).count() == 500
    # sandbox has no Iceberg runtime; the probe must say so, not raise
    assert iceberg_available(spark) is False


def test_job_prints_submit_conf():
    r = subprocess.run(
        [sys.executable, "/root/repo/jobs/run_extract.py", "--print-iceberg-conf"],
        capture_output=True,
        text=True,
        env={"PYTHONPATH": "/root/repo", "PATH": "/usr/bin:/bin"},
        timeout=60,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "--conf spark.sql.extensions=" in r.stdout
    assert "spark.sql.catalog.web.warehouse=" in r.stdout


def test_write_results_iceberg_branch():
    from dpo_ocr_spark.sources import write_results

    class _Writer:
        def __init__(self):
            self.opts, self.action = {}, None

        def option(self, k, v):
            self.opts[k] = v
            return self

        def append(self):
            self.action = "append"

        def createOrReplace(self):
            self.action = "replace"

    class _DF:
        def __init__(self):
            self.w = _Writer()

        def writeTo(self, t):
            self.t = t
            return self.w

    df = _DF()
    write_results(df, "web.crawl.out")
    assert df.t == "web.crawl.out"
    assert df.w.opts == {"fanout-enabled": "true"}
    assert df.w.action == "append"
    df = _DF()
    write_results(df, "web.crawl.out", mode="overwrite")
    assert df.w.action == "replace"


def test_latest_snapshot_id_sql():
    from dpo_ocr_spark.sources import latest_snapshot_id

    class _Row:
        snapshot_id = 777

    class _Result:
        def __init__(self, rows):
            self._rows = rows

        def collect(self):
            return self._rows

    class _Spark:
        def sql(self, q):
            self.q = q
            return _Result([_Row()])

    sp = _Spark()
    assert latest_snapshot_id(sp, "web.crawl.pages") == 777
    assert "web.crawl.pages.snapshots" in sp.q
    assert "ORDER BY committed_at DESC" in sp.q

    class _Empty(_Spark):
        def sql(self, q):
            return _Result([])

    assert latest_snapshot_id(_Empty(), "web.crawl.pages") is None


import glob as _glob
import os as _os

_ICEBERG_JARS = _glob.glob(
    _os.path.join(_os.environ.get("SPARK_HOME", "/nonexistent"), "jars",
                  "iceberg-spark-runtime*.jar")
) + _glob.glob("/root/jars/iceberg-spark-runtime*.jar")


@pytest.mark.skipif(
    not _ICEBERG_JARS,
    reason="iceberg-spark-runtime jar not vendored in this container — "
    "MERGE INTO remains a paper path: merge_fields reproduces the "
    "ON CONFLICT column semantics at DataFrame level "
    "(tests/test_interpret equivalents); this test activates the real "
    "round-trip the moment a jar lands in $SPARK_HOME/jars or /root/jars",
)
def test_iceberg_merge_into_roundtrip(tmp_path):
    """Real MERGE INTO upsert (reference block_identification.py:49 ON
    CONFLICT DO UPDATE): create table, merge an update batch, expect the
    same rows merge_fields computes for identical inputs."""
    from pyspark.sql import SparkSession

    from dpo_ocr_spark.sources.iceberg import iceberg_session_conf

    b = SparkSession.builder.master("local[2]").appName("iceberg-merge")
    for k, v in iceberg_session_conf(
        catalog="t", warehouse=str(tmp_path / "wh")
    ).items():
        b = b.config(k, v)
    b = b.config("spark.jars", ",".join(_ICEBERG_JARS))
    spark = b.getOrCreate()
    try:
        spark.sql(
            "CREATE TABLE t.db.fields (url STRING, block_id INT, "
            "data_type STRING, interpreted_value STRING, "
            "verbatim_value STRING) USING iceberg"
        )
        spark.sql(
            "INSERT INTO t.db.fields VALUES "
            "('u1', 0, 'collector', 'old', 'old-v'), "
            "('u2', 0, 'elevation', 'keep', 'keep-v')"
        )
        spark.createDataFrame(
            [("u1", 0, "collector", "new", "new-v"),
             ("u3", 1, "collector", "ins", "ins-v")],
            "url string, block_id int, data_type string, "
            "interpreted_value string, verbatim_value string",
        ).createOrReplaceTempView("updates")
        spark.sql(
            "MERGE INTO t.db.fields f USING updates u "
            "ON f.url = u.url AND f.block_id = u.block_id "
            "AND f.data_type = u.data_type "
            "WHEN MATCHED THEN UPDATE SET "
            "f.interpreted_value = u.interpreted_value, "
            "f.verbatim_value = u.verbatim_value "
            "WHEN NOT MATCHED THEN INSERT *"
        )
        got = {
            (r.url, r.block_id, r.data_type): (r.interpreted_value, r.verbatim_value)
            for r in spark.table("t.db.fields").collect()
        }
        assert got == {
            ("u1", 0, "collector"): ("new", "new-v"),
            ("u2", 0, "elevation"): ("keep", "keep-v"),
            ("u3", 1, "collector"): ("ins", "ins-v"),
        }
    finally:
        spark.stop()
