"""Deterministic specimen-label block fixture (interpretation test input).

The TPC-H document texts contain no dates/elevations/collectors, so the
interpretation stages are exercised over label-like blocks synthesized
JVM-side from orders/customer rows — fully deterministic and re-derivable
in DuckDB SQL, which makes the date cascade oracle-checkable, including
its best quirk: the roman-month map has no XII key
(block_identification.py:143), so December roman dates parse to NOTHING —
the oracle encodes exactly that.

Blocks per selected order (url = 'label://<o_orderkey>'):
  0: roman-numeral date   '<day>-<ROMAN>-<year>'   from o_orderdate
  1: elevation            'Alt <n>00''
  2: bare year            '<year>'
  3: collector            'Coll. <c_name>'
Deterministic subset: o_orderkey % 100 == 0 (LIMIT without ORDER BY is
nondeterministic — never used).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

ROMAN_OF_MONTH = [
    None, "I", "II", "III", "IV", "V", "VI", "VII", "VIII", "IX", "X",
    "XI", "XII",
]

# SQL CASE fragment shared with the DuckDB oracle
ROMAN_CASE_SQL = "CASE month(o_orderdate) " + " ".join(
    f"WHEN {m} THEN '{r}'" for m, r in enumerate(ROMAN_OF_MONTH) if r
) + " END"


def label_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .filter(F.col("o_orderkey") % 100 == 0)
    )
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    o = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        F.concat(F.lit("label://"), F.col("o_orderkey")).alias("url"),
        F.col("o_orderdate").alias("d"),
        F.col("o_orderkey").alias("k"),
        F.col("c_name").alias("cname"),
    )
    roman = F.expr(
        "CASE month(d) " + " ".join(
            f"WHEN {m} THEN '{r}'" for m, r in enumerate(ROMAN_OF_MONTH) if r
        ) + " END"
    )
    b0 = o.select(
        "url", F.lit(0).alias("block"), F.lit(0).alias("word_line"),
        F.concat_ws("-", F.dayofmonth("d").cast("string"), roman,
                    F.year("d").cast("string")).alias("block_text"),
    )
    b1 = o.select(
        "url", F.lit(1).alias("block"), F.lit(1).alias("word_line"),
        F.concat(F.lit("Alt "), ((F.col("k") % 40) * 100 + 100).cast("string"),
                 F.lit("'")).alias("block_text"),
    )
    b2 = o.select(
        "url", F.lit(2).alias("block"), F.lit(2).alias("word_line"),
        F.year("d").cast("string").alias("block_text"),
    )
    b3 = o.select(
        "url", F.lit(3).alias("block"), F.lit(3).alias("word_line"),
        F.concat(F.lit("Coll. "), F.col("cname")).alias("block_text"),
    )
    return b0.unionByName(b1).unionByName(b2).unionByName(b3)


def auto_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """label_blocks + cascade-shaped blocks for the §3.3 auto-match flow.

    The cascade's candidate generator never includes a block's LAST word
    (auto_id_compare.py:283-285 quirk), so the 2-word label blocks yield
    only their first word as a candidate.  These blocks carry a trailing
    filler word so the value itself becomes a candidate substring:
      4: 'Coll. <c_name> det.'             — collector hits when the same
         customer has orders in both ref and test splits
      5: 'in <customer nation> near camp'  — geo gazetteer hit (fuzz.ratio
         100 vs the nation name → inserts the gazetteer name)
    """
    orders = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .filter(F.col("o_orderkey") % 100 == 0)
    )
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    o = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select(
            F.concat(F.lit("label://"), F.col("o_orderkey")).alias("url"),
            F.col("c_name").alias("cname"),
            F.col("n_name").alias("nname"),
        )
    )
    b4 = o.select(
        "url", F.lit(4).alias("block"), F.lit(4).alias("word_line"),
        F.concat(F.lit("Coll. "), F.col("cname"), F.lit(" det.")).alias(
            "block_text"
        ),
    )
    b5 = o.select(
        "url", F.lit(5).alias("block"), F.lit(5).alias("word_line"),
        F.concat(F.lit("in "), F.col("nname"), F.lit(" near camp")).alias(
            "block_text"
        ),
    )
    return label_blocks(spark, sf_dir).unionByName(b4).unionByName(b5)


def label_blocks_with_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """label_blocks + locality (4) and taxonomy (5) blocks that hit the
    synthetic dims exactly (score 100) — exercises match_localities /
    match_taxonomy / similarity_fallback end-to-end."""
    from .dims import _COUNTIES, _GENERA, _SPECIES

    orders = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .filter(F.col("o_orderkey") % 100 == 0)
    )
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    o = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select(
            F.concat(F.lit("label://"), F.col("o_orderkey")).alias("url"),
            F.col("o_orderkey").alias("k"),
            F.initcap("r_name").alias("state"),
        )
    )
    county = F.element_at(
        F.array(*[F.lit(c) for c in _COUNTIES]), (F.col("k") % 10 + 1).cast("int")
    )
    sci = F.element_at(
        F.array(*[F.lit(f"{g} {s}") for g, s in zip(_GENERA, _SPECIES)]),
        (F.col("k") % 10 + 1).cast("int"),
    )
    b4 = o.select(
        "url", F.lit(4).alias("block"), F.lit(4).alias("word_line"),
        F.concat(county, F.lit(" Co., "), F.col("state")).alias("block_text"),
    )
    b5 = o.select(
        "url", F.lit(5).alias("block"), F.lit(5).alias("word_line"),
        sci.alias("block_text"),
    )
    return label_blocks(spark, sf_dir).unionByName(b4).unionByName(b5)
