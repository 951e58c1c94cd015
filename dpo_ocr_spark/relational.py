"""Relational operator coverage (SURVEY.md §2) over the TPC-H-ish tables.

Each function is a ``queries()`` entry exercising one operator family the
reference implements, re-expressed with idiomatic DataFrame ops so Catalyst
handles pushdown/join-selection/partial-agg.  DuckDB oracle twins live in
``queries.py``.

FP-safety: money aggregates are emitted as BIGINT ten-thousandths via
``floor(x * 10000 + 0.5)`` on plain doubles — multiply/add/floor are exactly
specified IEEE-754 ops, bit-identical in every engine and version, unlike a
``double → DECIMAL`` cast whose rounding proved build-dependent across DuckDB
versions (driver hash FAILs in rounds 1-2).  Averages are emitted as
round(sum_double/count, 4) computed from exact components.  Dimension sides of joins are explicitly broadcast —
nation/region/zone tables stay tiny at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

MONEY = "decimal(18,4)"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- S4/F1: predicate scan (pushdown) --------------------------------------
def q_filter_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confidence-threshold analog (block_identification.py:68 WHERE
    confidence > %s): predicate + projection pushed to the parquet scan."""
    return (
        _t(spark, sf_dir, "events")
        .filter((F.col("value") > 50.0) & (F.col("event_type") == "click"))
        .select("event_id", "user_id", "value")
    )


# --- J1 + A2: multi-way equi join + aggregation -----------------------------
def q_multiway_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """auto_id_compare.py:204-248 three-way join shape: fact⋈fact⋈dim with
    broadcast dim; revenue per nation, decimal-exact."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(
                F.floor(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000.0
                    + 0.5
                )
            ).alias("revenue_x10k"),
            F.count("*").alias("n_items"),
        )
    )


# --- J2 + A3: left outer join + counts --------------------------------------
def q_left_join_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ui/app.R:199 per-file LEFT JOIN mean/count shape: every customer,
    order count (0 for order-less customers)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


# --- J4: left-semi (IN subquery) --------------------------------------------
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """block_identification.py:68 document_id IN (...): orders having at
    least one high-quantity line."""
    orders = _t(spark, sf_dir, "orders")
    big = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") >= 49)
        .select("l_orderkey")
    )
    return orders.join(big, orders.o_orderkey == big.l_orderkey, "left_semi").select(
        "o_orderkey", "o_orderstatus"
    )


# --- J5: left-anti (NOT IN) --------------------------------------------------
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transcription_ento.sql:74 NOT IN complement: orders with no
    high-quantity line (the test-split = files-not-sampled-as-ref idiom)."""
    orders = _t(spark, sf_dir, "orders")
    big = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") >= 49)
        .select("l_orderkey")
    )
    return orders.join(big, orders.o_orderkey == big.l_orderkey, "left_anti").select(
        "o_orderkey", "o_orderstatus"
    )


# --- T1/T2: windowed argmax with tie-breaks ----------------------------------
def q_topk_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's ORDER BY score DESC LIMIT 1 / nlargest idiom
    (block_identification.py:342, auto_id_compare.py:299) as a window
    argmax — never a global sort: top customer by acctbal per nation,
    deterministic tie-break on custkey."""
    cust = _t(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return (
        cust.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("c_nationkey", "c_custkey", "c_acctbal")
    )


# --- A2: rounded mean (ui/app.R:199 ROUND(AVG(..)::numeric,4)) ---------------
def q_avg_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(
            F.sum(F.col("l_quantity").cast(MONEY)).cast("double") / F.count("*"), 4
        ).alias("avg_qty"),
        F.count("*").alias("n_rows"),
    )


# --- A3: distinct counts ------------------------------------------------------
def q_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ui/app.R:109 COUNT(DISTINCT filename) shape."""
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count("*").alias("n_orders"),
    )


# --- A4: distinct ordered string union ---------------------------------------
def q_string_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ui/app.R:109 string_agg(DISTINCT ocr_source, ','): sorted distinct
    concat is the deterministic form."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.concat_ws(",", F.sort_array(F.collect_set("event_type"))).alias(
            "event_types"
        )
    )


# --- A5: min/max envelope (bbox/crop idiom) ----------------------------------
def q_minmax_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """old/ocr_to_csv.py:56-69 crop-rect min/max + clamp (C13 greatest/least)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.greatest(F.min("l_quantity"), F.lit(2.0)).alias("qty_lo"),
        F.least(F.max("l_quantity"), F.lit(49.0)).alias("qty_hi"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
    )


# --- A6: histogram ------------------------------------------------------------
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ui/app.R:457-466 40-bin confidence histogram shape on events.value."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.withColumn("bucket", F.floor(F.col("value") / 25.0).cast("int"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
    )


# --- C14: CASE bucketing -------------------------------------------------------
def q_case_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """run_gvision_ocr.py:189-196 confidence color classes as CASE chain."""
    li = _t(spark, sf_dir, "lineitem")
    bucket = (
        F.when(F.col("l_discount") > 0.08, "high")
        .when(F.col("l_discount") > 0.04, "mid")
        .when(F.col("l_discount") > 0.02, "low")
        .otherwise("none")
    )
    return li.groupBy(bucket.alias("disc_class")).agg(
        F.count("*").alias("n"),
        F.sum(F.floor(F.col("l_extendedprice") * 10000.0 + 0.5)).alias("gross_x10k"),
    )


# --- U1/U3: union-distinct of leveled projections ------------------------------
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """block_identification.py:270-282 dictionary-level UNION: Spark union
    does NOT dedup, so distinct() is explicit (SQL UNION semantics)."""
    part = _t(spark, sf_dir, "part")
    a = part.select(F.col("p_brand").alias("name"), F.lit(1).alias("sortorder"))
    b = part.select(F.col("p_type").alias("name"), F.lit(2).alias("sortorder"))
    return a.unionByName(b).distinct()


# --- U2: unpivot/melt to long format -------------------------------------------
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """auto_id_compare.py:58-200 golden-field UNION → (data, field) long
    format, idiomatically via stack()."""
    part = _t(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.expr(
            "stack(2, 'brand', p_brand, 'type', p_type) AS (field, data)"
        ),
    ).filter(F.col("data").isNotNull())


# --- J8: range/containment join (zones) ----------------------------------------
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ocr_zones containment join (database/database.sql:200-251): value
    falls in a zone rectangle → broadcast nested loop over a tiny dim."""
    orders = _t(spark, sf_dir, "orders")
    region = _t(spark, sf_dir, "region")
    zones = region.select(
        F.col("r_regionkey").alias("zone_id"),
        (F.col("r_regionkey") * 60000.0).alias("lo"),
        ((F.col("r_regionkey") + 1) * 60000.0).alias("hi"),
    )
    return (
        orders.join(
            F.broadcast(zones),
            (orders.o_totalprice >= zones.lo) & (orders.o_totalprice < zones.hi),
        )
        .groupBy("zone_id")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.floor(F.col("o_totalprice") * 10000.0 + 0.5)).alias("total_x10k"),
        )
    )


# --- J6/C7/T1: fuzzy-score cross join + argmax ----------------------------------
def q_fuzzy_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """block_identification.py:244-265 locality match shape: every candidate
    × every dictionary name, score, keep top-1 with deterministic
    tie-breaks.  Built-in levenshtein keeps it JVM-side (the rapidfuzz
    pandas-UDF variant lives in interpret/; this is the codegen fast path)."""
    nation = _t(spark, sf_dir, "nation").select(F.col("n_name").alias("query"))
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    scored = supp.crossJoin(F.broadcast(nation)).withColumn(
        "dist", F.levenshtein(F.col("s_name"), F.col("query"))
    )
    w = W.partitionBy("query").orderBy(
        F.col("dist").asc(), F.length("s_name").asc(), F.col("s_suppkey").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("query", "s_suppkey", "s_name", "dist")
    )


# --- T5/T6: deterministic split + dedup -----------------------------------------
def q_split_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transcription_ento.sql:45-259 ref/test split — deterministic modulo
    split (seeded RANDOM() is engine-specific, so the split column is a
    pure key function, same policy as sampleBy at scale)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 10 < 2, "ref").otherwise("test").alias(
            "ref_or_test"
        ),
    )
