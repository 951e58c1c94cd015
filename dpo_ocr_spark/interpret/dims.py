"""Deterministic broadcast dimension tables (gazetteer / taxonomy / zones).

The reference loads GADM gazetteers and an ocr_taxonomy table from
databases (block_identification.py:206-233, 270-282).  No external data is
allowed here, so the dimensions are synthesized deterministically from the
driver's TPC-H tables plus fixed word lists — same shapes as FIXTURES.md
§6-§8, fully reproducible on any engine.

The leveled-union derivation of the taxonomy dictionary reproduces U1
(4 projections with sortorder 1-4, UNION-dedup, ORDER BY sciname,
sortorder — block_identification.py:270-282).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

_GENERA = ["Apis", "Bombus", "Vespa", "Formica", "Lasius",
           "Camponotus", "Papilio", "Danaus", "Pieris", "Vanessa"]
_SPECIES = ["mellifera", "terrestris", "crabro", "rufa", "niger",
            "ligniperda", "machaon", "plexippus", "rapae", "atalanta"]
_FAMILIES = ["Apidae", "Vespidae", "Formicidae", "Papilionidae",
             "Nymphalidae"]

_COUNTIES = ["Clark", "Marion", "Lincoln", "Wayne", "Union",
             "Grant", "Logan", "Perry", "Adams", "Custer"]


def gazetteer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Locality dimension: country / state / sub-state / county name
    variants, mirroring the 4 GADM queries + abbreviation joins
    (block_identification.py:206-233).  Countries from nation.parquet;
    states/counties synthesized as nation-region composites."""
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    n = nation.join(region, nation.n_regionkey == region.r_regionkey).select(
        F.initcap("n_name").alias("country"),
        F.initcap("r_name").alias("state"),
        F.col("n_nationkey").alias("k"),
    )
    countries = n.select(
        F.col("country").alias("name"),
        F.lit("locality:country").alias("name_type"),
        F.concat(F.lit("g0:"), F.col("k")).alias("uid"),
    )
    states = n.select(
        F.concat_ws(", ", "state", "country").alias("name"),
        F.lit("locality:state").alias("name_type"),
        F.concat(F.lit("g1:"), F.col("k")).alias("uid"),
    )
    county = spark.createDataFrame(
        [(c,) for c in _COUNTIES], ["county"]
    )
    counties = n.crossJoin(F.broadcast(county)).select(
        F.concat_ws(", ", F.concat(F.col("county"), F.lit(" Co.")), "state")
        .alias("name"),
        F.lit("locality:county").alias("name_type"),
        F.concat(F.lit("g2:"), F.col("k"), F.lit(":"), F.col("county")).alias("uid"),
    )
    sub_states = n.crossJoin(F.broadcast(county)).select(
        F.concat_ws(", ", "county", "state", "country").alias("name"),
        F.lit("locality:sub-state").alias("name_type"),
        F.concat(F.lit("gs:"), F.col("k"), F.lit(":"), F.col("county")).alias("uid"),
    )
    # match order of the reference's localities_match frame: counties,
    # states, sub-states, countries (block_identification.py:247-248)
    return (
        counties.unionByName(states)
        .unionByName(sub_states)
        .unionByName(countries)
    )


def taxonomy(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    """Leveled taxonomy dictionary (sciname, sortorder, name_type) —
    the U1 union of species / species_abbr / genus / family projections
    with UNION-dedup and ORDER BY sciname, sortorder."""
    rows = []
    for i, (g, s) in enumerate(zip(_GENERA, _SPECIES)):
        fam = _FAMILIES[i % len(_FAMILIES)]
        rows.append((g, s, fam))
    base = spark.createDataFrame(rows, ["genus", "species", "family"])
    levels = (
        base.select(
            F.concat_ws(" ", "genus", "species").alias("sciname"),
            F.lit(1).alias("sortorder"),
            F.lit("taxonomy:species").alias("name_type"),
        )
        .unionByName(
            base.select(
                F.col("species").alias("sciname"),
                F.lit(2).alias("sortorder"),
                F.lit("taxonomy:species_abbr").alias("name_type"),
            )
        )
        .unionByName(
            base.select(
                F.col("genus").alias("sciname"),
                F.lit(3).alias("sortorder"),
                F.lit("taxonomy:genus").alias("name_type"),
            )
        )
        .unionByName(
            base.select(
                F.col("family").alias("sciname"),
                F.lit(4).alias("sortorder"),
                F.lit("taxonomy:family").alias("name_type"),
            )
        )
        .distinct()
        .orderBy("sciname", "sortorder")
    )
    return levels


COLLECTOR_STRINGS = ("Coll.", "Collector", "leg.", "coll by")
