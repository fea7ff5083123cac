"""The reference pipeline (CSTARS/nass-summary ``src/nass.sql`` +
``src/swap.sql``) re-expressed as Spark DataFrame builders.

Inputs are quickstats-shaped frames:

- ``quickstats``: the Quick Stats bulk-download table
  (quickstats.sql:35-57) — program, year, period, …, commodity,
  dataitem, domain, domaincategory, value, cv;
- ``usda_region``: state/county/ag-district crosswalk
  (quickstats.sql:26-32);
- ``usda_api``: the Quick Stats API table (quickstats.sql:5-24).

Every builder cites the view it re-expresses. The reference runs on
PostgreSQL with recursive CTEs and crosstab(); here each step is a
declarative DataFrame plan: hierarchy rollups replay the reference
recursion exactly — including PostgreSQL's generation-cohort
evaluation quirks — via tree_rollup_pg (operators/rollup.py; this
is what the reference's shipped CSV exports encode, and the yield
chain matches commodity_yield.csv 100%), pivots use conditional
aggregation or groupBy().pivot(), and small sides are broadcast.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from nass_summary_spark.functions.parsing import (
    commodity_name,
    location_code,
    safe_number,
    strip_measured_in,
)
from nass_summary_spark.operators.merge import total_and_sum_merge
from nass_summary_spark.operators.rollup import (
    leaf_rows,
    path_rollup,
    tree_rollup_pg,
)
from nass_summary_spark.sources.readers import trim_all_strings

#: Quick Stats CSV headers → canonical column names
#: (quickstats.sql:35-57; CSV layout as in the reference's
#: src/quickstats/*.csv exports).
QUICKSTATS_CSV_COLUMNS = {
    "Program": "program",
    "Year": "year",
    "Period": "period",
    "Week Ending": "weekending",
    "Geo Level": "geolevel",
    "State": "state",
    "State ANSI": "statefips",
    "Ag District": "agdistrict",
    "Ag District Code": "agdistrictcode",
    "County": "county",
    "County ANSI": "countycode",
    "Zip Code": "zipcode",
    "Region": "region",
    "watershed_code": "watershedcode",
    "Watershed": "watershed",
    "Commodity": "commodity",
    "Data Item": "dataitem",
    "Domain": "domain",
    "Domain Category": "domaincategory",
    "Value": "value",
    "CV (%)": "cv",
}


def load_quickstats_csv(spark: SparkSession, path: str) -> DataFrame:
    """Quick Stats bulk CSV → canonical quickstats frame with the
    reference's ingest cleaning: trim every column + SELECT DISTINCT
    (quickstats.sql:64-98, nass.mk:38)."""
    df = spark.read.option("header", True).csv(path)
    for old, new in QUICKSTATS_CSV_COLUMNS.items():
        if old in df.columns:
            df = df.withColumnRenamed(old, new)
    return trim_all_strings(df).dropDuplicates()


def _not_suppressed(col: str = "value") -> Column:
    # nass.sql:119 ``not value~'^\(.*\)'``
    return ~F.col(col).rlike(r"^\(.*\)")


# ---------------------------------------------------------------------------
# nass schema (src/nass.sql)
# ---------------------------------------------------------------------------

def location_table(usda_region: DataFrame) -> DataFrame:
    """nass.location (nass.sql:7-24): unified location/name catalog
    at county, ag-district, state grains."""
    county = usda_region.where(F.col("county_code") != "").select(
        F.concat("state_fips_code", "county_code").alias("location"),
        F.concat("county_name", F.lit(", "), "state_alpha").alias("name"),
    )
    asd = usda_region.where(F.col("asd_code") != "").select(
        F.concat("state_fips_code", F.lit("ag"), "asd_code").alias("location"),
        F.concat("asd_name", F.lit(", "), "state_alpha").alias("name"),
    )
    state = usda_region.select(
        F.col("state_fips_code").alias("location"),
        F.col("state_alpha").alias("name"),
    )
    return county.unionByName(asd).unionByName(state).distinct()


def county_adc(usda_region: DataFrame) -> DataFrame:
    """nass.county_adc (nass.sql:27-34): county fips → ag-district /
    state rollup codes."""
    return (
        usda_region.where(F.col("county_code") != "")
        .select(
            F.concat("state_fips_code", "county_code").alias("fips"),
            F.concat("state_fips_code", F.lit("ag"), "asd_code").alias("asd"),
            F.col("state_fips_code").alias("state_fips"),
        )
        .distinct()
    )


def land_rent(quickstats: DataFrame) -> DataFrame:
    """nass.land_rent (nass.sql:37-51): cash-rent survey rows with
    irrigation flags."""
    df = quickstats.where(F.col("dataitem").rlike("RENT, CASH,.*"))
    return df.select(
        location_code("statefips", "countycode", "agdistrictcode").alias("location"),
        F.col("year"),
        F.col("dataitem").rlike(" IRRIGATED").alias("irrigated"),
        F.col("dataitem").rlike("NON-IRRIGATED").alias("non_irrigated"),
        F.col("dataitem").rlike("PASTURE").alias("pasture"),
        safe_number("value").alias("value"),
        F.col("dataitem"),
    )


def explicit_yield(usda_api: DataFrame) -> DataFrame:
    """nass.explicit_yield (nass.sql:54-75): annual survey yields at
    county/ag-district/state with composed commodity names."""
    df = usda_api.where(
        (F.col("statisticcat_desc") == "YIELD")
        & F.col("agg_level_desc").isin("AGRICULTURAL DISTRICT", "COUNTY", "STATE")
        & (F.col("domain_desc") == "TOTAL")
        & (F.col("freq_desc") == "ANNUAL")
        & (F.col("reference_period_desc") == "YEAR")
        & ~F.col("value").rlike(r"\(.*\)")
    )
    loc = (
        F.when(
            F.col("agg_level_desc") == "AGRICULTURAL DISTRICT",
            F.concat("state_fips_code", F.lit("ag"), "asd_code"),
        )
        .when(
            F.col("agg_level_desc") == "COUNTY",
            F.concat("state_fips_code", "county_code"),
        )
        .when(F.col("agg_level_desc") == "STATE", F.col("state_fips_code"))
        .otherwise(F.lit("none"))
    )
    return df.select(
        F.col("year").cast("int").alias("year"),
        commodity_name("commodity_desc", "class_desc", "util_practice_desc").alias(
            "commodity"
        ),
        loc.alias("location"),
        F.col("prodn_practice_desc"),
        safe_number("value").alias("value"),
        F.col("unit_desc").alias("unit"),
    )


#: production-practice class lists (nass.sql:82-100)
_PRACTICE_NON_IRR = [
    "IN THE OPEN, NON-IRRIGATED",
    "IRRIGATED, NONE OF CROP",
    "NON-IRRIGATED",
    "NON-IRRIGATED, CONTINUOUS CROP",
    "NON-IRRIGATED, FOLLOWING SUMMER FALLOW",
]
_PRACTICE_IRR = ["IN THE OPEN, IRRIGATED", "IRRIGATED", "IRRIGATED, ENTIRE CROP"]
_PRACTICE_TOTAL = ["ALL PRODUCTION PRACTICES", "IN THE OPEN"]


def yield_by_type(explicit_yield_df: DataFrame) -> DataFrame:
    """nass.yield_by_type (nass.sql:77-106): per-practice-class
    average yields in one conditional aggregation (the reference
    FULL OUTER JOINs three subqueries; identical result, one
    shuffle)."""
    p = F.col("prodn_practice_desc")
    return (
        explicit_yield_df.where(
            p.isin(_PRACTICE_NON_IRR + _PRACTICE_IRR + _PRACTICE_TOTAL)
        )
        .groupBy("year", "commodity", "location", "unit")
        .agg(
            F.round(F.avg(F.when(p.isin(_PRACTICE_NON_IRR), F.col("value"))), 2).alias(
                "nonirrigated"
            ),
            F.round(F.avg(F.when(p.isin(_PRACTICE_IRR), F.col("value"))), 2).alias(
                "irrigated"
            ),
            F.round(F.avg(F.when(p.isin(_PRACTICE_TOTAL), F.col("value"))), 2).alias(
                "total"
            ),
        )
    )


def stats_location(quickstats: DataFrame) -> DataFrame:
    """nass.stats_location (nass.sql:108-128): census YEAR/TOTAL rows
    with location codes and the dataitem split into commodity / item
    paths."""
    df = quickstats.where(
        (F.col("period") == "YEAR")
        & (F.col("domain") == "TOTAL")
        & (F.col("program") == "CENSUS")
        & _not_suppressed()
    )
    di = F.split(F.col("dataitem"), " - ")
    return df.select(
        F.col("commodity"),
        location_code("statefips", "countycode", "agdistrictcode").alias("location"),
        F.col("year"),
        safe_number("value").alias("value"),
        F.split(F.element_at(di, 1), ", ").alias("commodity_a"),
        F.split(F.element_at(di, 2), ", ").alias("item_a"),
        F.element_at(di, 2).alias("item"),
        F.col("dataitem"),
    ).distinct()


def acres_location(stats: DataFrame) -> DataFrame:
    """nass.acres_location (nass.sql:131-136)."""
    return stats.where(
        F.element_at("item_a", 1).isin(
            "ACRES HARVESTED", "ACRES BEARING", "ACRES IN PRODUCTION"
        )
    ).select(
        "commodity",
        "location",
        "year",
        F.col("value").alias("acres"),
        F.array_remove(F.col("commodity_a"), F.col("commodity")).alias("subcommodity"),
        "item_a",
    )


def production_location(stats: DataFrame) -> DataFrame:
    """nass.production_location (nass.sql:138-144)."""
    return stats.where(F.element_at("item_a", 1) == "PRODUCTION").select(
        "commodity",
        "location",
        "year",
        F.col("value").alias("production"),
        strip_measured_in(F.element_at("item_a", 2)).alias("unit"),
        F.array_remove(F.col("commodity_a"), F.col("commodity")).alias("subcommodity"),
        F.slice("item_a", 3, 8).alias("subproduction"),
    )


def harvest_location(stats: DataFrame) -> DataFrame:
    """nass.harvest_location (nass.sql:146-155): max acres per key
    FULL OUTER JOIN production."""
    h = (
        acres_location(stats)
        .groupBy("commodity", "location", "year", "subcommodity")
        .agg(F.max("acres").alias("acres"))
    )
    p = production_location(stats).select(
        "commodity", "location", "year", "subcommodity", "production", "unit"
    )
    return p.join(
        h, on=["commodity", "location", "year", "subcommodity"], how="full_outer"
    ).select(
        "commodity", "location", "year", "subcommodity", "acres", "production", "unit"
    )


def subcommodity_explicitly_irrigated(harvest_loc: DataFrame) -> DataFrame:
    """nass.subcommodity_explicitly_irrigated (nass.sql:158-162)."""
    return (
        harvest_loc.where(F.array_contains("subcommodity", "IRRIGATED"))
        .select(
            "commodity",
            F.array_remove("subcommodity", "IRRIGATED").alias("subcommodity"),
        )
        .distinct()
    )


def commodity_explicitly_irrigated(harvest_loc: DataFrame) -> DataFrame:
    """nass.commodity_explicitly_irrigated (nass.sql:164-166): the
    distinct commodities that report any explicitly-IRRIGATED
    subcommodity path — the one-line view over
    :func:`subcommodity_explicitly_irrigated`."""
    return subcommodity_explicitly_irrigated(harvest_loc).select("commodity").distinct()


def harvest_location_irrigated(harvest_loc: DataFrame) -> DataFrame:
    """nass.harvest_location_irrigated (nass.sql:171-195): split the
    IRRIGATED marker out of the path and widen."""
    has_irr = F.array_contains("subcommodity", "IRRIGATED")
    i = harvest_loc.where(has_irr).select(
        "commodity",
        "location",
        "year",
        F.col("acres").alias("i_acres"),
        F.array_remove("subcommodity", "IRRIGATED").alias("subcommodity"),
    )
    n = harvest_loc.where(~has_irr).select(
        "commodity",
        "location",
        "year",
        F.col("acres").alias("n_acres"),
        F.col("production").alias("n_production"),
        F.col("unit").alias("n_unit"),
        "subcommodity",
    )
    s = subcommodity_explicitly_irrigated(harvest_loc).withColumn(
        "__expl", F.lit(True)
    )
    return (
        n.join(i, on=["commodity", "location", "year", "subcommodity"], how="full_outer")
        .join(broadcast(s), on=["commodity", "subcommodity"], how="left")
        .select(
            "commodity",
            "location",
            "year",
            "subcommodity",
            F.col("__expl").isNotNull().alias("explicitly_irrigated"),
            F.col("i_acres").alias("irrigated_acres"),
            F.coalesce("n_acres", "i_acres").alias("total_acres"),
            F.col("n_production").alias("total_production"),
            F.col("n_unit").alias("unit"),
        )
    )


def harvest_by_leaves(hli: DataFrame) -> DataFrame:
    """nass.harvest_by_leaves (nass.sql:198-230): sum leaf statistics
    into every subcommodity prefix.

    Replays the reference recursion exactly (tree_rollup_pg):
    sums cross units within a generation cohort — the window
    (nass.sql:221-222) partitions only by (commodity, location,
    year, parent-path) while ``unit`` is carried child→parent — and
    per-unit parent rows aggregate across cohorts in the closing
    GROUP BY. Validated 99.6%/99.9%/99.4% (acres/irrigated/
    production) against the reference's commodity_harvest.csv on
    the shipped 2012 ID slice (full-key merge; the residual is
    stripped input files, see tests/test_nass_pipeline.py)."""
    keys = ["commodity", "location", "year"]
    leaves = leaf_rows(hli, "subcommodity", keys=keys)
    return tree_rollup_pg(
        leaves,
        path_col="subcommodity",
        keys=keys,
        values=["irrigated_acres", "total_acres", "total_production"],
        agg="sum",
        carry=["unit"],
        max_depth=4,
    )


def harvest_total_and_sum(hli: DataFrame) -> DataFrame:
    """nass.harvest_total_and_sum (nass.sql:236-249): reported vs
    leaf-sum, reconciled by greatest."""
    derived = harvest_by_leaves(hli)
    return total_and_sum_merge(
        hli,
        derived,
        keys=["commodity", "location", "year", "subcommodity", "unit"],
        values=["irrigated_acres", "total_acres", "total_production"],
    )


def commodity_harvest(hts: DataFrame) -> DataFrame:
    """nass.commodity_harvest (nass.sql:251-257)."""
    return hts.select(
        F.array_join(
            F.concat(F.array("commodity"), "subcommodity"), ", "
        ).alias("commodity"),
        "location",
        "year",
        "reported",
        "irrigated_acres",
        "total_acres",
        "total_production",
        "unit",
    )


def commodity_harvest_list(ch: DataFrame) -> DataFrame:
    """nass.commodity_harvest_list (nass.sql:259-261)."""
    return ch.select("commodity").distinct()


# --- yields (nass.sql:264-383) ---------------------------------------------

def yield_location(stats: DataFrame) -> DataFrame:
    """nass.yield_location (nass.sql:264-270)."""
    return stats.where(F.element_at("item_a", 1) == "YIELD").select(
        "commodity",
        "location",
        "year",
        F.col("value").alias("yield"),
        strip_measured_in(F.element_at("item_a", 2)).alias("unit"),
        F.array_remove(F.col("commodity_a"), F.col("commodity")).alias("subcommodity"),
        F.slice("item_a", 3, 8).alias("subyield"),
    )


def yield_location_irrigated(yloc: DataFrame) -> DataFrame:
    """nass.yield_location_irrigated (nass.sql:273-318): four
    irrigation classes widened."""
    sub = F.col("subcommodity")

    def cls(marker: str):
        return yloc.where(
            F.array_contains(sub, "IRRIGATED") & F.array_contains(sub, marker)
        ).select(
            "commodity",
            "location",
            "year",
            F.col("yield"),
            F.array_remove(F.array_remove(sub, "IRRIGATED"), marker).alias(
                "subcommodity"
            ),
            "unit",
        )

    i = cls("ENTIRE CROP").withColumnRenamed("yield", "irrigated")
    p = cls("PART OF CROP").withColumnRenamed("yield", "partial")
    n = cls("NONE OF CROP").withColumnRenamed("yield", "none")
    u = (
        yloc.where(~F.array_contains(sub, "IRRIGATED"))
        .select("commodity", "location", "year", F.col("yield"), "subcommodity", "unit")
        .withColumnRenamed("yield", "unspecified")
    )
    keys = ["commodity", "location", "year", "subcommodity", "unit"]
    return (
        i.join(p, on=keys, how="full_outer")
        .join(n, on=keys, how="full_outer")
        .join(u, on=keys, how="full_outer")
        .select(*keys, "irrigated", "partial", "none", "unspecified")
    )


_YIELD_CLASSES = ["irrigated", "partial", "none", "unspecified"]


def yield_by_leaves(yli: DataFrame) -> DataFrame:
    """nass.yield_by_leaves (nass.sql:322-357): average-of-averages
    up the subcommodity tree, rounded like the reference's
    ::decimal(8,2). Replays the reference recursion EXACTLY
    (generation-cohort averaging, see tree_rollup_pg) — validated
    100% against the reference's own commodity_yield.csv export.
    Leaf detection joins on unit too (nass.sql:336 USING list)."""
    leaves = leaf_rows(
        yli, "subcommodity", keys=["commodity", "location", "year", "unit"]
    )
    rolled = tree_rollup_pg(
        leaves,
        path_col="subcommodity",
        keys=["commodity", "location", "year", "unit"],
        values=_YIELD_CLASSES,
        agg="avg",
        max_depth=4,
    )
    return rolled.select(
        "commodity",
        "location",
        "year",
        "subcommodity",
        "unit",
        *[F.round(F.col(c), 2).alias(c) for c in _YIELD_CLASSES],
    )


def yield_total_and_sum(yli: DataFrame) -> DataFrame:
    """nass.yield_total_and_sum (nass.sql:360-376): reported wins,
    derived fills gaps (coalesce, not greatest)."""
    t = yli
    s = yield_by_leaves(yli)
    keys = ["commodity", "location", "year", "subcommodity", "unit"]
    tt = t.select(*keys, *[F.col(c).alias(f"t_{c}") for c in _YIELD_CLASSES])
    ss = s.select(*keys, *[F.col(c).alias(f"s_{c}") for c in _YIELD_CLASSES])
    joined = tt.join(ss, on=keys, how="full_outer")
    return joined.select(
        *keys,
        *[F.col(f"t_{c}") for c in _YIELD_CLASSES],
        *[F.col(f"s_{c}") for c in _YIELD_CLASSES],
        *[
            F.coalesce(F.col(f"t_{c}"), F.col(f"s_{c}")).alias(c)
            for c in _YIELD_CLASSES
        ],
    )


def commodity_yield(yts: DataFrame) -> DataFrame:
    """nass.commodity_yield (nass.sql:378-383)."""
    return yts.select(
        F.array_join(F.concat(F.array("commodity"), "subcommodity"), ", ").alias(
            "commodity"
        ),
        "location",
        "year",
        "unit",
        "irrigated",
        "partial",
        "none",
        "unspecified",
    )


# --- prices (nass.sql:385-451) ----------------------------------------------

def price_location(quickstats: DataFrame) -> DataFrame:
    """nass.price_location (nass.sql:387-406)."""
    df = quickstats.where(
        (F.col("domain") == "TOTAL")
        & (F.col("program") == "SURVEY")
        & (F.col("period") == "YEAR")
        & F.col("dataitem").rlike(" - PRICE RECEIVED")
        & _not_suppressed()
    )
    di = F.split(F.col("dataitem"), " - ")
    commodity = F.col("commodity")
    return df.select(
        commodity,
        location_code("statefips", "countycode", "agdistrictcode").alias("location"),
        F.col("year"),
        safe_number("value").alias("price"),
        F.split(
            F.regexp_replace(F.element_at(di, 1), F.concat(commodity, F.lit("(, )?")), F.lit("")),
            ", ",
        ).alias("subcommodity"),
        F.lit("price").alias("item"),
        F.regexp_replace(F.element_at(di, 2), "^PRICE RECEIVED, MEASURED IN ", "").alias(
            "unit"
        ),
    ).distinct()


def price_by_leaves(ploc: DataFrame) -> DataFrame:
    """nass.price_by_leaves (nass.sql:409-436): same recursion shape
    as yield_by_leaves (unit in the leaf-detection USING list and in
    the window partition), replayed exactly via tree_rollup_pg."""
    leaves = leaf_rows(
        ploc, "subcommodity", keys=["commodity", "location", "year", "unit"]
    )
    rolled = tree_rollup_pg(
        leaves,
        path_col="subcommodity",
        keys=["commodity", "location", "year", "unit"],
        values=["price"],
        agg="avg",
        max_depth=4,
    )
    return rolled.withColumn("price", F.round(F.col("price"), 2))


def price_total_and_sum(ploc: DataFrame) -> DataFrame:
    """nass.price_total_and_sum (nass.sql:438-444)."""
    keys = ["commodity", "location", "year", "subcommodity", "unit"]
    t = ploc.select(*keys, F.col("price").alias("t_price"))
    s = price_by_leaves(ploc).select(*keys, F.col("price").alias("s_price"))
    return (
        t.join(s, on=keys, how="full_outer")
        .select(*keys, "t_price", "s_price", F.coalesce("t_price", "s_price").alias("price"))
    )


def commodity_price(pts: DataFrame) -> DataFrame:
    """nass.commodity_price (nass.sql:446-451)."""
    return pts.select(
        F.array_join(F.concat(F.array("commodity"), "subcommodity"), ", ").alias(
            "commodity"
        ),
        "location",
        "year",
        "unit",
        "price",
    )


def commodity_list(
    ch: DataFrame, cy: DataFrame, cp: DataFrame
) -> DataFrame:
    """nass.commodity_list (nass.sql:453-464): presence catalog."""
    h = ch.select("commodity").distinct().withColumn("__h", F.lit(True))
    y = cy.select("commodity").distinct().withColumn("__y", F.lit(True))
    p = cp.select("commodity").distinct().withColumn("__p", F.lit(True))
    return (
        h.join(y, on="commodity", how="full_outer")
        .join(p, on="commodity", how="full_outer")
        .select(
            "commodity",
            F.col("__h").isNotNull().alias("harvest"),
            F.col("__y").isNotNull().alias("yield"),
            F.col("__p").isNotNull().alias("price"),
        )
    )


def commodity_county_yield(
    ch: DataFrame, cy: DataFrame, adc: DataFrame
) -> DataFrame:
    """nass.commodity_county_yield (nass.sql:466-533): county yield,
    falling back ag-district → state → state partial-irrigation —
    every lookup side is an aggregate (dimension-sized, broadcast).

    (The reference view names the district code ``adc`` while
    county_adc calls it ``asd`` — we alias asd → adc here.)"""
    five_digit = F.col("location").rlike("^.....$")
    adc = adc.withColumnRenamed("asd", "adc")
    f = (
        ch.where(five_digit)
        .join(broadcast(adc), ch.location == adc.fips)
        .select("commodity", "fips", "adc", F.substring("fips", 1, 2).alias("state"))
        .distinct()
    )
    u = ch.where(F.col("unit").isNotNull()).select("commodity", "unit").distinct()
    c = (
        ch.where(
            F.col("total_acres").isNotNull()
            & F.col("total_production").isNotNull()
            & five_digit
        )
        .groupBy("commodity", F.col("location").alias("fips"), "unit")
        .agg(F.round(F.avg(F.col("total_production") / F.col("total_acres")), 2).alias("county_yield"))
    )
    a = (
        c.join(broadcast(adc), on="fips")
        .groupBy("commodity", "adc", "unit")
        .agg(F.round(F.avg("county_yield"), 2).alias("ad_yield"))
    )
    s = (
        c.groupBy("commodity", F.substring("fips", 1, 2).alias("state"), "unit")
        .agg(F.round(F.avg("county_yield"), 2).alias("st_yield"))
    )
    sy = (
        cy.groupBy(
            "commodity",
            F.regexp_replace("unit", " / ACRE", "").alias("unit"),
            F.col("location").alias("state"),
        )
        .agg(
            F.round(F.avg("irrigated"), 2).alias("st_irrigated"),
            F.round(F.avg("partial"), 2).alias("st_partial"),
            F.round(F.avg("none"), 2).alias("st_none"),
        )
    )
    al = (
        f.join(broadcast(u), on="commodity")
        .join(broadcast(c), on=["commodity", "fips", "unit"], how="left")
        .join(broadcast(a), on=["commodity", "adc", "unit"], how="left")
        .join(broadcast(s), on=["commodity", "state", "unit"], how="left")
    )
    return al.join(
        sy, on=["commodity", "state", "unit"], how="full_outer"
    ).select(
        "commodity",
        "unit",
        "fips",
        "adc",
        "state",
        F.coalesce("county_yield", "ad_yield", "st_yield", "st_partial").alias("yield"),
        "county_yield",
        "ad_yield",
        "st_yield",
        "st_irrigated",
        "st_partial",
        "st_none",
    )


def run_nass_pipeline(
    quickstats: DataFrame, usda_region: DataFrame, usda_api: DataFrame | None = None
) -> dict[str, DataFrame]:
    """Build the full nass-schema summary set (the reference's
    ``outs`` export list, nass.mk:43-45)."""
    stats = stats_location(quickstats)
    hloc = harvest_location(stats)
    hli = harvest_location_irrigated(hloc)
    hts = harvest_total_and_sum(hli)
    ch = commodity_harvest(hts)
    yloc = yield_location(stats)
    yli = yield_location_irrigated(yloc)
    yts = yield_total_and_sum(yli)
    cy = commodity_yield(yts)
    ploc = price_location(quickstats)
    pts = price_total_and_sum(ploc)
    cp = commodity_price(pts)
    adc = county_adc(usda_region)
    out = {
        "location": location_table(usda_region),
        "county_adc": adc,
        "land_rent": land_rent(quickstats),
        "stats_location": stats,
        "harvest_location": hloc,
        "harvest_location_irrigated": hli,
        "harvest_total_and_sum": hts,
        "commodity_harvest": ch,
        "commodity_yield": cy,
        "commodity_price": cp,
        "commodity_list": commodity_list(ch, cy, cp),
        "commodity_county_yield": commodity_county_yield(ch, cy, adc),
    }
    if usda_api is not None:
        ey = explicit_yield(usda_api)
        out["explicit_yield"] = ey
        out["yield_by_type"] = yield_by_type(ey)
    return out
