"""The reference's R analysis layer (``src/budget.r``) re-expressed
as DataFrame builders, plus the California Ag-Commissioner ingest
(``src/ca-agcomm.sql`` / ``src/ca-agcomm.mk``).

budget.r pulls AREA HARVESTED from the Quick Stats API per
state/year, keeps only the total + ', IRRIGATED' breakdowns, joins
the irrigated acres back as a column, prefers CENSUS over SURVEY
rows, and (for census years) compares census vs survey acres.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nass_summary_spark.functions.parsing import safe_number
from nass_summary_spark.sources.readers import trim_all_strings

#: irrigation-breakdown variants dropped by budget.r:37-46 (only the
#: blended total and the plain ', IRRIGATED' rows are kept).
_DROPPED_VARIANTS = [
    ", NON-IRRIGATED",
    ", IRRIGATED, ENTIRE CROP",
    ", IRRIGATED, NONE OF CROP",
    ", PART OF CROP, IRRIGATED PORTION",
]


def harvest_area(usda_api: DataFrame) -> DataFrame:
    """budget.r getArea (budget.r:10-93): harvested acres per
    (source, year, crop, location) with irrigated acres joined back
    as a column and CENSUS preferred over SURVEY.

    CENSUS-preferred dedup: budget.r:80-88 splits per (crop,
    location) and takes the first row; source_desc sorts
    CENSUS < SURVEY so a min-rank window does the same."""
    joined = _harvest_area_base(usda_api)
    w = Window.partitionBy("crops", "location", "year").orderBy("source_desc")
    return (
        joined.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") == 1)
        .drop("__rk")
    )


def census_survey_comparison(usda_api: DataFrame) -> DataFrame:
    """budget.r get_comparision (budget.r:119-204): for
    (crop, location) reported by BOTH census and survey, the percent
    difference in total and irrigated acres."""
    area = _harvest_area_base(usda_api).where(F.col("total").isNotNull())
    census = area.where(F.col("source_desc") == "CENSUS").select(
        "crops", "location", "year",
        F.col("total").alias("c_total"), F.col("irrigated").alias("c_irr"),
    )
    survey = area.where(F.col("source_desc") == "SURVEY").select(
        "crops", "location", "year",
        F.col("total").alias("s_total"), F.col("irrigated").alias("s_irr"),
    )
    both = census.join(survey, on=["crops", "location", "year"])
    return both.select(
        "crops",
        "location",
        "year",
        F.round(F.abs(F.col("c_total") - F.col("s_total")) / F.col("c_total"), 4).alias(
            "percent_diff"
        ),
        F.round(F.abs(F.col("c_irr") - F.col("s_irr")) / F.col("c_irr"), 4).alias(
            "percent_irrigated_diff"
        ),
    )


def _harvest_area_base(usda_api: DataFrame) -> DataFrame:
    """Shared extraction: budget.r keeps the blended total and the
    ', IRRIGATED' breakdown, dropping the finer irrigation variants
    (budget.r:37-46). In the API data model that distinction lives in
    prodn_practice_desc, so "total" = ALL PRODUCTION PRACTICES and
    "irrigated" = IRRIGATED; the finer variants are the other
    practice values, excluded by the isin. budget.r runs one year at
    a time, so the irrigated re-join carries year as a key here
    (multi-year generalization)."""
    from nass_summary_spark.functions.parsing import commodity_name

    df = usda_api.where(
        (F.col("statisticcat_desc") == "AREA HARVESTED")
        & (F.col("unit_desc") == "ACRES")
        & (F.col("domain_desc") == "TOTAL")
        & (F.col("reference_period_desc") == "YEAR")
        & F.col("agg_level_desc").isin("AGRICULTURAL DISTRICT", "COUNTY", "STATE")
        & (F.col("freq_desc") == "ANNUAL")
        & F.col("prodn_practice_desc").isin("ALL PRODUCTION PRACTICES", "IRRIGATED")
    )
    pad2 = lambda c: F.lpad(F.col(c).cast("string"), 2, "0")  # noqa: E731
    pad3 = lambda c: F.lpad(F.col(c).cast("string"), 3, "0")  # noqa: E731
    base = (
        df.where(F.col("county_code").cast("string") != "998")
        .select(
            F.col("source_desc"),
            F.col("year").cast("int").alias("year"),
            commodity_name(
                "commodity_desc", "class_desc", "util_practice_desc"
            ).alias("crops"),
            (F.col("prodn_practice_desc") == "IRRIGATED").alias("is_irr"),
            F.when(F.col("agg_level_desc") == "STATE", pad2("state_fips_code"))
            .when(
                F.col("agg_level_desc") == "COUNTY",
                F.concat(pad2("state_fips_code"), pad3("county_code")),
            )
            .otherwise(
                F.concat(
                    pad2("state_fips_code"), F.lit("ag"),
                    F.lpad(F.col("asd_code").cast("string"), 2, "0"),
                )
            )
            .alias("location"),
            safe_number("value").alias("acres"),
        )
    )
    total = base.where(~F.col("is_irr")).select(
        "source_desc", "year", "crops", "location", F.col("acres").alias("total")
    )
    irrigated = base.where(F.col("is_irr")).select(
        "source_desc", "year", "crops", "location", F.col("acres").alias("irrigated")
    )
    return total.join(
        irrigated, on=["source_desc", "year", "crops", "location"], how="left"
    )


#: quickstats.agcomm columns (ca-agcomm.sql:9-21).
AGCOMM_SCHEMA = (
    "year INT, commodity_code INT, crop STRING, county_code STRING, "
    "county STRING, harvested_acres DOUBLE, yield DOUBLE, production DOUBLE, "
    "price DOUBLE, unit STRING, value DOUBLE"
)


def load_agcomm_csv(spark: SparkSession, path: str) -> DataFrame:
    """California Ag-Commissioner CSV ingest (ca-agcomm.mk:22-24):
    skip repeated 'Year' header lines, trim cell padding (the
    reference pipes through sed), parse numerics."""
    df = (
        spark.read.option("header", False)
        .schema(AGCOMM_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("ignoreLeadingWhiteSpace", True)
        .option("ignoreTrailingWhiteSpace", True)
        .csv(path)
    )
    return trim_all_strings(df.where(F.col("year").isNotNull()))
