"""swap-schema tests (swap.sql parity) with synthetic inputs small
enough to hand-compute."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from nass_summary_spark.plans import swap

API_COLS = [
    "year", "commodity_desc", "statisticcat_desc", "county_code",
    "source_desc", "unit_desc", "prodn_practice_desc", "freq_desc",
    "domain_desc", "util_practice_desc", "value",
    "reference_period_desc", "class_desc", "asd_code", "agg_level_desc",
    "domaincat_desc", "state_fips_code", "state_alpha", "group_desc",
]


def api_row(**kw):
    base = dict.fromkeys(API_COLS, "")
    base.update(
        year="2012", statisticcat_desc="PRICE RECEIVED", unit_desc="$ / BU",
        prodn_practice_desc="ALL PRODUCTION PRACTICES", freq_desc="ANNUAL",
        domain_desc="TOTAL", util_practice_desc="ALL UTILIZATION PRACTICES",
        reference_period_desc="YEAR", class_desc="ALL CLASSES",
        agg_level_desc="STATE", state_fips_code="16", state_alpha="ID",
    )
    base.update(kw)
    return tuple(base[c] for c in API_COLS)


@pytest.fixture()
def usda_api(spark):
    return spark.createDataFrame(
        [
            api_row(commodity_desc="BARLEY", value="5.00"),
            api_row(commodity_desc="BARLEY", value="7.00", year="2013"),
            api_row(commodity_desc="HAY", class_desc="ALFALFA",
                    unit_desc="$ / TON", value="200"),
            api_row(commodity_desc="LENTILS", unit_desc="$ / CWT", value="30"),
            api_row(commodity_desc="BARLEY", value="(D)"),  # suppressed
        ],
        API_COLS,
    )


def test_commodity_price_and_avg(spark, usda_api):
    price = swap.commodity_price_state(usda_api)
    ap = swap.commodity_avg_price(price)
    got = {(r["commodity"], r["unit"]): r["price"] for r in ap.collect()}
    assert got[("BARLEY", "$ / BU")] == 6.0  # avg(5, 7); (D) dropped
    assert got[("HAY, ALFALFA", "$ / TON")] == 200.0


def test_missing_price_conversions(spark, usda_api):
    ap = swap.commodity_avg_price(swap.commodity_price_state(usda_api))
    mp = swap.commodity_missing_price(ap)
    got = {(r["location"], r["commodity"], r["unit"]): r["price"] for r in mp.collect()}
    # haylage = 0.2 × alfalfa hay price (swap.sql:56-57)
    assert got[("16", "HAYLAGE, ALFALFA", "$ / TON")] == 40.0
    # lentils CWT → LB (swap.sql:67-69)
    assert got[("16", "LENTILS", "$ / LB")] == 0.3
    # Oregon borrows Idaho's lentil price (swap.sql:71-75)
    assert got[("41", "LENTILS", "$ / LB")] == 0.3


@pytest.fixture()
def swap_world(spark, usda_api):
    """A one-county world with known yields for the apportionment."""
    ch = spark.createDataFrame(
        [
            # commodity, location, year, reported, irr, total, prod, unit
            ("BARLEY", "16001", "2012", True, 40.0, 100.0, 6000.0, "BU"),
            ("BARLEY", "16003", "2012", True, None, 50.0, 2500.0, "BU"),
        ],
        ["commodity", "location", "year", "reported", "irrigated_acres",
         "total_acres", "total_production", "unit"],
    )
    ybt = spark.createDataFrame(
        [("2012", "BARLEY", "16001", "BU / ACRE", 30.0, 90.0, 60.0)],
        ["year", "commodity", "location", "unit", "nonirrigated", "irrigated", "total"],
    )
    adc = spark.createDataFrame(
        [("16001", "16ag90", "16"), ("16003", "16ag90", "16")],
        ["fips", "asd", "state_fips"],
    )
    return ch, ybt, adc


def test_swap_apportionment(spark, usda_api, swap_world):
    ch, ybt, adc = swap_world
    out = swap.run_swap_pipeline(spark, ch, ybt, usda_api, adc)
    rows = {(r["location"], r["commodity"]): r for r in out["swap"].collect()}

    # 16001: prod_yield = 6000/100 = 60; i=40, t=100, ir/ni = 3
    # irrigated yield = 60·100 / (40 + 60·(30/90)) = 6000/60 = 100
    irr = rows[("16001", "BARLEY, IRRIGATED")]
    assert irr["acres"] == 40.0 and irr["yield"] == 100.0
    assert irr["price"] == 6.0 and irr["price_unit"] == "$ / BU"
    # non-irrigated = 60·100 / (40·3 + 60) = 6000/180 = 33.33
    non = rows[("16001", "BARLEY, NON-IRRIGATED")]
    assert non["acres"] == 60.0 and non["yield"] == 33.33
    # 16003 has no irrigated split → whole-county row, yield falls
    # back to production_yield 2500/50 = 50
    whole = rows[("16003", "BARLEY")]
    assert whole["acres"] == 50.0 and whole["yield"] == 50.0

    # sanity: apportioned production mass ≈ blended production
    assert abs(irr["yield"] * 40 + non["yield"] * 60 - 6000) < 1


def test_swap_crosstab(spark, usda_api, swap_world):
    ch, ybt, adc = swap_world
    out = swap.run_swap_pipeline(spark, ch, ybt, usda_api, adc)
    net = out["swap_net"].toPandas().set_index("location")
    assert net.loc["16001", "BARLEY, IRRIGATED"] == 40.0
    assert net.loc["16001", "BARLEY, NON-IRRIGATED"] == 60.0
    assert net.loc["16003", "BARLEY"] == 50.0
