"""budget.r-layer tests (harvest area, census/survey comparison,
ca-agcomm ingest)."""

from __future__ import annotations

import pytest

from nass_summary_spark.plans import budget
from tests.test_swap_pipeline import API_COLS, api_row


def area_row(source, practice, value, **kw):
    return api_row(
        statisticcat_desc="AREA HARVESTED", unit_desc="ACRES",
        source_desc=source, prodn_practice_desc=practice, value=value,
        commodity_desc=kw.pop("commodity", "BARLEY"),
        county_code=kw.pop("county_code", "001"),
        agg_level_desc=kw.pop("agg_level_desc", "COUNTY"),
        **kw,
    )


@pytest.fixture()
def api(spark):
    rows = [
        area_row("CENSUS", "ALL PRODUCTION PRACTICES", "1,000"),
        area_row("CENSUS", "IRRIGATED", "400"),
        area_row("SURVEY", "ALL PRODUCTION PRACTICES", "1,100"),
        area_row("SURVEY", "IRRIGATED", "500"),
        # a finer variant that must be dropped
        area_row("CENSUS", "IRRIGATED, ENTIRE CROP", "123"),
        # combined-county code must be dropped
        area_row("CENSUS", "ALL PRODUCTION PRACTICES", "77", county_code="998"),
        # survey-only crop
        area_row("SURVEY", "ALL PRODUCTION PRACTICES", "200", commodity="OATS"),
    ]
    return spark.createDataFrame(rows, API_COLS)


def test_harvest_area_census_preferred(spark, api):
    out = {r["crops"]: r for r in budget.harvest_area(api).collect()}
    barley = out["BARLEY"]
    # census row wins over survey; irrigated joined back as a column
    assert barley["source_desc"] == "CENSUS"
    assert barley["total"] == 1000.0 and barley["irrigated"] == 400.0
    assert barley["location"] == "16001"
    # survey-only crop still present
    assert out["OATS"]["source_desc"] == "SURVEY" and out["OATS"]["total"] == 200.0
    # combined-county 998 row dropped
    assert all(not r["location"].endswith("998") for r in out.values())


def test_census_survey_comparison(spark, api):
    out = budget.census_survey_comparison(api).collect()
    assert len(out) == 1
    r = out[0]
    assert r["crops"] == "BARLEY"
    assert r["percent_diff"] == round(abs(1000 - 1100) / 1000, 4)
    assert r["percent_irrigated_diff"] == round(abs(400 - 500) / 400, 4)


def test_load_agcomm_csv(spark, tmp_path):
    p = tmp_path / "agcomm.csv"
    p.write_text(
        "2012, 101, ALMONDS ,06001,ALAMEDA,100.5,2.2,221.1,3000,TONS,663300\n"
        "Year,Code,Crop,County Code,County,Acres,Yield,Production,Price,Unit,Value\n"
        "2013,101,ALMONDS,06001,ALAMEDA,110.0,2.0,220.0,3100,TONS,682000\n"
    )
    df = budget.load_agcomm_csv(spark, str(p))
    rows = {r["year"]: r for r in df.collect()}
    # the repeated header line (non-numeric year) is dropped
    assert set(rows) == {2012, 2013}
    assert rows[2012]["crop"] == "ALMONDS"
    assert rows[2012]["harvested_acres"] == 100.5


def test_read_json_records_api_shape(spark, tmp_path):
    """usda_api JSON ingest (nass.mk:104-110): flatten data[] and
    project the jq column list."""
    import json

    from nass_summary_spark.sources.readers import read_json_records

    p = tmp_path / "api.json"
    p.write_text(
        json.dumps(
            {
                "data": [
                    {"year": "2012", "commodity_desc": "BARLEY", "value": "5.00",
                     "state_alpha": "ID", "extra_junk": 1},
                    {"year": "2013", "commodity_desc": "OATS", "value": "2.00",
                     "state_alpha": "ID", "extra_junk": 2},
                ]
            }
        )
    )
    df = read_json_records(
        spark, str(p), record_path="data",
        columns=["year", "commodity_desc", "value"],
    )
    assert df.columns == ["year", "commodity_desc", "value"]
    got = {r["year"]: r["commodity_desc"] for r in df.collect()}
    assert got == {"2012": "BARLEY", "2013": "OATS"}
