"""Quick Stats API fetch layer (sources/quickstats_api.py) — the
budget.r:10-31 ingest twin, tested fully offline via an injected
opener serving a canned API CSV payload."""

from __future__ import annotations

import csv
import io
import urllib.parse

from nass_summary_spark.sources import quickstats_api as qs
from tests.test_swap_pipeline import API_COLS, api_row

#: column headers as the live API emits them (mixed case + "CV (%)")
_API_HEADERS = [
    "Value" if c == "value" else c for c in API_COLS
] + ["CV (%)"]


def _payload(rows) -> bytes:
    buf = io.StringIO()
    w = csv.writer(buf)
    w.writerow(_API_HEADERS)
    for r in rows:
        w.writerow(list(r) + ["1.5"])
    return buf.getvalue().encode()


def _area_row(source, practice, value, **kw):
    return api_row(
        statisticcat_desc="AREA HARVESTED", unit_desc="ACRES",
        source_desc=source, prodn_practice_desc=practice, value=value,
        commodity_desc=kw.pop("commodity", "BARLEY"),
        county_code=kw.pop("county_code", "001"),
        agg_level_desc=kw.pop("agg_level_desc", "COUNTY"),
        **kw,
    )


class FakeOpener:
    def __init__(self):
        self.urls: list[str] = []

    def __call__(self, url: str, timeout: float) -> bytes:
        self.urls.append(url)
        q = dict(urllib.parse.parse_qsl(urllib.parse.urlsplit(url).query))
        rows = [
            _area_row("CENSUS", "ALL PRODUCTION PRACTICES", "1,000",
                      year=q["year"], state_fips_code=q["state_fips_code"]),
            _area_row("CENSUS", "IRRIGATED", "400",
                      year=q["year"], state_fips_code=q["state_fips_code"]),
        ]
        return _payload(rows)


def test_url_matches_budget_r_params():
    url = qs.build_query_url("SECRET", 2005, "06")
    parts = urllib.parse.urlsplit(url)
    assert parts.netloc == "quickstats.nass.usda.gov"
    assert parts.path == "/api/api_GET/"
    q = dict(urllib.parse.parse_qsl(parts.query))
    # the exact budget.r:13-19 parameter set
    assert q == {
        "key": "SECRET", "year": "2005", "sector_desc": "CROPS",
        "unit_desc": "ACRES", "state_fips_code": "06",
        "statisticcat_desc": "AREA HARVESTED", "freq_desc": "ANNUAL",
        "format": "CSV",
    }
    # spaces must be %20-escaped (budget.r hand-writes AREA%20HARVESTED)
    assert "AREA%20HARVESTED" in url


def test_fetch_spool_idempotent(tmp_path):
    opener = FakeOpener()
    paths = qs.fetch_to_spool(
        "k", [2005, 2006], ["06", "16"], str(tmp_path), opener
    )
    assert len(paths) == 4 and len(opener.urls) == 4
    # re-run: nothing re-fetched, same paths back
    again = qs.fetch_to_spool(
        "k", [2005, 2006], ["06", "16"], str(tmp_path), opener
    )
    assert again == paths and len(opener.urls) == 4


def test_read_normalizes_headers(spark, tmp_path):
    opener = FakeOpener()
    paths = qs.fetch_to_spool("k", [2005], ["06"], str(tmp_path), opener)
    df = qs.read_quickstats_csv(spark, paths)
    assert "value" in df.columns and "cv_percent" in df.columns
    assert "Value" not in df.columns
    # values survive as raw strings (suppression/thousands intact)
    vals = {r.value for r in df.select("value").collect()}
    assert "1,000" in vals


def test_end_to_end_harvest_area(spark, tmp_path):
    opener = FakeOpener()
    out = qs.quickstats_harvest_area(
        spark, "k", [2005], ["06", "16"], str(tmp_path), opener
    )
    rows = {r.location: r for r in out.collect()}
    # one county row per state slice; comma-value parsed downstream
    assert set(rows) == {"06001", "16001"}
    for r in rows.values():
        assert r.source_desc == "CENSUS"
        assert r.total == 1000.0 and r.irrigated == 400.0
