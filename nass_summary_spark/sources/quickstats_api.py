"""Quick Stats API fetch layer — the ``budget.r:10-31`` ingest twin.

The reference's R layer downloads AREA HARVESTED per (state, year)
from the USDA Quick Stats HTTP API (``budget.r:13-19`` builds the
URL; ``budget.r:8`` fixes the five Pacific/Mountain states) and then
filters relationally. ``plans/budget.py`` already twins everything
after the download; this module closes the fetch gap:

- ``build_query_url`` reproduces budget.r's parameter set
  (sector=CROPS, unit=ACRES, statisticcat=AREA HARVESTED,
  freq=ANNUAL, format=CSV) with proper URL encoding;
- ``fetch_to_spool`` pulls each (year, state) slice once into a
  local spool directory. The fetch is deliberately driver-side and
  sequential: the API is rate-limited per key and each slice is a
  few MB — the 100 TB posture is that ingest-from-API is a tiny
  seed step, and everything AFTER the spool (the spark.read + all
  analysis) is distributed. Spooled files are never re-fetched
  (make-style caching, mirroring the reference's one-file-per-pull
  workflow), so re-runs are idempotent and resumable.
- ``read_quickstats_csv`` loads the spool as an all-string
  DataFrame with normalized column names ("Value" → value, "CV (%)"
  → cv_percent); numeric parsing stays downstream in
  ``functions.parsing.safe_number`` exactly like the quickstats
  ingest path (suppressed "(D)" cells must survive as strings).
- ``quickstats_harvest_area`` composes fetch → read →
  ``plans.budget.harvest_area`` end-to-end.

Network access is injectable (``opener=``) and everything is
testable offline; the default opener is stdlib urllib with a
timeout. No third-party HTTP dependency.
"""

from __future__ import annotations

import os
import re
import urllib.parse
import urllib.request
from collections.abc import Callable, Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession

#: budget.r:8 — CA, ID, MT, OR, WA.
DEFAULT_STATES: tuple[str, ...] = ("06", "16", "30", "41", "53")

QS_BASE = "http://quickstats.nass.usda.gov/api/api_GET/"


def build_query_url(
    key: str,
    year: int,
    state_fips: str,
    base: str = QS_BASE,
) -> str:
    """The budget.r:13-19 request: one state, one year, CSV out."""
    params = [
        ("key", key),
        ("year", str(int(year))),
        ("sector_desc", "CROPS"),
        ("unit_desc", "ACRES"),
        ("state_fips_code", state_fips),
        ("statisticcat_desc", "AREA HARVESTED"),
        ("freq_desc", "ANNUAL"),
        ("format", "CSV"),
    ]
    return base + "?" + urllib.parse.urlencode(params, quote_via=urllib.parse.quote)


def _default_opener(url: str, timeout: float) -> bytes:
    with urllib.request.urlopen(url, timeout=timeout) as resp:  # noqa: S310
        return resp.read()


def fetch_to_spool(
    key: str,
    years: Iterable[int],
    states: Sequence[str] = DEFAULT_STATES,
    spool_dir: str = "quickstats_spool",
    opener: Callable[[str, float], bytes] | None = None,
    timeout: float = 60.0,
) -> list[str]:
    """Download each (year, state) CSV slice once; return all paths.

    A slice already present in ``spool_dir`` is not re-fetched, so a
    partially-failed run resumes where it stopped and repeated runs
    cost zero API calls (the reference's per-pull caching workflow).
    """
    fetch = opener or _default_opener
    os.makedirs(spool_dir, exist_ok=True)
    paths: list[str] = []
    for year in years:
        for state in states:
            path = os.path.join(spool_dir, f"qs_{int(year)}_{state}.csv")
            if not os.path.exists(path):
                payload = fetch(build_query_url(key, year, state), timeout)
                tmp = path + ".part"
                with open(tmp, "wb") as fh:
                    fh.write(payload)
                os.replace(tmp, path)  # atomic: no half-written slices
            paths.append(path)
    return paths


def _normalize_name(name: str) -> str:
    n = re.sub(r"[^0-9a-zA-Z]+", "_", name.strip()).strip("_").lower()
    return {"cv": "cv_percent"}.get(n, n)


def read_quickstats_csv(spark: SparkSession, spool: str | list[str]) -> DataFrame:
    """Spool → all-string DataFrame with normalized column names.

    Values stay strings: Quick Stats encodes suppression as "(D)"
    and thousands separators inside Value, which
    ``functions.parsing.safe_number`` handles downstream — casting
    at the scan would silently null them.
    """
    df = spark.read.csv(spool, header=True, inferSchema=False)
    for old in df.columns:
        new = _normalize_name(old)
        if new != old:
            df = df.withColumnRenamed(old, new)
    return df


def quickstats_harvest_area(
    spark: SparkSession,
    key: str,
    years: Iterable[int],
    states: Sequence[str] = DEFAULT_STATES,
    spool_dir: str = "quickstats_spool",
    opener: Callable[[str, float], bytes] | None = None,
) -> DataFrame:
    """budget.r getArea end-to-end: fetch → spool → read →
    ``plans.budget.harvest_area`` (CENSUS-preferred harvested acres
    with irrigated acres joined back)."""
    from nass_summary_spark.plans.budget import harvest_area

    paths = fetch_to_spool(key, years, states, spool_dir, opener)
    return harvest_area(read_quickstats_csv(spark, paths))
