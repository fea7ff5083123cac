#!/usr/bin/env python
"""Local stand-in for the driver's t2 correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at
sf0.01, compare row counts, column names, and exact values
(order-insensitive).

Usage: python tools/verify_oracle.py [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

from __spark_entry__ import queries as _entry_queries
from nass_summary_spark.plans.queries import ORACLES
from nass_summary_spark.session import get_spark

# Use the driver-facing ordering (__spark_entry__.queries) so this
# artifact and CORRECTNESS_r{N}.json can be diffed row-for-row; the
# first 50 names here are exactly the driver gate's window.
QUERIES = _entry_queries()

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].apply(
                lambda v: str(v) if not isinstance(v, (int, float, str, type(None))) else v
            )
    df = df.sort_values(by=list(df.columns), ignore_index=True, key=lambda s: s.astype(str))
    return df


def compare(name: str, spark, con) -> dict:
    out = {"name": name}
    try:
        sdf = QUERIES[name](spark, sf_dir)
        spdf = sdf.toPandas()
    except Exception as e:  # noqa: BLE001
        out["spark_error"] = repr(e)[:300]
        return out
    out["spark_rows"] = len(spdf)
    if name not in ORACLES:
        out["status"] = "rows-only"
        return out
    try:
        odf = con.execute(ORACLES[name]).fetchdf()
    except Exception as e:  # noqa: BLE001
        out["oracle_error"] = repr(e)[:300]
        return out
    out["oracle_rows"] = len(odf)
    a, b = normalize(spdf), normalize(odf)
    out["cols_match"] = list(a.columns) == list(b.columns)
    if not out["cols_match"]:
        out["spark_cols"] = list(a.columns)
        out["oracle_cols"] = list(b.columns)
        return out
    if len(a) != len(b):
        out["status"] = "ROWCOUNT MISMATCH"
        return out
    # dtype-KIND strictness: the driver hashes canonicalized values,
    # so int64 5 vs float64 5.0 (e.g. DuckDB HUGEINT→float64 from a
    # bare SUM(BIGINT)) is a real mismatch even when values are equal
    kinds_a = [("f" if a[c].dtype.kind == "f" else "o") for c in a.columns]
    kinds_b = [("f" if b[c].dtype.kind == "f" else "o") for c in b.columns]
    if kinds_a != kinds_b:
        out["status"] = "DTYPE-KIND MISMATCH"
        out["spark_dtypes"] = {c: str(a[c].dtype) for c in a.columns}
        out["oracle_dtypes"] = {c: str(b[c].dtype) for c in b.columns}
        return out
    try:
        pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
        out["status"] = "OK"
    except AssertionError as e:
        out["status"] = "VALUES MISMATCH"
        out["detail"] = str(e).split("\n")[0][:200]
        # show a few mismatching cells
        mism = (a.astype(str) != b.astype(str))
        bad = mism.any(axis=1)
        out["n_bad_rows"] = int(bad.sum())
        if bad.any():
            i = bad.idxmax()
            out["example_spark"] = a.loc[i].to_dict()
            out["example_oracle"] = b.loc[i].to_dict()
    return out


if __name__ == "__main__":
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    args = sys.argv[1:]
    hostile = "--hostile" in args
    names = [a for a in args if not a.startswith("--")] or list(QUERIES)
    if hostile:
        # mimic the external driver's environment: vanilla builder,
        # non-UTC session timezone, engine-default shuffle/AQE/Arrow
        # settings — none of session.py's tuning. Every query must
        # produce identical values here (timezone independence etc.).
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.appName("verify_hostile")
            .master("local[8]")
            .config("spark.sql.session.timeZone", "America/New_York")
            .getOrCreate()
        )
    else:
        spark = get_spark("verify_oracle")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_ok = n_bad = 0
    for name in names:
        r = compare(name, spark, con)
        status = r.get("status", "ERROR")
        if status in ("OK", "rows-only"):
            n_ok += 1
            print(f"PASS {name}: {status} rows={r.get('spark_rows')}")
        else:
            n_bad += 1
            print(f"FAIL {name}: {r}")
    print(f"\n{n_ok} ok, {n_bad} bad of {len(names)}")
    sys.exit(1 if n_bad else 0)
