"""domain_gate (B153): host extraction + blocklist + per-host cap."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nass_summary_spark.operators.domain import (
    domain_gate,
    extract_host,
    sql_extract_host,
)


def test_extract_host_forms(spark):
    cases = [
        ("https://www.Example.COM/a/b?q=1#f", "example.com"),
        ("HTTP://sub.example.org:8080/x", "sub.example.org"),
        ("ftp://user:pw@files.example.net/pub", "files.example.net"),
        ("example.com/path", "example.com"),          # schemeless
        ("www.example.com", "example.com"),
        ("  https://PAD.example.io  ", "pad.example.io"),
        ("", ""),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(cases)], "i int, url string"
    )
    got = {
        r["i"]: r["h"]
        for r in df.select("i", extract_host("url").alias("h")).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (cases[i], got[i])
    # and the SQL rendering agrees on every form
    import duckdb

    con = duckdb.connect()
    for u, want in cases:
        (sql_host,) = con.execute(
            f"SELECT {sql_extract_host('?')}", [u]
        ).fetchone()
        assert sql_host == want, (u, sql_host)


def test_domain_gate_dispositions(spark):
    from nass_summary_spark.functions.smalldf import local_struct_df

    rows = (
        [(i, "https://spam.example.com/p") for i in range(5)]
        + [(10 + i, "https://good.example.com/p") for i in range(4)]
        + [(100, "https://rare.example.org/p")]
    )
    df = spark.createDataFrame(rows, "doc_id int, url string")
    bl = local_struct_df(spark, "host string", [("spam.example.com",)])
    out = domain_gate(df, "url", "doc_id", bl, max_per_host=2).collect()
    by_disp: dict = {}
    for r in out:
        by_disp.setdefault(r["disposition"], []).append(r)
    assert len(by_disp["blocked"]) == 5
    assert all(r["host"] == "spam.example.com" for r in by_disp["blocked"])
    # good host: 2 kept, 2 capped; rare host: 1 kept
    assert len(by_disp["capped"]) == 2
    assert len(by_disp["kept"]) == 3
    kept_hosts = sorted(r["host"] for r in by_disp["kept"])
    assert kept_hosts == [
        "good.example.com", "good.example.com", "rare.example.org",
    ]
    # ranks are a permutation of 1..n per host
    good = sorted(
        r["host_rank"] for r in out if r["host"] == "good.example.com"
    )
    assert good == [1, 2, 3, 4]


def test_domain_gate_blocklist_normalized(spark):
    from nass_summary_spark.functions.smalldf import local_struct_df

    df = spark.createDataFrame(
        [(1, "https://www.Shady.NET/x")], "doc_id int, url string"
    )
    bl = local_struct_df(spark, "host string", [("  SHADY.net ",)])
    out = domain_gate(df, "url", "doc_id", bl, max_per_host=5).collect()
    assert out[0]["disposition"] == "blocked"


def test_domain_gate_rank_deterministic(spark):
    from nass_summary_spark.functions.smalldf import local_struct_df

    rows = [(i, "https://h.example.com/p") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id int, url string")
    bl = local_struct_df(spark, "host string", [("none.example.com",)])
    a = {
        r["doc_id"]: r["host_rank"]
        for r in domain_gate(
            df.repartition(7), "url", "doc_id", bl, 10
        ).collect()
    }
    b = {
        r["doc_id"]: r["host_rank"]
        for r in domain_gate(
            df.repartition(2), "url", "doc_id", bl, 10
        ).collect()
    }
    assert a == b  # hash order, not partition order


def test_domain_gate_validates_cap(spark):
    from nass_summary_spark.functions.smalldf import local_struct_df

    df = spark.createDataFrame([(1, "https://a.b/c")], "doc_id int, url string")
    bl = local_struct_df(spark, "host string", [("x.y",)])
    with pytest.raises(ValueError, match="max_per_host"):
        domain_gate(df, "url", "doc_id", bl, max_per_host=0)
