"""html_extract (B152): trafilatura-lite HTML → text extraction.

Pins (a) exact cross-engine agreement with the DuckDB replay on a
hand-built boilerplate fixture, (b) the chrome-stripping semantics
block by block, and (c) that the extracted text feeds the existing
quality operators (B9 features / B112 Gopher rules) unchanged —
the "web-corpus first stage" contract from the r9 verdict.
"""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from nass_summary_spark.operators.html import (
    html_extract,
    html_extract_oracle_sql,
)

_DOC = (
    "<html><head><title>t</title>"
    "<script>var x = 1; if (x<2) { x = 3; }</script>"
    "<style>.a{color:red}</style></head>"
    "<body><nav><a class='m' href='/site/home/index'>Home</a> "
    "<a class='m' href='/site/about/index'>About</a></nav>"
    "<!-- generator: test -->"
    "<p>This is the first real paragraph with plenty of words.</p>"
    "<p>Second one, long enough to keep, with &amp; and &lt;tag&gt; "
    "entities &#39;quoted&#39; here.</p>"
    "<div id='foot'>&copy; 2026</div></body></html>"
)


def _run_both(spark, docs):
    df = spark.createDataFrame(docs, "doc_id int, html string")
    got = sorted(
        tuple(r)
        for r in html_extract(df, "doc_id", "html")
        .select(
            "doc_id", "n_blocks", "n_kept", "n_words", "n_chars",
            F.md5("extracted").alias("extracted_md5"),
        )
        .collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE d(doc_id INT, html VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", docs)
    want = sorted(
        tuple(r)
        for r in con.execute(
            html_extract_oracle_sql("d", "doc_id", "html")
        ).fetchall()
    )
    return got, want


def test_html_extract_cross_engine_exact(spark):
    docs = [
        (1, _DOC),
        (2, "<div>short</div><p>Another paragraph that has well over "
            "five words in it.</p>"),
        (3, None),
        (4, ""),
        (5, "<p>one two three four</p>"),  # 4 words -> filtered
        (6, "plain text with no markup at all but many words here"),
    ]
    got, want = _run_both(spark, docs)
    assert got == want


def test_html_extract_strips_chrome(spark):
    df = spark.createDataFrame([(1, _DOC)], "doc_id int, html string")
    row = html_extract(df, "doc_id", "html").collect()[0]
    text = row["extracted"]
    # scripts/styles/comments/nav/footer gone, prose kept in order
    assert "var x" not in text and "color:red" not in text
    assert "generator" not in text
    assert "Home" not in text and "2026" not in text
    assert text.startswith("This is the first real paragraph")
    assert "Second one, long enough" in text
    # entities decoded exactly once
    assert "& and <tag> entities 'quoted' here." in text
    assert "&amp;" not in text
    # accounting: title + nav + 2 paras + footer have visible text;
    # only the two prose paragraphs survive
    assert row["n_blocks"] == 5 and row["n_kept"] == 2
    assert row["n_words"] == text.count(" ") + text.count("\n") + 1


def test_html_extract_single_level_entity_decode(spark):
    # &amp;lt; must decode to the literal string "&lt;", never "<"
    docs = [(1, "<p>escape check &amp;lt; stays escaped with words "
               "enough to keep this block</p>")]
    df = spark.createDataFrame(docs, "doc_id int, html string")
    text = html_extract(df, "doc_id", "html").collect()[0]["extracted"]
    assert "&lt;" in text and "<" not in text.replace("&lt;", "")
    got, want = _run_both(spark, docs)
    assert got == want


def test_html_extract_feeds_quality_operators(spark):
    from nass_summary_spark.operators.quality_rules import gopher_rules

    docs = [(i, _DOC.replace("first real", f"doc{i} real")) for i in range(8)]
    df = spark.createDataFrame(docs, "doc_id int, html string")
    extracted = html_extract(df, "doc_id", "html")
    out = gopher_rules(extracted, "extracted", "doc_id")
    rows = out.collect()
    assert len(rows) == 8
    # prose that passed density/word filters reads as normal text to
    # the downstream rules: every flag column present and boolean
    for flag in ("word_count_ok", "alpha_word_ok", "keep"):
        assert flag in out.columns
    assert all(r["alpha_word_ok"] for r in rows)


def test_html_extract_density_drops_linkfarm(spark):
    # a block that is long but mostly markup must fail the density
    # test even though its word count clears the minimum
    links = "".join(
        f"<a class='wide' href='/very/long/path/number/{i}'>w{i}</a> "
        for i in range(10)
    )
    docs = [(1, f"<div>{links}</div><p>Real paragraph with more than "
               f"five words for keeping.</p>")]
    df = spark.createDataFrame(docs, "doc_id int, html string")
    row = html_extract(df, "doc_id", "html").collect()[0]
    assert row["n_kept"] == 1
    assert row["extracted"].startswith("Real paragraph")
    got, want = _run_both(spark, docs)
    assert got == want
