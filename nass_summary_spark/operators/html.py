"""HTML → text extraction (trafilatura-lite) — the first stage of a
web-corpus curation pipeline, upstream of every text operator in the
B-block (quality B9, Gopher rules B112, scrub B24, dedup B1/B3...).

Reference scope: the reference engine has no web-extraction stage
(its inputs are structured survey tables); this operator is part of
the brief's training-data-pipeline surface. The heuristic is the
published text-density family (Kohlschütter et al., boilerpipe;
trafilatura): excise non-content subtrees, split on block-level
tags, keep blocks whose visible-text density and word count clear a
threshold — navigation/footer/chrome blocks are mostly markup and
short, body prose is mostly text.

Scale shape: a pure map-only regexp/HOF projection — no UDF, no
shuffle, no state; at 100 TB this is a scan stage that pipelines
with whatever aggregation follows. Every rule is a shared constant
rendered identically into the DuckDB replay (RE2-safe: no
backreferences, only inline ``(?is)`` flags and non-greedy
quantifiers, which Java regex and RE2 agree on), and the keep
predicate is INTEGER arithmetic (``100*text_len >= pct*raw_len``),
so the whole extraction carries a FULL value oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Non-content subtrees excised wholesale (case-insensitive,
#: dot-matches-newline, non-greedy to the matching close tag). Two
#: separate patterns — RE2 (the oracle engine) has no backreference
#: to collapse them into one.
SCRIPT_RE = r"(?is)<script\b[^>]*>.*?</script\s*>"
STYLE_RE = r"(?is)<style\b[^>]*>.*?</style\s*>"
COMMENT_RE = r"(?s)<!--.*?-->"

#: Block-level boundaries: the document splits into candidate text
#: blocks at these tags (open or close, any attributes).
BLOCK_TAG_RE = (
    r"(?i)</?(?:html|head|body|title|p|div|br|li|ul|ol|h1|h2|h3|h4|h5"
    r"|h6|table|thead|tbody|tr|td|th|section|article|aside|header"
    r"|footer|nav|blockquote|form|figure|figcaption|main|pre)\b[^>]*>"
)

#: Inline-tag strip (replaced by a space so ``a</b><b>b`` keeps its
#: word boundary; whitespace collapses afterwards).
TAG_RE = r"<[^>]*>"

#: Entity decode table, applied in order — ``&amp;`` LAST so
#: ``&amp;lt;`` decodes to ``&lt;`` (one level), never to ``<``.
ENTITY_TABLE: list[tuple[str, str]] = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]

#: Keep thresholds: a block survives iff it has >= MIN_WORDS
#: whitespace-separated words AND its visible text is >=
#: MIN_DENSITY_PCT percent of the raw block length (markup-heavy
#: chrome fails the density test even when long).
MIN_WORDS = 5
MIN_DENSITY_PCT = 20


def _clean_block(b: Column) -> Column:
    """Visible text of one raw block: tag strip → entity decode →
    whitespace collapse → trim. Mirrored verbatim by
    :func:`_sql_clean_block`."""
    t = F.regexp_replace(b, TAG_RE, " ")
    for ent, rep in ENTITY_TABLE:
        t = F.regexp_replace(t, ent, rep)
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def _sql_clean_block(var: str) -> str:
    """DuckDB rendering of :func:`_clean_block` over ``var``."""
    t = f"regexp_replace({var}, '{TAG_RE}', ' ', 'g')"
    for ent, rep in ENTITY_TABLE:
        rep_sql = rep.replace("'", "''")
        t = f"regexp_replace({t}, '{ent}', '{rep_sql}', 'g')"
    return f"trim(regexp_replace({t}, '\\s+', ' ', 'g'))"


def strip_noncontent(html: Column) -> Column:
    """Excise scripts, styles and comments (each replaced by a
    space so adjacent blocks don't merge)."""
    c = F.regexp_replace(html, SCRIPT_RE, " ")
    c = F.regexp_replace(c, STYLE_RE, " ")
    return F.regexp_replace(c, COMMENT_RE, " ")


def sql_strip_noncontent(var: str) -> str:
    """DuckDB rendering of :func:`strip_noncontent`."""
    c = f"regexp_replace({var}, '{SCRIPT_RE}', ' ', 'g')"
    c = f"regexp_replace({c}, '{STYLE_RE}', ' ', 'g')"
    return f"regexp_replace({c}, '{COMMENT_RE}', ' ', 'g')"


def _keep_pred(b: Column, min_words: int, density_pct: int) -> Column:
    """Integer-arithmetic keep predicate on a RAW block: word count
    and text density both computed from the cleaned text, compared
    against the raw length — no floats anywhere."""
    txt = _clean_block(b)
    n_words = F.when(
        F.length(txt) > 0,
        F.length(txt) - F.length(F.regexp_replace(txt, " ", "")) + 1,
    ).otherwise(F.lit(0))
    return (n_words >= F.lit(min_words)) & (
        F.length(txt) * 100 >= F.length(b) * F.lit(density_pct)
    )


def _sql_keep_pred(var: str, min_words: int, density_pct: int) -> str:
    txt = _sql_clean_block(var)
    n_words = (
        f"(CASE WHEN length({txt}) > 0 THEN length({txt}) - "
        f"length(regexp_replace({txt}, ' ', '', 'g')) + 1 ELSE 0 END)"
    )
    return (
        f"({n_words} >= {min_words} AND "
        f"length({txt}) * 100 >= length({var}) * {density_pct})"
    )


def html_extract(
    df: DataFrame,
    id_col: str,
    html_col: str,
    min_words: int = MIN_WORDS,
    density_pct: int = MIN_DENSITY_PCT,
    out_col: str = "extracted",
) -> DataFrame:
    """Main-content extraction: one row per document with the
    boilerplate-filtered text plus its block/word accounting.

    Output: ``(id_col, n_blocks, n_kept, n_words, n_chars,
    out_col)`` where ``n_blocks`` counts blocks with any visible
    text, ``n_kept`` the blocks surviving the density/word filter,
    and ``out_col`` joins the kept blocks with newlines (the
    relation B9/B112/B24 consume unchanged).
    """
    cleaned = strip_noncontent(F.coalesce(F.col(html_col), F.lit("")))
    blocks = F.split(cleaned, BLOCK_TAG_RE)
    kept_raw = F.filter(
        blocks, lambda b: _keep_pred(b, min_words, density_pct)
    )
    kept_txt = F.transform(kept_raw, _clean_block)
    joined = F.array_join(kept_txt, "\n")
    # blocks are single-space-collapsed and newline-joined, so the
    # word count is pure length arithmetic (no split, no floats)
    n_words = F.when(
        F.length(joined) > 0,
        F.length(joined)
        - F.length(F.regexp_replace(joined, r"[ \n]", ""))
        + 1,
    ).otherwise(F.lit(0))
    return df.select(
        id_col,
        F.size(
            F.filter(blocks, lambda b: F.length(_clean_block(b)) > 0)
        ).cast("bigint").alias("n_blocks"),
        F.size(kept_raw).cast("bigint").alias("n_kept"),
        n_words.cast("bigint").alias("n_words"),
        F.length(joined).cast("bigint").alias("n_chars"),
        joined.alias(out_col),
    )


def html_extract_oracle_sql(
    source_sql: str,
    id_sql: str,
    html_sql: str,
    min_words: int = MIN_WORDS,
    density_pct: int = MIN_DENSITY_PCT,
    digest: bool = True,
    id_alias: str | None = None,
) -> str:
    """DuckDB replay of :func:`html_extract` over ``source_sql``
    (a FROM-able relation), with ``html_sql`` the HTML expression.
    ``digest=True`` hashes the extracted text (md5) instead of
    emitting it raw — the driver-facing form. ``id_alias`` names the
    id output column (defaults to ``id_sql``, which must then be a
    bare column name)."""
    cleaned = sql_strip_noncontent(f"COALESCE({html_sql}, '')")
    keep = _sql_keep_pred("b", min_words, density_pct)
    clean_b = _sql_clean_block("b")
    out_expr = (
        "md5(joined) AS extracted_md5" if digest else "joined AS extracted"
    )
    return f"""
    WITH base AS (
      SELECT {id_sql} AS __id,
             string_split_regex({cleaned}, '{BLOCK_TAG_RE}') AS blocks
      FROM {source_sql}
    ),
    agg AS (
      SELECT __id,
        len(list_filter(blocks, b -> length({clean_b}) > 0)) AS n_blocks,
        len(list_filter(blocks, b -> {keep})) AS n_kept,
        COALESCE(array_to_string(
          list_transform(list_filter(blocks, b -> {keep}),
                         b -> {clean_b}),
          chr(10)), '') AS joined
      FROM base
    )
    SELECT __id AS {id_alias or id_sql},
      CAST(n_blocks AS BIGINT) AS n_blocks,
      CAST(n_kept AS BIGINT) AS n_kept,
      CAST(CASE WHEN length(joined) > 0
           THEN length(joined)
                - length(regexp_replace(joined, '[ \\n]', '', 'g')) + 1
           ELSE 0 END AS BIGINT) AS n_words,
      CAST(length(joined) AS BIGINT) AS n_chars,
      {out_expr}
    FROM agg
    """
