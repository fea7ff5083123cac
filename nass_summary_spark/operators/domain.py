"""Domain / host-level gating — RefinedWeb's other first stage next
to URL dedup (B43): extract the host from every document URL, drop
documents from blocklisted hosts, and cap how many documents any one
host may contribute (hosts are the unit of spam/SEO farms; a handful
of mirrors can otherwise dominate a crawl slice).

Reference scope: no counterpart in the reference engine (structured
survey data has no URLs); this is the brief's training-data-pipeline
surface, closing the curation chain html_extract → domain_gate →
url_dedup → content dedup.

Scale shape: host extraction is a map-only regexp projection; the
blocklist is list-sized and BROADCAST (the anti-join never shuffles
the corpus); the per-host cap is ONE window shuffle keyed on host —
the B20 per-key-cap device with its hash-order determinism, so
"which k docs survive" is reproducible across runs and engines. A
pathological single host (the skew case at 100 TB) concentrates one
window partition; since the gate only needs ranks ≤ k, a production
run can pre-prune with a per-partition local cap at k before the
global window (lossless for the kept set) — the documented remedy,
not the default, because it doubles the code path for a case AQE's
skew handling usually absorbs.

Everything is deterministic integer/string arithmetic over shared
constants; the demo query carries a FULL oracle (host regexp
replayed verbatim, blocklist as a VALUES relation, the cap as a
ROW_NUMBER over the same hash order).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from nass_summary_spark.operators.sampling import id_bucket

#: Host capture from a URL: optional scheme, optional userinfo, then
#: everything up to the first ``/ : ? #``. Applied to the
#: lower-cased, trimmed URL; a leading ``www.`` is stripped after
#: capture. RE2-safe (no backreferences) so the oracle replays it.
HOST_RE = r"^(?:[a-z][a-z0-9+.-]*://)?(?:[^/@?#]*@)?([^/:?#]+).*$"

#: www-prefix strip applied to the captured host.
WWW_RE = r"^www\."


def extract_host(url: Column | str) -> Column:
    """The registered host of a URL (lower-cased, ``www.``
    stripped); '' when the URL has no host-shaped prefix."""
    u = F.lower(F.trim(url))
    return F.regexp_replace(F.regexp_extract(u, HOST_RE, 1), WWW_RE, "")


def sql_extract_host(url_expr: str) -> str:
    """DuckDB rendering of :func:`extract_host`."""
    return (
        f"regexp_replace(regexp_extract(lower(trim({url_expr})), "
        f"'{HOST_RE}', 1), '{WWW_RE}', '')"
    )


def domain_gate(
    df: DataFrame,
    url_col: str,
    id_col: str,
    blocklist: DataFrame,
    max_per_host: int,
    host_col: str = "host",
) -> DataFrame:
    """Per-document gate disposition: ``blocked`` (host on the
    blocklist), ``capped`` (host over its document budget), or
    ``kept``. Emits ``host`` and the deterministic ``host_rank``
    (hash order, id tie-break — the B20 device) so callers can
    re-cap tighter later without re-ranking.

    ``blocklist``: a one-column host relation (list-sized,
    broadcast). Blocking is whole-host, so ranks within a blocked
    host are reported but never promote a row past ``blocked``.
    """
    if max_per_host < 1:
        raise ValueError(f"max_per_host must be >= 1: {max_per_host}")
    staged = df.withColumn(host_col, extract_host(F.col(url_col)))
    b = (
        blocklist.select(
            F.lower(F.trim(F.col(blocklist.columns[0]))).alias(host_col)
        )
        .distinct()
        .withColumn("__blocked", F.lit(1))
    )
    j = staged.join(F.broadcast(b), host_col, "left")
    w = Window.partitionBy(host_col).orderBy(
        id_bucket(id_col).asc(), F.col(id_col).asc()
    )
    ranked = j.withColumn(
        "host_rank", F.row_number().over(w).cast("bigint")
    )
    # NULL __blocked (no blocklist hit) falls through to the
    # cap/keep branches — the intended three-way semantics
    return ranked.withColumn(
        "disposition",
        F.when(F.col("__blocked") == 1, F.lit("blocked"))
        .when(F.col("host_rank") > F.lit(int(max_per_host)), F.lit("capped"))
        .otherwise(F.lit("kept")),
    ).drop("__blocked")
