r"""Order-independent table fingerprints (SURVEY.md §2 B94).

At 100 TB, "did the copy/migration/backfill produce the same table?"
cannot be answered by ORDER BY + diff: the answer has to be a
constant-size, ORDER-INDEPENDENT digest computed in one combinable
pass on each side. Classic shape (used by replication verifiers):
hash every row to a 60-bit integer with a portable hash, then
combine with commutative reductions — COUNT, BIT_XOR, and a modular
SUM (two independent combinations so a pair of compensating row
edits can't silently cancel in both).

Grouped mode (``group_cols``) emits one digest per partition-like
group, which is how a mismatch is LOCALIZED without re-scanning:
compare per-day digests, re-check only the day that differs.

Portability: the row hash is ``token_hash64`` (top hex digits of
md5 — the same construction the hash_split family mirrors in
DuckDB), over a canonical ``|``-joined string. The encoding is
INJECTIVE: every value escapes backslash then the separator
(``\ -> \\``, ``| -> \|``) and NULL becomes the unescaped
sentinel ``\N`` — so ``('a|b','c')`` vs ``('a','b|c')``, or a
literal ``'\N'`` vs a real NULL, can never canonicalize to the
same string (a systematic, not birthday-bound, collision in a
digest tool would be disqualifying). Restrict ``cols`` to
integer/string/date columns: float formatting is engine-specific
and would break the cross-engine digest (documented, asserted in
tests).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nass_summary_spark.functions.vectors import token_hash64

#: Mersenne prime 2^61 - 1: sum residues stay clear of BIGINT range.
SUM_MOD = 2305843009213693951

#: Unescaped NULL marker: real data can never produce a bare ``\N``
#: because every literal backslash is doubled by the escaping above.
_NULL_SENTINEL = "\\N"

_FLOATY = ("double", "float", "decimal")


def row_digest(df: DataFrame, cols: Sequence[str]) -> F.Column:
    """60-bit portable row hash over a canonical column encoding."""
    for c in cols:
        dt = dict(df.dtypes)[c]
        if any(dt.startswith(p) for p in _FLOATY):
            raise ValueError(
                f"table_checksum: column {c!r} has float-family type "
                f"{dt}; cross-engine float formatting is not stable — "
                "cast to an exact type (string/decimal-scaled int) first"
            )
    def esc(c: str):
        s = F.col(c).cast("string")
        s = F.replace(s, F.lit("\\"), F.lit("\\\\"))
        s = F.replace(s, F.lit("|"), F.lit("\\|"))
        return F.coalesce(s, F.lit("\\N"))

    canon = F.concat_ws("|", *[esc(c) for c in cols])
    return token_hash64(canon, bits=60)


def dd_row_digest(cols: Sequence[str]) -> str:
    """DuckDB mirror of :func:`row_digest` (oracle SQL fragment)."""
    parts = ", ".join(
        "COALESCE(replace(replace(CAST(%s AS VARCHAR), '\\', '\\\\'), "
        "'|', '\\|'), '\\N')" % c
        for c in cols
    )
    return (
        f"(('0x' || substr(md5(concat_ws('|', {parts})), 1, 15))::BIGINT)"
    )


def table_checksum(
    df: DataFrame,
    cols: Sequence[str],
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Constant-size order-independent digest of ``cols`` — overall,
    or one row per ``group_cols`` group.

    Output: ``n_rows`` (BIGINT), ``xor_checksum`` (BIT_XOR of row
    hashes), ``sum_checksum`` (SUM of row hashes mod 2^61-1, exact
    via DECIMAL accumulation). One fully map-side-combinable shuffle;
    the result is a handful of integers regardless of table size.
    """
    h = row_digest(df, cols)
    hashed = df.select(*group_cols, h.alias("__h"))
    aggs = [
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.expr("bit_xor(__h)").cast("bigint").alias("xor_checksum"),
        (F.sum(F.col("__h").cast("decimal(38,0)")) % F.lit(SUM_MOD))
        .cast("bigint")
        .alias("sum_checksum"),
    ]
    if group_cols:
        return hashed.groupBy(*group_cols).agg(*aggs)
    return hashed.agg(*aggs)
