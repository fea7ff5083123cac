"""Literal-array construction that bypasses the py4j per-element tax.

``F.array(*[F.lit(v) for v in vals])`` costs ~75 py4j round-trips per
element (~0.4 ms each on this stack — the "Python-local-relation tax"
family, SCALING.md): a 40×16 nested double table built that way burns
~0.5 s of pure driver time PER SUBSPACE, which dominated the ANN ADC
queries (r10 optimization round, guide §7.3 "very large expression
trees").  Rendering the same literals into ONE SQL string and parsing
it with ``F.expr`` builds the identical Catalyst tree (Literal nodes
inside CreateArray) in single-digit milliseconds.

Value fidelity: ``repr(float)`` is the shortest round-tripping decimal
for an IEEE double, and Spark's parser converts ``<repr>D`` literals
with correct rounding (Java ``Double.parseDouble``), so the parsed
literal is BIT-IDENTICAL to ``F.lit(v)`` — pinned in
tests/test_lits.py over random + adversarial values.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, functions as F

__all__ = [
    "double_array",
    "double_array2d",
    "bigint_array",
    "bigint_array_sql",
    "bigint_map",
    "bigint_map_sql",
    "double_array2d_sql",
    "dot_lit_sql",
    "sqdist_lit_sql",
]


def _dlit(v: float) -> str:
    v = float(v)
    if math.isnan(v):
        return "CAST('NaN' AS DOUBLE)"
    if math.isinf(v):
        return "CAST('-Infinity' AS DOUBLE)" if v < 0 else "CAST('Infinity' AS DOUBLE)"
    return f"{v!r}D"


def _d1(vals) -> str:
    return "array(" + ",".join(_dlit(v) for v in vals) + ")"


def double_array(vals) -> Column:
    """``F.array(*[F.lit(float(v)) for v in vals])`` in one parse."""
    vals = list(vals)
    if not vals:
        return F.expr("CAST(array() AS ARRAY<DOUBLE>)")
    return F.expr(_d1(vals))


def double_array2d(rows) -> Column:
    """Nested ``array(array(..double..), ...)`` literal in one parse."""
    rows = [list(r) for r in rows]
    if not rows:
        return F.expr("CAST(array() AS ARRAY<ARRAY<DOUBLE>>)")
    return F.expr("array(" + ",".join(_d1(r) for r in rows) + ")")


def double_array2d_sql(rows) -> str:
    """SQL text of the nested double-array literal (the string twin
    of :func:`double_array2d`, for embedding inside larger rendered
    expressions)."""
    rows = [list(r) for r in rows]
    if not rows:
        return "CAST(array() AS ARRAY<ARRAY<DOUBLE>>)"
    return "array(" + ",".join(_d1(r) for r in rows) + ")"


def dot_lit_sql(vec_sql: str, vals) -> str:
    """SQL text of the literal dot product
    ``aggregate(zip_with(vec, <lits>, (v,p) -> CAST(v AS DOUBLE)*p),
    0.0D, (acc,x) -> acc+x)`` — the exact fold the Column-API form
    builds (same ops, same order, bit-identical doubles), in ONE
    parse instead of ~20 py4j round-trips per call. Each ANN/LSH
    construction site evaluates this once per literal vector (plane,
    centroid), so the per-call tax multiplies by planes × tables or
    cells × subspaces — the r10 profile measured whole seconds of
    driver time per query build."""
    vals = list(vals)
    if not vals:
        raise ValueError("dot_lit_sql: empty literal vector")
    return (
        f"aggregate(zip_with({vec_sql},{_d1(vals)},"
        "(v,p)->CAST(v AS DOUBLE)*p),0.0D,(acc,x)->acc+x)"
    )


def sqdist_lit_sql(vec_sql: str, vals) -> str:
    """SQL text of the literal squared-L2 distance fold
    (``(CAST(v AS DOUBLE)-p)*(CAST(v AS DOUBLE)-p)`` summed), the
    string twin of pq._sqdist_expr — see :func:`dot_lit_sql`."""
    vals = list(vals)
    if not vals:
        raise ValueError("sqdist_lit_sql: empty literal vector")
    return (
        f"aggregate(zip_with({vec_sql},{_d1(vals)},"
        "(v,p)->(CAST(v AS DOUBLE)-p)*(CAST(v AS DOUBLE)-p)),"
        "0.0D,(acc,x)->acc+x)"
    )


def bigint_array_sql(vals) -> str:
    """SQL text of :func:`bigint_array` — for callers that embed the
    literal inside a larger single-parse SQL statement."""
    vals = [None if v is None else int(v) for v in vals]
    if not vals:
        return "CAST(array() AS ARRAY<BIGINT>)"
    body = ",".join(
        "CAST(NULL AS BIGINT)" if v is None else f"{v}L" for v in vals
    )
    return f"array({body})"


def bigint_array(vals) -> Column:
    """``F.array(*[F.lit(int(v)).cast("bigint") for v in vals])`` in
    one parse (L-suffix literals; the parser accepts BIGINT min).
    ``None`` entries render as ``CAST(NULL AS BIGINT)`` — the dense
    weight-LUT device needs NULL slots (a trained weight can be NULL
    when its gradient aggregated over all-NULL residuals)."""
    return F.expr(bigint_array_sql(vals))


def bigint_map_sql(pairs) -> str:
    """SQL text of :func:`bigint_map` — for callers that embed the
    literal inside a larger single-parse SQL statement."""
    items = [(int(k), None if v is None else int(v)) for k, v in pairs]
    if not items:
        return "CAST(map() AS MAP<BIGINT,BIGINT>)"
    body = ",".join(
        f"{k}L," + ("CAST(NULL AS BIGINT)" if v is None else f"{v}L")
        for k, v in items
    )
    return f"map({body})"


def bigint_map(pairs) -> Column:
    """``map(k1,v1, k2,v2, ...)`` BIGINT→BIGINT literal in one parse.
    NULL values render as ``CAST(NULL AS BIGINT)`` (keys must be
    non-NULL — Spark rejects NULL map keys). The whole map constant-
    folds to a single Literal, so an ``element_at(map, key)`` lookup
    replaces a model-sized broadcast-join relation without the
    per-row join or the per-element ``F.lit`` tax."""
    return F.expr(bigint_map_sql(pairs))
