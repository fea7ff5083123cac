"""Fast driver-local model relations.

``spark.createDataFrame(rows)`` routes tiny driver-side data (index
model tables, probe lists, parameter sidecars) through a pickled
Python parallelize — on this stack every JOB over such a relation
pays a multi-second Python-runner round trip (measured ~5-6 s per
tiny model write vs 0.2 s for the identical write from
``spark.range``; the probe-list joins inside the index probes paid
the same tax). ``local_struct_df`` builds the relation instead as
ONE SQL expression string — ``explode(array(named_struct(...), ...))``
— which parses in milliseconds and evaluates entirely JVM-side, the
same device the session already uses for centroid/LUT literals (a
per-element ``F.lit`` chain is a py4j tarpit; one expr string is
not).

Supported field types: int, bigint, double, string, boolean,
array<double> — the model-relation types the index family persists
(``_SUPPORTED_TYPES``; validated at parse time on every code path,
including empty ``rows``). Values must be driver-small (the
expression ships with the plan)."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


#: The model-relation types the index family persists. Parsing and
#: rendering both validate against this set, so a parameterized type
#: (e.g. ``decimal(10,2)``) fails loudly up front on every code path
#: — including the empty-``rows`` one, which never reaches
#: ``_render``.
_SUPPORTED_TYPES = frozenset(
    {"int", "bigint", "double", "string", "boolean", "array<double>"}
)


def _render(value, ftype: str) -> str:
    if value is None:
        return f"CAST(NULL AS {ftype})"
    if ftype == "int":
        return str(int(value))
    if ftype == "bigint":
        return f"{int(value)}L"
    if ftype == "double":
        # repr round-trips the exact double; D marks a double literal
        return f"{float(value)!r}D"
    if ftype == "string":
        escaped = str(value).replace("\\", "\\\\").replace("'", "\\'")
        return f"'{escaped}'"
    if ftype == "boolean":
        return "true" if value else "false"
    if ftype == "array<double>":
        return "array(" + ",".join(f"{float(x)!r}D" for x in value) + ")"
    raise ValueError(f"local_struct_df: unsupported field type {ftype!r}")


def local_struct_df(
    spark: SparkSession, schema: str, rows: Sequence[tuple]
) -> DataFrame:
    """Build a small DataFrame from driver-local ``rows`` as one
    JVM-side expression. ``schema`` is a DDL string like
    ``"cell int, pos int, value double"``; every job over the result
    runs without a Python stage (unlike ``createDataFrame``)."""
    fields = []
    for part in schema.split(","):
        name, ftype = part.strip().split(maxsplit=1)
        ftype = ftype.strip().lower()
        if ftype not in _SUPPORTED_TYPES:
            raise ValueError(
                f"local_struct_df: unsupported field type {ftype!r}"
            )
        fields.append((name, ftype))
    if not rows:
        # explode(array()) cannot carry a struct type; produce the
        # empty frame through a filtered literal row instead — one
        # selectExpr item per parsed field, never re-split from a
        # rendered string
        return (
            spark.range(1)
            .selectExpr(*[f"CAST(NULL AS {t}) AS {n}" for n, t in fields])
            .where(F.lit(False))
        )
    structs = ",".join(
        "named_struct("
        + ",".join(
            f"'{n}',{_render(v, t)}" for (n, t), v in zip(fields, row)
        )
        + ")"
        for row in rows
    )
    return (
        spark.range(1)
        .select(F.expr(f"explode(array({structs}))").alias("__s"))
        .select(*[F.col(f"__s.{n}").alias(n) for n, _ in fields])
    )
