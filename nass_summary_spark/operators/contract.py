"""Data-contract validation (SURVEY.md §2 B97).

The ingest gate every 100 TB pipeline runs before publishing a
batch: row-level predicates (ranges, nullability, regex), key
uniqueness, and referential integrity against a parent table — as a
VIOLATIONS REPORT (rule, count, rate), not a crash, so the gate can
decide quarantine / block / alert per rule.

Spark shape, one pass per rule CLASS (not per rule):

* all row-level predicates fold into ONE conditional aggregate over
  a single scan — adding a rule adds a column, never a pass;
* uniqueness is ``n_rows - n_distinct(keys)`` from one combinable
  aggregate (no self-join);
* referential integrity is a LEFT ANTI count against the parent
  keys projection — the parent is column-pruned to its key before
  the join, and Catalyst/AQE picks broadcast vs shuffle by parent
  size.

The report unions to a handful of rows regardless of table size.
Reference twin: the staging→typed promotion in quickstats.sql:64-91
enforces its contract by failing the load; this is the
report-and-decide re-expression.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def contract_violations(
    df: DataFrame,
    row_rules: Mapping[str, Column],
    unique_keys: Sequence[str] = (),
    ref: tuple[DataFrame, str, str] | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Validate ``df`` and return one row per rule:
    ``rule, n_violations, n_rows, violation_rate``.

    ``row_rules`` maps rule name → VIOLATION predicate (true = the
    row breaks the contract). ``unique_keys`` adds a
    ``unique:<cols>`` rule counting rows beyond the first per key.
    ``ref=(parent, fk_col, pk_col)`` adds a ``ref:<fk>`` rule
    counting child rows whose key is absent from the parent
    (NULL foreign keys are not orphans — gate those with an
    explicit not-null row rule).
    """
    if not row_rules and not unique_keys and ref is None:
        raise ValueError("contract_violations: no rules given")
    extras = []
    out = None
    if row_rules:
        aggs = [F.count(F.lit(1)).cast("bigint").alias("__n")]
        names = list(row_rules)
        for i, (name, pred) in enumerate(row_rules.items()):
            aggs.append(
                F.count(F.when(pred, F.lit(1))).cast("bigint").alias(f"__v{i}")
            )
        base = df.agg(*aggs)
        # unpivot the single summary row to (rule, n_violations)
        pairs = F.array(
            *[
                F.struct(
                    F.lit(name).alias("rule"),
                    F.col(f"__v{i}").alias("n_violations"),
                )
                for i, name in enumerate(names)
            ]
        )
        out = base.select(
            F.explode(pairs).alias("p"), F.col("__n").alias("n_rows")
        ).select(
            F.col("p.rule").alias("rule"),
            F.col("p.n_violations").alias("n_violations"),
            "n_rows",
        )
    if unique_keys:
        # distinct over the key STRUCT, not the bare columns:
        # count_distinct(a, b) drops tuples with any NULL field, so a
        # unique NULL-keyed row would be miscounted as a duplicate
        # (and diverge from SQL COUNT(DISTINCT (a, b)), which counts
        # null-bearing row-structs)
        uq = df.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.count_distinct(F.struct(*[F.col(c) for c in unique_keys]))
            .cast("bigint")
            .alias("__d"),
        ).select(
            F.lit("unique:" + ",".join(unique_keys)).alias("rule"),
            (F.col("n_rows") - F.col("__d")).alias("n_violations"),
            "n_rows",
        )
        extras.append(uq)
    if ref is not None:
        parent, fk, pk = ref
        child_keys = df.where(F.col(fk).isNotNull()).select(fk)
        orphans = child_keys.join(
            parent.select(F.col(pk).alias(fk)), on=fk, how="left_anti"
        )
        rf = orphans.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_violations")
        ).crossJoin(
            df.agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
        ).select(F.lit(f"ref:{fk}").alias("rule"), "n_violations", "n_rows")
        extras.append(rf)
    for e in extras:
        out = e if out is None else out.unionByName(e)
    return out.select(
        "rule",
        "n_violations",
        "n_rows",
        F.round(
            F.col("n_violations").cast("double")
            / F.col("n_rows").cast("double"),
            round_to,
        ).alias("violation_rate"),
    )
