"""Distributed dense linear algebra over embedding columns: exact
Gram/covariance accumulation with a model-sized reduce, and the PCA
projection built on it.

The scale shape (the only one that survives 100 TB of vectors): the
*data* never shuffles.  Each Arrow batch is reduced to one partial
statistics row — ``n``, the d-vector of sums, and the d×d Gram matrix
``XᵀX`` (a single BLAS-3 ``matmul`` per batch) — so what crosses the
wire is ``partitions × (d² + d + 1)`` doubles regardless of row
count.  A second, long-form explode of those partials (bounded by the
same product) lets one ordinary ``groupBy(pos).sum`` finish the
reduction; Catalyst partial aggregation makes it a tree reduce.  The
covariance matrix itself is then assembled from the aggregated sums
with broadcast joins over d² rows — model-sized, never data-sized.

PCA: the d×d covariance is collected to the driver (model parameters,
same O(d²) footprint a broadcast would ship), eigendecomposed with
numpy, and the top-k components are broadcast back as literal
expressions; the projection is a pure map stage.  This is exactly how
sklearn-on-a-laptop PCA generalizes to a cluster without a single
wide shuffle.

Reference anchor: budget.r's analysis layer computes summary moments
over the NASS pulls (budget.r:40-70's aggregation passes); this is
the vector-valued generalization the LLM-pipeline block needs
(embedding whitening / decorrelation before ANN or SemDeDup).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StructField,
    StructType,
)

from nass_summary_spark.functions.lits import double_array

_PARTIAL_SCHEMA = StructType(
    [
        StructField("pos", IntegerType(), False),
        StructField("val", DoubleType(), False),
    ]
)


def gram_sums(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """One row per statistic position: pos 0 = row count, pos 1..d =
    per-dimension sums, pos d+1 .. d+d² = row-major Gram entries.

    The heavy lifting (``X.T @ X``) is vectorized numpy over each
    Arrow batch; the emitted partials are long-form so the finishing
    aggregation is a plain ``groupBy(pos).sum(val)`` — partial
    aggregation on the map side keeps the exchange at
    ``shuffle_partitions × (d²+d+1)`` rows.
    """

    def partials(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd

        pos = np.arange(dim * dim + dim + 1, dtype="int32")
        for b in batches:
            if not len(b):
                continue
            x = np.vstack(b[vec_col].to_numpy()).astype("float64")
            vals = np.concatenate(
                ([float(len(x))], x.sum(axis=0), (x.T @ x).ravel())
            )
            yield pd.DataFrame({"pos": pos, "val": vals})

    long = df.select(vec_col).mapInPandas(partials, _PARTIAL_SCHEMA)
    return long.groupBy("pos").agg(F.sum("val").alias("val"))


def covariance_long(
    df: DataFrame, vec_col: str, dim: int, round_dp: int = 8
) -> DataFrame:
    """Population covariance in long form: ``(i, j, cov)`` for the
    upper triangle i ≤ j, cov = E[x_i x_j] − E[x_i]E[x_j], rounded so
    the ≈1e-15 summation-order noise between engines cannot flip a
    value hash.  Everything past :func:`gram_sums` is model-sized
    (d² rows) — the joins below are broadcast by construction.
    """
    sums = gram_sums(df, vec_col, dim)
    n = sums.where(F.col("pos") == 0).select(F.col("val").alias("n"))
    means = sums.where((F.col("pos") >= 1) & (F.col("pos") <= dim)).select(
        (F.col("pos") - 1).alias("i"), F.col("val").alias("s")
    )
    gram = sums.where(F.col("pos") > dim).select(
        ((F.col("pos") - dim - 1) / dim).cast("int").alias("i"),
        ((F.col("pos") - dim - 1) % dim).cast("int").alias("j"),
        F.col("val").alias("g"),
    )
    si = means.select(F.col("i"), F.col("s").alias("si"))
    sj = means.select(F.col("i").alias("j"), F.col("s").alias("sj"))
    return (
        gram.where(F.col("i") <= F.col("j"))
        .join(F.broadcast(si), "i")
        .join(F.broadcast(sj), "j")
        .join(F.broadcast(n))
        .select(
            "i",
            "j",
            F.round(
                (F.col("g") - F.col("si") * F.col("sj") / F.col("n"))
                / F.col("n"),
                round_dp,
            ).alias("cov"),
        )
    )


def pca_model(
    df: DataFrame, vec_col: str, dim: int, k: int
) -> tuple[list[float], list[list[float]], list[float]]:
    """Train the PCA model: returns (mean vector, top-k components
    rows, top-k eigenvalues).  Only the d²-entry statistics table is
    collected — model parameters, never data rows.  Component sign is
    fixed deterministically (largest-|coordinate| entry positive) so
    repeated runs and different BLAS builds agree.
    """
    import numpy as np

    rows = gram_sums(df, vec_col, dim).collect()
    stats = {r["pos"]: r["val"] for r in rows}
    n = stats[0]
    mean = np.array([stats[1 + i] for i in range(dim)]) / n
    gram = np.array(
        [[stats[1 + dim + i * dim + j] for j in range(dim)] for i in range(dim)]
    )
    cov = gram / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = []
    for idx in order:
        v = evecs[:, idx]
        if v[int(np.argmax(np.abs(v)))] < 0:
            v = -v
        comps.append([float(x) for x in v])
    return (
        [float(x) for x in mean],
        comps,
        [float(evals[i]) for i in order],
    )


def pca_project(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    mean: list[float],
    components: list[list[float]],
    round_dp: int = 6,
) -> DataFrame:
    """Project each vector onto the supplied components: a pure
    Catalyst map stage — centred dot products via ``zip_with`` +
    ``aggregate`` (JVM codegen, no UDF), components ride the plan as
    literals exactly like a broadcast model.  Emits scalar columns
    ``pc0..pc{k-1}`` (rounded) so downstream hashing/writing needs no
    array support.
    """
    centred = F.zip_with(
        F.col(vec_col),
        double_array(mean),
        lambda v, m: v.cast("double") - m,
    )
    out = df.select(id_col, centred.alias("__c"))
    for i, comp in enumerate(components):
        dot = F.aggregate(
            F.zip_with(
                F.col("__c"),
                double_array(comp),
                lambda a, b: a * b,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        out = out.withColumn(f"pc{i}", F.round(dot, round_dp))
    return out.drop("__c")


def whiten_project(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int,
    eps: float = 1e-9,
    round_dp: int = 6,
) -> DataFrame:
    """PCA whitening: project onto the top-k principal components and
    rescale each coordinate by 1/√eigenvalue, so the output
    coordinates have unit variance and zero correlation — the
    standard embedding preprocessing before cosine retrieval and
    clustering (dominant directions stop drowning out the rest; the
    retrieval-benchmark "whitening trick").

    Same scale shape as :func:`pca_project`: the model (mean,
    scaled components) trains from the d²-sized statistics reduction
    and rides the plan as literals; the projection is a pure
    Catalyst map stage.  Emits ``wc0..wc{k-1}``.
    """
    mean, comps, evals = pca_model(df, vec_col, dim, k)
    scaled = [
        [c / float((ev + eps) ** 0.5) for c in comp]
        for comp, ev in zip(comps, evals)
    ]
    out = pca_project(df, id_col, vec_col, mean, scaled, round_dp=round_dp)
    return out.select(
        id_col, *[F.col(f"pc{i}").alias(f"wc{i}") for i in range(k)]
    )
