"""Persisted product-quantization index (SURVEY.md §2 B103) —
completing the index family's other half: B101 persisted the IVF
coarse quantizer, but B52/B60's PQ codebooks were still recomputed
per run. Here the codebooks are trained ONCE (``pq_train``'s
deterministic sample-then-Lloyd, the FAISS recipe) and persisted
with the encoded corpus, then every query batch ADC-probes the index
from disk.

Layout at ``index_path``:

* ``codebooks/`` — (subspace, code, pos, value): the m×ksub×dsub
  model, driver-small like the IVF centroids.
* ``params/`` — one row (dim, m, ksub): the geometry sidecar. Like
  dedup_index's params file it makes a mismatched probe (an index
  built under different PQ geometry) fail loudly instead of
  returning silently wrong distances.
* ``codes/`` — (id, code0..code{m-1}) parquet: 8 bytes/vector
  replaces 256 — THE relation a production pipeline rescans. At
  100 TB of raw vectors the codes table is ~3 TB; an ADC probe
  scans codes only and never touches raw vectors.

Evidence (tests/test_pq_index.py): a disk probe is row-identical to
the in-memory ``ann_topk_pq`` (both train on the same deterministic
sample, so the codebooks agree bit-for-bit); the extend cycle
encodes with the STORED codebooks; params mismatch raises.

No reference counterpart (the reference is a SQL summary pipeline);
method from Jégou, Douze & Schmid, "Product Quantization for
Nearest Neighbor Search", TPAMI 2011 — public literature.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nass_summary_spark.functions.smalldf import local_struct_df

from nass_summary_spark.operators.pq import pq_encode, pq_train


def build_pq_index(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    index_path: str,
    dim: int,
    m: int = 8,
    ksub: int = 16,
    n_iter: int = 4,
    sample_size: int = 65536,
) -> None:
    """Train codebooks on the deterministic sample and persist
    codebooks + params + the encoded corpus. Training cost is
    sample-bounded; ENCODING covers the full corpus (one Arrow map
    stage + the write)."""
    spark = df.sparkSession
    books = pq_train(
        df, id_col, vec_col, dim, m=m, ksub=ksub, n_iter=n_iter,
        sample_size=sample_size,
    )
    local_struct_df(
        spark,
        "subspace int, code int, pos int, value double",
        [
            (int(s), int(c), int(p), float(v))
            for s, book in enumerate(books)
            for c, cent in enumerate(book)
            for p, v in enumerate(cent)
        ],
    ).coalesce(1).write.mode("overwrite").parquet(f"{index_path}/codebooks")
    local_struct_df(
        spark, "dim int, m int, ksub int", [(int(dim), int(m), int(ksub))]
    ).coalesce(1).write.mode("overwrite").parquet(f"{index_path}/params")
    (
        pq_encode(df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec")),
                  "id", "vec", books)
        .write.mode("overwrite")
        .parquet(f"{index_path}/codes")
    )


def load_pq_codebooks(
    spark: SparkSession, index_path: str
) -> tuple[list[list[list[float]]], dict]:
    """Read the model back (model-sized collect): (codebooks,
    {"dim", "m", "ksub"})."""
    p = spark.read.parquet(f"{index_path}/params").collect()[0]
    params = {"dim": p["dim"], "m": p["m"], "ksub": p["ksub"]}
    dsub = params["dim"] // params["m"]
    books = [
        [[0.0] * dsub for _ in range(params["ksub"])]
        for _ in range(params["m"])
    ]
    rows = spark.read.parquet(f"{index_path}/codebooks").collect()
    # a codebooks relation whose geometry disagrees with the params
    # sidecar means the index mixes generations — fail loudly here,
    # before any probe can score with misaligned tables
    if len(rows) != params["m"] * params["ksub"] * dsub or any(
        r["subspace"] >= params["m"]
        or r["code"] >= params["ksub"]
        or r["pos"] >= dsub
        for r in rows
    ):
        raise ValueError(
            f"pq_index geometry mismatch at {index_path}: params say "
            f"(dim={params['dim']}, m={params['m']}, "
            f"ksub={params['ksub']}) but the codebooks table has "
            f"{len(rows)} entries — the index mixes generations; "
            "rebuild it"
        )
    for r in rows:
        books[r["subspace"]][r["code"]][r["pos"]] = r["value"]
    return books, params


def _check_codes_geometry(codes: DataFrame, params: dict, index_path: str) -> None:
    """Loud-fail on a mixed-generation index: the codes table's
    columns must match the params sidecar's ``m`` (code0..code{m-1}).
    A codes relation written under a different PQ geometry would
    otherwise score with misaligned LUT indices — silently wrong
    distances, the exact failure dedup_index's params guard exists
    to prevent."""
    want = {f"code{s}" for s in range(params["m"])}
    have = {c for c in codes.columns if c.startswith("code")}
    if have != want:
        raise ValueError(
            f"pq_index geometry mismatch at {index_path}: params say "
            f"m={params['m']} but codes table has columns "
            f"{sorted(have)} — the index mixes generations; rebuild it"
        )


def extend_pq_index(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    index_path: str,
) -> None:
    """Append new vectors encoded with the STORED codebooks (codes
    must stay comparable to what queries ADC-score against). Like
    any appending sink, periodic compaction restores file sizes;
    under distribution drift the quantization error grows — re-train
    by rebuilding, the PQ analog of ``rebalance_ann_index``."""
    books, _params = load_pq_codebooks(df.sparkSession, index_path)
    (
        pq_encode(df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec")),
                  "id", "vec", books)
        .write.mode("append")
        .parquet(f"{index_path}/codes")
    )


def pq_index_probe(
    spark: SparkSession,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    index_path: str,
    k: int = 5,
    collect_queries: bool | str = "auto",
    exclude_ids: DataFrame | None = None,
) -> DataFrame:
    """ADC top-k of each query against the persisted codes — the
    disk twin of ``ann_topk_pq(rerank=0)``, scoring 8-byte codes via
    per-query lookup tables without ever reading raw vectors.
    Returns (query_id, neighbor_id, approx_dist2, rnk), identical
    ranking rules (dist asc, id asc).

    ``exclude_ids`` (single ``id`` column, batch-sized broadcast)
    removes stored codes from the candidate side BEFORE ranking —
    the same crash-replay contract as ``ann_index_probe``."""
    from nass_summary_spark.operators.pq import _adc_rank

    books, params = load_pq_codebooks(spark, index_path)
    codes = spark.read.parquet(f"{index_path}/codes")
    _check_codes_geometry(codes, params, index_path)
    if exclude_ids is not None:
        codes = codes.join(
            F.broadcast(exclude_ids.select("id")), "id", "left_anti"
        )
    ranked = _adc_rank(
        spark,
        codes,
        queries,
        id_col,
        vec_col,
        books,
        params["dim"],
        collect_queries=collect_queries,
        code_id_col="id",
    )
    return ranked.where(F.col("rnk") <= k)
