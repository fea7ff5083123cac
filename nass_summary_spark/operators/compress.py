"""Compression-ratio quality signal (SURVEY.md §2 B92).

Large-corpus curation pipelines use a document's zlib/deflate
compressibility as a cheap redundancy detector: machine-generated
boilerplate, keyword stuffing, and template spam compress far
better than natural prose, while high-entropy binary-ish junk
compresses worse (Gopher's and RefinedWeb's published filter rules
both carry a compression-ratio band). The reference has no
counterpart — this is one of the scale additions §2 calls out.

Spark shape: a ``mapInPandas`` pass — Arrow-batched, one Python
worker call per ~10k-row batch, zero shuffle (pure projection).
zlib at a FIXED level is deterministic for a given zlib build, so
the output is stable run-to-run and machine-to-machine with the
same wheel set, but it is NOT portable SQL — the query registers as
a rows-only check, with pytest pinning the semantics (bounds,
monotonicity on repetitive vs random text, determinism).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Fixed deflate level: determinism matters more than ratio here.
_LEVEL = 6

_SCHEMA = (
    "doc_id bigint, n_bytes bigint, n_compressed bigint, "
    "ratio double, flag_repetitive boolean, flag_entropy boolean"
)


def compressibility_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    low: float = 0.30,
    high: float = 1.00,
) -> DataFrame:
    """Per-document deflate ratio ``compressed/raw`` (UTF-8 bytes)
    with the two band flags curation rules key on:
    ``flag_repetitive`` (ratio < low — suspiciously redundant) and
    ``flag_entropy`` (ratio > high — incompressible junk).

    Ratio is rounded to 6 dp AFTER the exact integer byte counts are
    emitted, so downstream re-derivation is always possible.
    """
    sub = docs.select(
        F.col(id_col).cast("bigint").alias("doc_id"),
        F.col(text_col).alias("text"),
    )

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import zlib

        for pdf in it:
            raw = [
                (s if isinstance(s, str) else "").encode("utf-8")
                for s in pdf["text"].tolist()
            ]
            n_bytes = [len(b) for b in raw]
            n_comp = [len(zlib.compress(b, _LEVEL)) for b in raw]
            ratio = [
                round(c / b, 6) if b else None
                for b, c in zip(n_bytes, n_comp)
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n_bytes,
                    "n_compressed": n_comp,
                    "ratio": ratio,
                    "flag_repetitive": [
                        r is not None and r < low for r in ratio
                    ],
                    "flag_entropy": [
                        r is not None and r > high for r in ratio
                    ],
                }
            )

    return sub.mapInPandas(_batches, schema=_SCHEMA)
