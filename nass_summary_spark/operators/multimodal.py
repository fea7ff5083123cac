"""Multimodal (binary) column handling (SURVEY.md §2 B12).

Images / audio / video ride through the engine as opaque ``binary``
columns plus typed metadata. The Spark-side plumbing here is real —
schemas, Arrow-batched ``mapInPandas``, partition-sized batches; the
actual codec work is stubbed (this container has no image/audio
libraries) behind a deterministic fake so the pipeline shape is
testable end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Magic prefixes for cheap JVM-side format sniffing.
MAGIC_PREFIXES: dict[str, bytes] = {
    "png": b"\x89PNG",
    "jpeg": b"\xff\xd8\xff",
    "gif": b"GIF8",
    "riff": b"RIFF",  # wav/avi containers
    "pdf": b"%PDF",
}

DECODED_SCHEMA = StructType(
    [
        StructField("item_id", LongType()),
        StructField("format", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("checksum", StringType()),
    ]
)


def binary_metadata(df: DataFrame, id_col: str, blob_col: str) -> DataFrame:
    """JVM-side metadata over a binary column: byte length, sniffed
    format, md5 checksum. No Python in the loop — this is the cheap
    pass that runs over ALL blobs before any decode fan-out."""
    blob = F.col(blob_col)
    fmt = F.lit("unknown")
    for name, magic in reversed(MAGIC_PREFIXES.items()):
        hexs = magic.hex()
        fmt = F.when(F.hex(F.substring(blob, 1, len(magic))) == hexs.upper(), F.lit(name)).otherwise(fmt)
    return df.select(
        F.col(id_col).alias("item_id"),
        F.length(blob).cast("bigint").alias("n_bytes"),
        fmt.alias("format"),
        F.md5(blob).alias("checksum"),
    )


def decode_batch(df: DataFrame, id_col: str, blob_col: str, fake: bool = True) -> DataFrame:
    """Decode blobs to (format, dims, checksum) via Arrow-batched
    ``mapInPandas``.

    ``fake=True`` (the only mode available in this container) derives
    deterministic pseudo-dimensions from the checksum; ``fake=False``
    is the integration point for a real codec (PIL/libav) and raises
    until one is installed. The batch shape — iterator of pandas
    DataFrames, one in-flight batch per task — is exactly what a real
    decoder needs to bound memory.
    """

    def decode(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:  # noqa: F821
        import hashlib

        import pandas as pd

        for pdf in batches:
            out = []
            for item_id, blob in zip(pdf[id_col], pdf[blob_col]):
                raw = bytes(blob) if blob is not None else b""
                digest = hashlib.md5(raw).hexdigest()
                fmt = "unknown"
                for name, magic in MAGIC_PREFIXES.items():
                    if raw.startswith(magic):
                        fmt = name
                        break
                if not fake:
                    raise NotImplementedError(
                        "real decode requires an image/audio codec library; "
                        "install one and pass a decoder"
                    )
                out.append(
                    {
                        "item_id": int(item_id),
                        "format": fmt,
                        "n_bytes": len(raw),
                        # deterministic fake dims from the digest
                        "width": int(digest[:4], 16) % 4096,
                        "height": int(digest[4:8], 16) % 4096,
                        "checksum": digest,
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in DECODED_SCHEMA.fields])

    return df.select(F.col(id_col), F.col(blob_col)).mapInPandas(decode, DECODED_SCHEMA)


def with_binary_column(df: DataFrame, text_col: str, out_col: str = "blob") -> DataFrame:
    """Manufacture a binary column from text (UTF-8 encode) — lets the
    multimodal plumbing run against the text-only test tables."""
    return df.withColumn(out_col, F.encode(F.col(text_col), "UTF-8").cast(BinaryType()))
