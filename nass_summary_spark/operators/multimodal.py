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
    ArrayType,
    BinaryType,
    DoubleType,
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


def _parse_bmp(raw: bytes) -> tuple[int, int] | None:
    """Parse a Windows BMP (BITMAPINFOHEADER) → (width, height).

    Real byte-level container parsing, stdlib only: 'BM' magic, file
    size sanity vs the header-declared size at offset 2, then the
    signed-int32 little-endian dimensions at offsets 18/22."""
    import struct

    if len(raw) < 54 or raw[:2] != b"BM":
        return None
    declared = struct.unpack_from("<I", raw, 2)[0]
    if declared != len(raw):
        return None
    width, height = struct.unpack_from("<ii", raw, 18)
    # negative height = top-down row order; dims are abs()
    return abs(width), abs(height)


def _parse_wav(raw: bytes) -> tuple[int, int] | None:
    """Parse a RIFF/WAVE header → (sample_rate, n_channels) by
    walking the chunk list to the 'fmt ' chunk (PCM layout)."""
    import struct

    if len(raw) < 44 or raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        return None
    pos = 12
    while pos + 8 <= len(raw):
        cid, size = raw[pos : pos + 4], struct.unpack_from("<I", raw, pos + 4)[0]
        if cid == b"fmt " and pos + 8 + 16 <= len(raw):
            _fmt, channels, rate = struct.unpack_from("<HHI", raw, pos + 8)
            return rate, channels
        pos += 8 + size + (size & 1)
    return None


def decode_batch(df: DataFrame, id_col: str, blob_col: str, fake: bool = True) -> DataFrame:
    """Decode blobs to (format, dims, checksum) via Arrow-batched
    ``mapInPandas``.

    ``fake=False`` is a REAL decode for the containers parseable with
    the stdlib: BMP (width/height from BITMAPINFOHEADER) and RIFF/WAVE
    (width=sample_rate, height=n_channels from the fmt chunk — the
    schema's two dimension slots carry the container's natural typed
    metadata). Unsupported or corrupt blobs yield null dims rather
    than failing the job — per-row error tolerance is the behavior a
    100 TB decode pass needs. Compressed-image codecs (jpeg/png) still
    need an external library; those blobs come back null-dimmed too.

    ``fake=True`` derives deterministic pseudo-dimensions from the
    checksum — the zero-dependency mode the generic pipeline tests
    use. Either way the batch shape — iterator of pandas DataFrames,
    one in-flight batch per task — bounds decoder memory.
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
                if raw[:2] == b"BM":
                    fmt = "bmp"
                else:
                    for name, magic in MAGIC_PREFIXES.items():
                        if raw.startswith(magic):
                            fmt = name
                            break
                if fake:
                    width: int | None = int(digest[:4], 16) % 4096
                    height: int | None = int(digest[4:8], 16) % 4096
                else:
                    dims = None
                    if fmt == "bmp":
                        dims = _parse_bmp(raw)
                    elif fmt == "riff":
                        dims = _parse_wav(raw)
                        if dims is not None:
                            fmt = "wav"
                    width, height = dims if dims is not None else (None, None)
                out.append(
                    {
                        "item_id": int(item_id),
                        "format": fmt,
                        "n_bytes": len(raw),
                        "width": width,
                        "height": height,
                        "checksum": digest,
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in DECODED_SCHEMA.fields])

    return df.select(F.col(id_col), F.col(blob_col)).mapInPandas(decode, DECODED_SCHEMA)


def synthesize_container_blobs(df: DataFrame, id_col: str) -> DataFrame:
    """Manufacture REAL container blobs (byte-exact BMP / WAV files,
    stdlib ``struct``) with dimensions derived deterministically from
    the id, so a closed-form oracle can predict what a real parse
    must return:

    * ``id % 3 == 0`` → PCM WAV: rate ``8000 + (id%5)*1000``,
      channels ``1 + id%2``, 16-bit, ``100 + id%50`` frames
      → file size ``44 + frames*channels*2``.
    * else → 24bpp BMP: width ``(id%21)+4``, height ``(id*7)%13+2``,
      row stride padded to 4 bytes
      → file size ``54 + ((w*3+3)//4*4)*h``.

    The generator and the ``decode_batch(fake=False)`` parser share
    no code — the writer packs headers field-by-field, the reader
    unpacks them — so round-trip agreement with the arithmetic
    oracle genuinely certifies both."""

    def synth(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:  # noqa: F821
        import struct

        import pandas as pd

        for pdf in batches:
            ids, blobs = [], []
            for item_id in pdf[id_col]:
                i = int(item_id)
                if i % 3 == 0:
                    rate = 8000 + (i % 5) * 1000
                    channels = 1 + i % 2
                    frames = 100 + i % 50
                    data = b"\x00" * (frames * channels * 2)
                    blob = (
                        b"RIFF"
                        + struct.pack("<I", 36 + len(data))
                        + b"WAVE"
                        + b"fmt "
                        + struct.pack(
                            "<IHHIIHH", 16, 1, channels, rate,
                            rate * channels * 2, channels * 2, 16,
                        )
                        + b"data"
                        + struct.pack("<I", len(data))
                        + data
                    )
                else:
                    width = (i % 21) + 4
                    height = (i * 7) % 13 + 2
                    stride = (width * 3 + 3) // 4 * 4
                    size = 54 + stride * height
                    blob = (
                        b"BM"
                        + struct.pack("<IHHI", size, 0, 0, 54)
                        + struct.pack(
                            "<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                            stride * height, 2835, 2835, 0, 0,
                        )
                        + b"\x00" * (stride * height)
                    )
                ids.append(i)
                blobs.append(blob)
            yield pd.DataFrame({"item_id": ids, "blob": blobs})

    schema = StructType(
        [StructField("item_id", LongType()), StructField("blob", BinaryType())]
    )
    return df.select(F.col(id_col)).mapInPandas(synth, schema)


def with_binary_column(df: DataFrame, text_col: str, out_col: str = "blob") -> DataFrame:
    """Manufacture a binary column from text (UTF-8 encode) — lets the
    multimodal plumbing run against the text-only test tables."""
    return df.withColumn(out_col, F.encode(F.col(text_col), "UTF-8").cast(BinaryType()))

FEATURES_SCHEMA = StructType(
    [
        StructField("item_id", LongType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def byte_histogram_features(
    df: DataFrame, id_col: str, blob_col: str, n_bins: int = 16
) -> DataFrame:
    """REAL feature extraction (no codec needed): an L1-normalized
    byte-value histogram per blob as ``array<double>`` — the
    multimodal stand-in for an image/audio feature vector, computed
    vectorized (numpy ``frombuffer`` + ``bincount``) over Arrow
    batches. The output column feeds the embedding operators
    (cosine dedup, ANN, k-means) unchanged."""
    bin_width = 256 // n_bins

    def extract(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, feats = [], []
            for item_id, blob in zip(pdf[id_col], pdf[blob_col]):
                raw = np.frombuffer(bytes(blob) if blob is not None else b"", dtype=np.uint8)
                hist = np.bincount(raw // bin_width, minlength=n_bins).astype("float64")
                total = hist.sum()
                ids.append(int(item_id))
                feats.append(list(hist / total if total else hist))
            yield pd.DataFrame({"item_id": ids, "features": feats})

    return df.select(F.col(id_col), F.col(blob_col)).mapInPandas(extract, FEATURES_SCHEMA)


FRAMES_SCHEMA = StructType(
    [
        StructField("item_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def frame_sample(
    df: DataFrame,
    id_col: str,
    blob_col: str,
    frame_bytes: int = 64,
    stride: int = 4,
) -> DataFrame:
    """Frame sampling plumbing: emit every ``stride``-th fixed-size
    window of each blob as its own row — the fan-out shape of video
    frame-sampling (one input row → many frame rows, Arrow-batched,
    bounded memory per task). With a real codec the window slicer is
    replaced by a decoder; the schema, batch contract, and downstream
    per-frame processing stay identical."""

    def sample(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            out = []
            for item_id, blob in zip(pdf[id_col], pdf[blob_col]):
                raw = bytes(blob) if blob is not None else b""
                n_frames = max((len(raw) + frame_bytes - 1) // frame_bytes, 0)
                for idx in range(0, n_frames, stride):
                    out.append(
                        {
                            "item_id": int(item_id),
                            "frame_idx": idx,
                            "frame": raw[idx * frame_bytes : (idx + 1) * frame_bytes],
                        }
                    )
            yield pd.DataFrame(out, columns=[f.name for f in FRAMES_SCHEMA.fields])

    return df.select(F.col(id_col), F.col(blob_col)).mapInPandas(sample, FRAMES_SCHEMA)


def resize_batch(
    df: DataFrame,
    id_col: str,
    blob_col: str,
    target_bytes: int = 256,
    fake: bool = True,
) -> DataFrame:
    """Resize stub: with a real imaging library this re-encodes each
    blob at a target resolution; here ``fake=True`` truncates /
    zero-pads to ``target_bytes`` so the contract (binary in → fixed
    -budget binary out, same cardinality) is testable. ``fake=False``
    raises until a codec is installed."""
    schema = StructType(
        [StructField("item_id", LongType()), StructField("resized", BinaryType())]
    )

    def resize(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            out = []
            for item_id, blob in zip(pdf[id_col], pdf[blob_col]):
                if not fake:
                    raise NotImplementedError(
                        "real resize requires an imaging library (e.g. PIL); "
                        "install one and replace the fake path"
                    )
                raw = bytes(blob) if blob is not None else b""
                resized = raw[:target_bytes].ljust(target_bytes, b"\x00")
                out.append({"item_id": int(item_id), "resized": resized})
            yield pd.DataFrame(out, columns=["item_id", "resized"])

    return df.select(F.col(id_col), F.col(blob_col)).mapInPandas(resize, schema)
