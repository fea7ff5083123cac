"""Audio signal features over decoded PCM (B12's audio half).

Until now the audio column was container-metadata only
(operators/multimodal.py ``_parse_wav`` → rate/channels); this
module decodes the PCM samples themselves and extracts the classic
first-pass curation features, making the audio column first-class
the way images are (VERDICT r8 item 5):

* ``n_samples`` — exact frame count from the data chunk;
* ``peak`` — max |sample| (exact integer);
* ``zero_crossings`` — sign-change count (exact integer; the cheap
  voicing / noisiness proxy);
* ``rms_q`` — root-mean-square amplitude quantized to micro-units
  (``floor(sqrt(Σs²/n)·1e6 + 0.5)`` — the transcendental-to-fixed-
  point device that makes sqrt pipelines exactly oracle-able);
* ``diff_energy`` — Σ(s[i]−s[i−1])² (exact BIGINT; first-difference
  energy, the FFT-free high-frequency proxy — a hiss-vs-hum measure
  that needs no spectral transform).

All features are per-row map-stage work over Arrow batches: no
shuffle, no state — at 100 TB this is a pure scan-stage projection,
the same posture as the Gopher text rules. Sample extraction walks
the RIFF chunk list to the ``data`` chunk (16-bit PCM little-endian,
channels interleaved; multi-channel blobs are analyzed on the
PER-FRAME CHANNEL SUM, the integer analog of the mono mixdown, which
keeps every feature exactly replayable in closed form).

The writer (:func:`synthesize_wav_pcm_blobs`) and this reader share
no code — the writer packs bytes field-by-field, the reader walks
chunks — so oracle agreement certifies both, exactly the
multimodal-BMP contract.
"""

from __future__ import annotations

import struct
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

#: fixed-point scale for the RMS (6 decimal places)
RMS_SCALE = 1_000_000


def synthesize_wav_pcm_blobs(df: DataFrame, id_col: str) -> DataFrame:
    """Byte-exact PCM WAV fixtures with NON-TRIVIAL samples (the
    all-zero synth of ``synthesize_container_blobs`` certifies
    headers; this one certifies the sample path).

    Mono 16-bit, rate ``8000 + (id % 5) · 1000``, ``160 + id % 48``
    frames, sample ``s(id,k) = ((31·id + 7·k² + 13·k) % 4093) −
    2046`` — a deterministic integer chirp whose squares, signs and
    first differences a DuckDB oracle reproduces in closed form.
    """
    schema = StructType(
        [
            StructField("item_id", LongType()),
            StructField("blob", BinaryType()),
        ]
    )

    def synth(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, blobs = [], []
            for item_id in pdf[id_col]:
                i = int(item_id)
                rate = 8000 + (i % 5) * 1000
                frames = 160 + i % 48
                k = np.arange(frames, dtype=np.int64)
                s = ((31 * i + 7 * k * k + 13 * k) % 4093) - 2046
                data = s.astype("<i2").tobytes()
                blob = (
                    b"RIFF"
                    + struct.pack("<I", 36 + len(data))
                    + b"WAVE"
                    + b"fmt "
                    + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
                    + b"data"
                    + struct.pack("<I", len(data))
                    + data
                )
                ids.append(i)
                blobs.append(blob)
            yield pd.DataFrame({"item_id": ids, "blob": blobs})

    return df.select(F.col(id_col)).mapInPandas(synth, schema)


def _wav_samples(raw: bytes):
    """RIFF/WAVE → (rate, per-frame channel-sum int64 array), or
    None for non-PCM-16 / malformed blobs. Chunk-walks to 'fmt ' and
    'data' independently (files may order them either way)."""
    import numpy as np

    if len(raw) < 44 or raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        return None
    rate = channels = None
    data = None
    pos = 12
    while pos + 8 <= len(raw):
        cid = raw[pos : pos + 4]
        size = struct.unpack_from("<I", raw, pos + 4)[0]
        body = raw[pos + 8 : pos + 8 + size]
        if cid == b"fmt " and size >= 16:
            fmt, channels, rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if fmt != 1 or bits != 16:
                return None
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if rate is None or channels is None or data is None or channels == 0:
        return None
    n = len(data) // (2 * channels) * channels
    s = np.frombuffer(data, dtype="<i2", count=n).astype(np.int64)
    frames = s.reshape(-1, channels).sum(axis=1)
    return rate, frames


def audio_features_batch(
    df: DataFrame, id_col: str, blob_col: str
) -> DataFrame:
    """Per-blob signal features (module docstring) — one Arrow map
    stage, NULL feature row for undecodable blobs."""
    schema = StructType(
        [
            StructField("item_id", LongType()),
            StructField("sample_rate", IntegerType()),
            StructField("n_samples", LongType()),
            StructField("peak", LongType()),
            StructField("zero_crossings", LongType()),
            StructField("rms_q", LongType()),
            StructField("diff_energy", LongType()),
        ]
    )

    def feats(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:  # noqa: F821
        import math

        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = []
            for item_id, blob in zip(pdf[id_col], pdf[blob_col]):
                raw = bytes(blob) if blob is not None else b""
                parsed = _wav_samples(raw)
                if parsed is None or len(parsed[1]) == 0:
                    out.append(
                        {
                            "item_id": int(item_id),
                            "sample_rate": None,
                            "n_samples": None,
                            "peak": None,
                            "zero_crossings": None,
                            "rms_q": None,
                            "diff_energy": None,
                        }
                    )
                    continue
                rate, s = parsed
                n = len(s)
                # sign convention: negative vs non-negative (matches
                # the oracle's CASE WHEN s < 0 exactly; a 0-sample is
                # "non-negative", so −1→0→1 counts ONE crossing)
                neg = s < 0
                zc = int((neg[1:] != neg[:-1]).sum())
                sumsq = int((s * s).sum())
                rms_q = int(
                    math.floor(
                        math.sqrt(sumsq / n) * RMS_SCALE + 0.5
                    )
                )
                d = s[1:] - s[:-1]
                out.append(
                    {
                        "item_id": int(item_id),
                        "sample_rate": int(rate),
                        "n_samples": n,
                        "peak": int(np.abs(s).max()),
                        "zero_crossings": zc,
                        "rms_q": rms_q,
                        "diff_energy": int((d * d).sum()),
                    }
                )
            yield pd.DataFrame(out)

    return df.select(F.col(id_col), F.col(blob_col)).mapInPandas(
        feats, schema
    )


#: fingerprint sample points -> FP_POINTS-1 = 56 diff-sign bits
FP_POINTS = 57


def audio_fingerprint_batch(
    df: DataFrame, id_col: str, blob_col: str, n_points: int = FP_POINTS
) -> DataFrame:
    """(item_id, afp) — 56-bit acoustic fingerprint per PCM blob,
    the audio analog of the image dHash (operators/phash.py): decode
    (chunk walk, per-frame channel sum), floor-map resample the
    waveform to ``n_points`` samples, one bit per adjacent pair
    (is the next sample louder?). Sign-of-difference is invariant to
    positive GAIN and (via the resample) to DURATION, so a re-gained
    or re-stretched copy of the same recording lands within a few
    bits — the near-dups byte-exact audio dedup can never catch. The
    fingerprint is ≤ 56 bits (positive BIGINT in both engines) and
    drops into the SAME banding + Hamming machinery as the image
    hash (phash.neardup_pairs_dhash is generic over a BIGINT
    fingerprint column). NULL for undecodable blobs.
    """
    if n_points - 1 > 62:
        raise ValueError(
            f"audio fingerprint needs {n_points - 1} bits — must stay"
            " <= 62 so the value is a positive BIGINT in both engines"
        )
    schema = StructType(
        [
            StructField("item_id", LongType()),
            StructField("afp", LongType()),
        ]
    )

    def fps(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, out = [], []
            for item_id, blob in zip(pdf[id_col], pdf[blob_col]):
                raw = bytes(blob) if blob is not None else b""
                parsed = _wav_samples(raw)
                ids.append(int(item_id))
                if parsed is None or len(parsed[1]) < 2:
                    out.append(None)
                    continue
                _rate, s = parsed
                n = len(s)
                idx = (np.arange(n_points, dtype=np.int64) * n) // n_points
                pts = s[idx]
                bits = pts[1:] > pts[:-1]
                weights = np.int64(1) << np.arange(
                    n_points - 1, dtype=np.int64
                )
                out.append(int((bits * weights).sum()))
            yield pd.DataFrame({"item_id": ids, "afp": out})

    return df.select(F.col(id_col), F.col(blob_col)).mapInPandas(
        fps, schema
    )


def synthesize_wav_group_blobs(df: DataFrame, id_col: str) -> DataFrame:
    """PCM WAV fixtures with PLANTED acoustic near-dup groups — the
    audio_neardup oracle's ground truth (the synthesize_bmp_pattern_
    blobs contract for sound).

    Group ``gid = id // 6`` owns a 4-level step pattern over 64
    virtual cells: ``level(u) = 40 + 50·((H(gid) >> 2·((u//2) % 30))
    & 3)`` with ``H`` the 60-bit md5 of ``'a' + str(gid)`` (15 hex
    chars — positive in both engines' BIGINT, the image-fixture
    convention). Member
    ``id`` renders it at duration ``n = 128 + (id % 4)·32`` frames
    via ``u = (k·64)//n``, scaled by gain ``1 + id % 3``, plus ONE
    transient click (+137 at the sampled point ``((id % 56)·n)//57``)
    — so group members are re-gained, re-stretched, clicked copies of
    one sound (byte-distinct blobs; fingerprint Hamming ≤ 4) while
    cross-group fingerprints stay ≥ 4 bits apart (measured at
    sf0.01: all 1246 within-group pairs caught, 3 boundary-distance
    cross pairs — the oracle replays them identically).
    """
    schema = StructType(
        [
            StructField("item_id", LongType()),
            StructField("blob", BinaryType()),
        ]
    )

    def synth(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:  # noqa: F821
        import hashlib

        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, blobs = [], []
            for item_id in pdf[id_col]:
                i = int(item_id)
                gid = i // 6
                hbits = int(
                    hashlib.md5(("a" + str(gid)).encode()).hexdigest()[:15],
                    16,
                )
                n = 128 + (i % 4) * 32
                gain = 1 + i % 3
                k = np.arange(n, dtype=np.int64)
                seg = (((k * 64) // n) // 2) % 30
                lv = 40 + 50 * ((np.int64(hbits) >> (2 * seg)) & 3)
                s = gain * lv
                s[((i % 56) * n) // FP_POINTS] += 137
                data = s.astype("<i2").tobytes()
                blob = (
                    b"RIFF"
                    + struct.pack("<I", 36 + len(data))
                    + b"WAVE"
                    + b"fmt "
                    + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
                    + b"data"
                    + struct.pack("<I", len(data))
                    + data
                )
                ids.append(i)
                blobs.append(blob)
            yield pd.DataFrame({"item_id": ids, "blob": blobs})

    return df.select(F.col(id_col)).mapInPandas(synth, schema)
