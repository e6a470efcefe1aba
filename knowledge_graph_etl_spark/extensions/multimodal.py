"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The container has no codec libraries, so the DECODE step is stubbed behind
a deterministic fake (``fake_decode=True``, default) or
``NotImplementedError`` — but the Spark-side plumbing (schema, Arrow batch
shape, ``mapInPandas`` signatures, partition behavior) is real and tested.

Design for 100 TB of media: binary payloads never pass through Python
row-at-a-time — every transform is an Arrow-batched ``mapInPandas`` whose
batch size is bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``;
metadata-only operations (filtering by size/kind, sampling) are pure
Column expressions that never touch the payload bytes (parquet column
pruning skips them entirely).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("sha256", StringType(), True),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)


def attach_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Metadata derivable without decoding — pure Column ops, payload column
    touched only for length/hash (still JVM-side)."""
    return df.withColumn("n_bytes", F.octet_length(F.col(payload_col)).cast("long")).withColumn(
        "payload_md5", F.md5(F.col(payload_col))
    )


def _fake_feature(payload: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for a decoded-media feature vector: bytes of
    repeated sha256, scaled to [-1, 1]. Replace with a real decoder when
    codec libs are available."""
    out: list[float] = []
    seed = payload or b""
    h = hashlib.sha256(seed).digest()
    while len(out) < dim:
        for byte in h:
            out.append((byte - 127.5) / 127.5)
            if len(out) == dim:
                break
        h = hashlib.sha256(h).digest()
    return out


def decode_and_featurize(
    media: DataFrame,
    dim: int = 16,
    fake_decode: bool = True,
) -> DataFrame:
    """DECODE → FEATURE-EXTRACT over media rows (Arrow-batched).

    With ``fake_decode=False`` this raises ``NotImplementedError`` where a
    real codec (PIL/ffmpeg/torchaudio) would be called — the surrounding
    plumbing is identical either way.
    """

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            # zip over column Series, not iterrows(): row-at-a-time pandas
            # access is ~10× slower per item (same pattern as ingest.py)
            for media_id, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                if payload is None:
                    rows.append((media_id, kind, None, None, None))
                    continue
                if not fake_decode:
                    raise NotImplementedError(
                        "real media decode requires codec libraries (PIL/ffmpeg); "
                        "not available in this environment"
                    )
                payload = bytes(payload)
                rows.append(
                    (
                        media_id,
                        kind,
                        len(payload),
                        hashlib.sha256(payload).hexdigest(),
                        _fake_feature(payload, dim),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "n_bytes", "sha256", "feature"]
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


def resize_images(
    media: DataFrame,
    width: int,
    height: int,
    fake_decode: bool = True,
) -> DataFrame:
    """Image-resize plumbing: payload → payload transform that rewrites the
    (width, height) metadata. The pixel work is the documented stub (the
    fake 'resized' payload is sha256-stretched to a deterministic
    width·height-dependent length); with a real codec only the inner
    function changes — schema, Arrow batching, and column flow are real.

    The stretch chains over HEX DIGEST STRINGS (h1 = sha256(payload),
    h2 = sha256(h1-hex), …; payload = unhex of the concatenation) rather
    than raw digest bytes — same entropy, but every step exists in ANSI
    SQL, so even the stubbed pixel bytes are exactly oracle-able
    (`multimodal_resize`), like the md5 hash families of the dedup ops."""

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target_len = max(1, (width * height) // 64)
        for pdf in batches:
            out = pdf.copy()
            payloads = []
            for p in pdf["payload"]:
                if p is None:
                    payloads.append(None)
                    continue
                if not fake_decode:
                    raise NotImplementedError(
                        "real image resize requires codec libraries (PIL)"
                    )
                hx = hashlib.sha256(bytes(p)).hexdigest()
                buf_hex = hx
                while len(buf_hex) < 2 * target_len:
                    hx = hashlib.sha256(hx.encode("ascii")).hexdigest()
                    buf_hex += hx
                payloads.append(bytes.fromhex(buf_hex[: 2 * target_len]))
            out["payload"] = payloads
            resized = [p is not None for p in payloads]
            out["width"] = [
                width if ok else w for ok, w in zip(resized, pdf["width"])
            ]
            out["height"] = [
                height if ok else h for ok, h in zip(resized, pdf["height"])
            ]
            yield out

    return media.where(F.col("kind") == "image").mapInPandas(
        run, schema=media.schema
    )


def sample_frames(
    media: DataFrame,
    every_ms: int = 1000,
    fake_decode: bool = True,
) -> DataFrame:
    """Frame-sampling plumbing for video rows: one output row per sampled
    timestamp. The frame payload is a stub (sha256-derived bytes); the row
    fan-out, schema, and batch shape match a real ffmpeg-backed sampler."""
    out_schema = StructType(
        [
            StructField("media_id", StringType(), False),
            StructField("frame_ts_ms", LongType(), False),
            StructField("frame", BinaryType(), True),
        ]
    )

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                # nullable int64 arrives as NaN in pandas — `is None` alone
                # would crash int(dur) in the worker
                if pd.isna(dur) or payload is None:
                    continue
                if not fake_decode:
                    raise NotImplementedError("real frame extraction requires ffmpeg")
                payload = bytes(payload)
                for ts in range(0, int(dur), every_ms):
                    frame = hashlib.sha256(payload + str(ts).encode()).digest()
                    rows.append((media_id, ts, frame))
            yield pd.DataFrame(rows, columns=["media_id", "frame_ts_ms", "frame"])

    return media.where(F.col("kind") == "video").select(
        "media_id", "payload", "duration_ms"
    ).mapInPandas(run, schema=out_schema)
