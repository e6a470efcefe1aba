"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

Decode is tiered: ``fake_decode=True`` (default) is a deterministic,
oracle-able sha256 stand-in; ``fake_decode=False`` runs REAL decoders —
PIL when importable (any PIL format), else pure-numpy PPM-P6 / 24-bit-BMP
parsers and stdlib ``wave`` PCM audio (all runnable with zero codec deps,
and covered by tests on generated payloads); compressed video still needs
ffmpeg/PyAV and raises ``NotImplementedError`` without it. The Spark-side
plumbing (schema, Arrow batch shape, ``mapInPandas`` signatures, partition
behavior) is identical on every path.

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
from pyspark.sql import DataFrame, Window
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


# ---------------------------------------------------------------------------
# real decoders
#
# Tiered: PIL (optional dep) handles any format it knows; without it, pure
# numpy/stdlib decoders cover PPM (P6), uncompressed 24-bit BMP, and PCM WAV
# (stdlib `wave`) — genuinely runnable in a codec-free container, and what
# the real-decode tests exercise. Compressed formats (JPEG/PNG/MP4) still
# require the optional deps and raise NotImplementedError when absent.
# ---------------------------------------------------------------------------


def _pil_image():
    try:
        from PIL import Image  # noqa: PLC0415 - optional dependency

        return Image
    except ImportError:
        return None


def decode_image(payload: bytes):
    """Decode an image payload to an HxWx3 uint8 numpy array.

    PIL if importable (any PIL-supported format); otherwise pure-numpy
    parsers for PPM P6 and uncompressed 24-bit BMP. Raises
    ``NotImplementedError`` for formats that need the optional codec."""
    import numpy as np

    pil = _pil_image()
    if pil is not None:
        import io

        img = pil.open(io.BytesIO(payload)).convert("RGB")
        return np.asarray(img, dtype=np.uint8)
    if payload[:2] == b"P6":
        return _decode_ppm(payload)
    if payload[:2] == b"BM":
        return _decode_bmp24(payload)
    raise NotImplementedError(
        "image format not decodable without PIL (pure-python paths: PPM P6, "
        "uncompressed 24-bit BMP)"
    )


def _decode_ppm(payload: bytes):
    """PPM P6 (binary RGB): 'P6' <w> <h> <maxval> then raw rows. Handles
    '#' comments and arbitrary whitespace per the netpbm spec."""
    import numpy as np

    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace byte after maxval, then raw data
    w, h, maxval = fields
    if maxval > 255:
        raise NotImplementedError("16-bit PPM needs PIL")
    arr = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    return arr.reshape(h, w, 3).copy()


def _decode_bmp24(payload: bytes):
    """Uncompressed 24-bit BMP (BITMAPINFOHEADER, BI_RGB): bottom-up BGR
    rows padded to 4-byte stride."""
    import struct

    import numpy as np

    data_off = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError("only uncompressed 24-bit BMP without PIL")
    bottom_up = h > 0
    h = abs(h)
    stride = ((w * 3 + 3) // 4) * 4
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=h * stride, offset=data_off
    ).reshape(h, stride)
    img = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR → RGB
    if bottom_up:
        img = img[::-1]
    return img.copy()


def decode_wav(payload: bytes):
    """Decode a PCM WAV payload with stdlib ``wave``: returns
    ``(samples, sample_rate)`` — float32 mono in [-1, 1], channels
    averaged. Supports 8/16/32-bit integer PCM."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(payload), "rb") as wf:
        n_ch, sampwidth, rate = wf.getnchannels(), wf.getsampwidth(), wf.getframerate()
        raw = wf.readframes(wf.getnframes())
    if sampwidth == 1:  # unsigned 8-bit
        samples = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    elif sampwidth == 2:
        samples = np.frombuffer(raw, dtype=np.int16).astype(np.float32) / 32768.0
    elif sampwidth == 4:
        samples = np.frombuffer(raw, dtype=np.int32).astype(np.float32) / 2147483648.0
    else:
        raise NotImplementedError(f"{sampwidth * 8}-bit PCM WAV unsupported")
    if n_ch > 1:
        samples = samples.reshape(-1, n_ch).mean(axis=1)
    return samples, rate


def _image_feature(img, dim: int) -> list[float]:
    """dim-length image descriptor: grayscale (ITU-R 601 luma) flattened in
    raster order and mean-pooled into ``dim`` contiguous cells, scaled to
    [-1, 1] — deterministic, resolution-independent."""
    import numpy as np

    gray = img.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    flat = gray.reshape(-1)
    cells = np.array_split(flat, dim) if flat.size >= dim else [flat] * dim
    return [float((c.mean() - 127.5) / 127.5) if c.size else 0.0 for c in cells]


def _audio_feature(samples, rate: int, dim: int) -> list[float]:
    """dim-length audio descriptor: [duration_s, rms, zero-crossing-rate]
    then the mean-pooled |amplitude| envelope over the remaining cells."""
    import numpy as np

    n = samples.size
    head = [
        float(n / rate if rate else 0.0),
        float(np.sqrt(np.mean(samples**2))) if n else 0.0,
        float(np.mean(np.abs(np.diff(np.signbit(samples).astype(np.int8))))) if n > 1 else 0.0,
    ][:dim]
    env_cells = dim - len(head)
    if env_cells > 0 and n:
        env = [float(c.mean()) if c.size else 0.0 for c in np.array_split(np.abs(samples), env_cells)]
    else:
        env = [0.0] * max(env_cells, 0)
    return head + env


def _real_feature(kind: str, payload: bytes, dim: int) -> list[float]:
    if kind == "image":
        return _image_feature(decode_image(payload), dim)
    if kind == "audio":
        return _audio_feature(*decode_wav(payload), dim)
    raise NotImplementedError(
        "real video decode requires ffmpeg/PyAV (optional dependency, not "
        "present in this environment)"
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

    ``fake_decode=True`` (default, oracle-able) uses the deterministic
    sha256 stand-in feature. ``fake_decode=False`` runs the REAL decoders:
    PIL for any PIL-supported image when importable, else the pure-numpy
    PPM/BMP parsers; stdlib ``wave`` for PCM audio; video raises
    ``NotImplementedError`` without ffmpeg/PyAV. The Spark plumbing
    (schema, Arrow batching, partition behavior) is identical either way.
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
                payload = bytes(payload)
                feature = (
                    _fake_feature(payload, dim)
                    if fake_decode
                    else _real_feature(kind, payload, dim)
                )
                rows.append(
                    (
                        media_id,
                        kind,
                        len(payload),
                        hashlib.sha256(payload).hexdigest(),
                        feature,
                    )
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "n_bytes", "sha256", "feature"]
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


def _resize_real(payload: bytes, width: int, height: int) -> bytes:
    """Real nearest-neighbor resize: decode (PIL / pure-numpy PPM / BMP),
    index-remap rows+cols, re-encode as PPM P6 (the one format writable
    without codec deps — PIL consumers can transcode downstream)."""
    import numpy as np

    img = decode_image(payload)
    src_h, src_w = img.shape[:2]
    rows = (np.arange(height) * src_h) // height
    cols = (np.arange(width) * src_w) // width
    resized = img[rows][:, cols]
    return b"P6\n%d %d\n255\n" % (width, height) + resized.astype(np.uint8).tobytes()


def resize_images(
    media: DataFrame,
    width: int,
    height: int,
    fake_decode: bool = True,
) -> DataFrame:
    """Image-resize: payload → payload transform that rewrites the
    (width, height) metadata. ``fake_decode=True`` (default, oracle-able)
    emits the sha256-stretched stand-in payload; ``fake_decode=False`` runs
    the REAL pixel path (`_resize_real`: decode via PIL/PPM/BMP,
    nearest-neighbor remap, PPM re-encode) — schema, Arrow batching, and
    column flow are identical on both paths.

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
                    payloads.append(_resize_real(bytes(p), width, height))
                    continue
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


def _encode_wav16(samples, rate: int) -> bytes:
    """Mono float [-1, 1] → 16-bit PCM WAV bytes (stdlib wave)."""
    import io
    import wave

    import numpy as np

    clipped = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    pcm = np.round(clipped * 32767.0).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()


def _resample_linear(samples, src_rate: int, dst_rate: int):
    """Deterministic linear-interpolation resampling (numpy.interp over
    the time grid) — the codec-free baseline resampler; band-limited
    (sinc/polyphase) resampling needs scipy, an optional dep this
    environment doesn't have, and linear is adequate for the feature /
    dedup paths these payloads feed."""
    import numpy as np

    n = samples.size
    if n == 0 or src_rate == dst_rate:
        return np.asarray(samples, dtype=np.float64)
    duration = n / src_rate
    m = max(1, int(round(duration * dst_rate)))
    src_t = np.arange(n, dtype=np.float64) / src_rate
    dst_t = np.arange(m, dtype=np.float64) / dst_rate
    return np.interp(dst_t, src_t, np.asarray(samples, dtype=np.float64))


def resample_audio(
    media: DataFrame,
    target_rate: int = 16_000,
) -> DataFrame:
    """Audio-resample operator: every ``kind='audio'`` payload is decoded
    (stdlib PCM WAV), linearly resampled to ``target_rate``, and
    re-encoded as 16-bit mono WAV — the normalize-everything-to-16kHz
    step ASR/audio-LM pipelines run before feature extraction. Metadata
    columns ``sample_rate`` (if present) and payload bytes are rewritten;
    non-audio rows are filtered (mirror of ``resize_images``' kind
    filter).

    Arrow-batched ``mapInPandas``: decode + interp + re-encode are
    per-row numpy with no cross-row state, so the operator scales as a
    pure map — no shuffle, executor-local CPU."""
    if target_rate < 1:
        raise ValueError(f"target_rate must be >= 1, got {target_rate}")

    has_rate = "sample_rate" in media.columns

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            payloads = []
            for p in pdf["payload"]:
                if p is None:
                    payloads.append(None)
                    continue
                samples, rate = decode_wav(bytes(p))
                payloads.append(
                    _encode_wav16(
                        _resample_linear(samples, rate, target_rate),
                        target_rate,
                    )
                )
            out["payload"] = payloads
            if has_rate:
                out["sample_rate"] = [
                    target_rate if p is not None else r
                    for p, r in zip(payloads, pdf["sample_rate"])
                ]
            yield out

    return media.where(F.col("kind") == "audio").mapInPandas(
        run, schema=media.schema
    )


def image_ahash(
    media: DataFrame,
    hash_size: int = 8,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Average-hash (aHash) perceptual fingerprint per image — the image
    modality's MinHash: decode (REAL decoders — PIL when importable,
    else the pure-numpy PPM/BMP parsers), grayscale, block-average down
    to ``hash_size²`` cells, one bit per cell (cell mean > global mean),
    packed row-major into a signed 64-bit ``ahash``. Identical pixels,
    re-encodes, and GLOBAL brightness shifts hash identically (the
    threshold is the image's own mean); crops/rotations do not — the
    standard aHash trade. Returns ``(id_col, ahash, ok)`` with
    ``ok=false`` (ahash NULL) for undecodable payloads — a poisoned blob
    must not kill the corpus scan.

    Scale shape: one Arrow-batched ``mapInPandas`` over ``(id,
    payload)`` — a pure map, no shuffle; dedup on the hash afterwards is
    :func:`dedup.exact_softweight`'s uniform-key group-by shape (see
    :func:`ahash_dedup`). No SQL oracle by design (binary image parsing
    is not SQL) — decode and hash are pytest-pinned against synthesized
    PPM/BMP fixtures."""
    if not 1 <= hash_size * hash_size <= 64:
        raise ValueError(f"hash_size² must be in [1, 64], got {hash_size}²")
    import numpy as np

    from pyspark.sql.types import (
        BooleanType,
        LongType,
        StructField,
        StructType,
    )

    id_type = media.select(F.col(id_col)).schema[0].dataType
    out_schema = StructType(
        [
            StructField(id_col, id_type),
            StructField("ahash", LongType()),
            StructField("ok", BooleanType()),
        ]
    )
    hs = int(hash_size)

    def run(batches):
        for pdf in batches:
            ids, hashes, oks = [], [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                ids.append(mid)
                try:
                    arr = decode_image(bytes(payload))
                    gray = np.asarray(arr, dtype=np.float64)
                    if gray.ndim == 3:
                        gray = gray.mean(axis=2)
                    if gray.shape[0] < hs or gray.shape[1] < hs:
                        # Images smaller than the hash grid would yield
                        # empty np.array_split blocks (mean = NaN → all
                        # bits False → hash 0), silently grouping every
                        # tiny/flat image as one duplicate cluster.
                        # Treat them as undecodable instead.
                        raise ValueError("image smaller than hash grid")
                    cells = np.asarray(
                        [
                            [b.mean() for b in np.array_split(row_blk, hs, axis=1)]
                            for row_blk in np.array_split(gray, hs, axis=0)
                        ]
                    )
                    bits = (cells > cells.mean()).flatten()
                    h = 0
                    for b in bits:
                        h = (h << 1) | int(b)
                    if h >= 1 << 63:
                        h -= 1 << 64
                    hashes.append(h)
                    oks.append(True)
                except Exception:  # noqa: BLE001 - poisoned blob guard
                    hashes.append(None)
                    oks.append(False)
            yield pd.DataFrame({id_col: ids, "ahash": hashes, "ok": oks})

    return media.select(id_col, payload_col).mapInPandas(run, out_schema)


def hamming_neardup_pairs(
    hashes: DataFrame,
    id_col: str = "media_id",
    hash_col: str = "ahash",
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Banded hamming-radius near-dup pairs over a PRECOMPUTED 64-bit
    perceptual hash column — the LSH shape that catches the re-encodes
    hamming-0 grouping misses: the hash is split into ``bands`` 16-bit
    segments; by pigeonhole any pair within ``max_hamming < bands``
    matches exactly on at least one segment, so candidates come from a
    segment-equality self-join (never all-pairs) and are verified with
    the exact ``bit_count(xor)`` distance on the full hash. Returns
    ``(id_a, id_b, hamming)`` with id_a < id_b.

    Works on any integer hash ≤ 64 bits (arithmetic-shift sign bits are
    masked off by ``& 0xFFFF``, so negative 64-bit hashes band
    identically on any engine). Same machinery as
    :func:`..dedup.simhash_pairs` but over an externally-supplied hash
    column — which makes THIS operator exactly SQL-oracle-able (the
    banding and verify are pure integer ops; DuckDB reproduces them
    bit-for-bit), while the image-decode composition
    (:func:`ahash_neardup`) is pytest-pinned.

    Scale shape: explode to ``bands`` rows per hash (bounded fan-out),
    one shuffle on the uniform (band, segment) key, dropDuplicates on
    the candidate pair, integer verify in whole-stage codegen. The
    self-join consumes one exchange twice (ReusedExchange, as in
    simhash_pairs — deliberately not checkpointed)."""
    if max_hamming >= bands:
        raise ValueError(
            f"max_hamming ({max_hamming}) must be < bands ({bands}) for "
            "the pigeonhole candidate generation to be complete"
        )
    if not 1 <= bands <= 4:
        raise ValueError(f"bands must be in [1, 4] (16-bit segments), got {bands}")
    h = F.col(hash_col)
    blocked = hashes.select(
        F.col(id_col).alias("id"),
        h.alias("__h"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("blk"),
                        F.shiftright(h, 16 * bi)
                        .bitwiseAND(F.lit(65535))
                        .alias("segv"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("b"),
    ).select("id", "__h", "b.blk", "b.segv")
    a, b = blocked.alias("a"), blocked.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.segv") == F.col("b.segv"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.__h").alias("__ha"),
            F.col("b.__h").alias("__hb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    ham = F.bit_count(F.col("__ha").bitwiseXOR(F.col("__hb"))).cast("int")
    return (
        cand.withColumn("hamming", ham)
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def ahash_neardup(
    media: DataFrame,
    max_hamming: int = 3,
    bands: int = 4,
    hash_size: int = 8,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Image near-duplicate PAIRS within a hamming radius: real
    :func:`image_ahash` decode, then :func:`hamming_neardup_pairs`
    banding — catches re-encode/noise variants whose aHash differs in a
    few bits, which :func:`ahash_dedup`'s hamming-0 grouping misses.
    Undecodable payloads are excluded. Returns ``(id_a, id_b,
    hamming)``."""
    h = image_ahash(media, hash_size, id_col, payload_col).where(F.col("ok"))
    return hamming_neardup_pairs(
        h, id_col=id_col, hash_col="ahash", max_hamming=max_hamming, bands=bands
    )


def ahash_dedup(
    media: DataFrame,
    hash_size: int = 8,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Image near-duplicate grouping by perceptual hash: every decodable
    image keyed by its :func:`image_ahash`, grouped exactly (aHash is
    already invariant to re-encode/resize/brightness, so hamming-0
    grouping IS the near-dup match at this fingerprint's resolution).
    Returns ``(id_col, ahash, n_copies, is_canonical)`` — min-id copy
    canonical, undecodable rows excluded. One uniform 8-byte-key
    shuffle; the group count and min-id rep come from a window over that
    one shuffle rather than :func:`dedup.exact_softweight`'s
    groupBy+join-back shape (r13: with the join shape the decode+hash
    ``mapInPandas`` — the expensive stage here, unlike softweight's
    cheap md5 — executed once per consumer; the window keeps it to ONE
    Python-boundary pass, and only (id, ahash) rows — never payloads —
    enter the shuffle)."""
    w = Window.partitionBy("ahash")
    return (
        image_ahash(media, hash_size, id_col, payload_col)
        .where(F.col("ok"))
        .select(
            F.col(id_col),
            "ahash",
            F.count(F.lit(1)).over(w).cast("bigint").alias("n_copies"),
            (F.col(id_col) == F.min(id_col).over(w)).alias("is_canonical"),
        )
    )


def scene_cuts(
    frames: DataFrame,
    media_col: str = "media_id",
    ts_col: str = "frame_ts_ms",
    sig_col: str = "sig",
    threshold: int = 8,
) -> DataFrame:
    """Shot-boundary (scene-cut) detection over per-frame perceptual
    signatures — the video-curation primitive behind keyframe selection,
    per-scene sampling, and duplicate-shot removal. A cut is declared
    between consecutive frames of a video whose 64-bit signatures differ
    in more than ``threshold`` bits (within a shot, perceptual hashes
    drift by a few bits; across a hard cut they are ~independent, ~32
    bits apart — the classic pHash-difference detector).

    Input is ``(media_col, ts_col, sig_col)`` — one row per sampled
    frame, signature as a BIGINT perceptual hash. In production the
    signatures come from :func:`sample_frames` → decode →
    :func:`image_ahash` (all shipped here); keeping the detector separate
    from the decode keeps it exactly SQL-oracle-able and reusable over
    any signature family.

    Scale shape: ONE shuffle, partitioned by video — ``lag`` +
    ``bit_count(xor)`` + a running cut count are all computed inside the
    same per-video window, and per-video partitions are frame counts
    (thousands), never corpus-sized. Emits every frame with its scene
    assignment: ``(media_id, frame_ts_ms, hamming_prev, is_cut,
    scene_id)`` — ``hamming_prev`` NULL for each video's first frame,
    which opens scene 0 and counts as a cut; ``scene_id`` is the running
    number of cuts so far minus 1."""
    w = Window.partitionBy(media_col).orderBy(ts_col)
    prev = F.lag(sig_col).over(w)
    ham = F.when(
        prev.isNotNull(),
        F.bit_count(F.col(sig_col).bitwiseXOR(prev)),
    ).cast("int")
    d = frames.select(
        F.col(media_col).alias("media_id"),
        F.col(ts_col).cast("bigint").alias("frame_ts_ms"),
        ham.alias("hamming_prev"),
    )
    is_cut = F.col("hamming_prev").isNull() | (
        F.col("hamming_prev") > threshold
    )
    wrun = (
        Window.partitionBy("media_id")
        .orderBy("frame_ts_ms")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return d.select(
        "media_id",
        "frame_ts_ms",
        "hamming_prev",
        is_cut.alias("is_cut"),
        (F.sum(is_cut.cast("long")).over(wrun) - 1).cast("bigint").alias(
            "scene_id"
        ),
    )


def vad_segments(
    frames: DataFrame,
    media_col: str = "media_id",
    idx_col: str = "frame_idx",
    energy_col: str = "energy_milli",
    threshold: int = 500,
    min_frames: int = 1,
) -> DataFrame:
    """Energy-threshold voice-activity segmentation — the audio-curation
    primitive behind silence trimming, speech-only sampling, and
    per-utterance chunking for ASR training sets. Consecutive frames
    whose energy exceeds ``threshold`` are grouped into maximal
    contiguous segments (the SQL islands-and-gaps pattern:
    ``frame_idx - row_number()`` is constant within an island), and
    segments shorter than ``min_frames`` are dropped as clicks.

    Input is ``(media_col, idx_col, energy_col)`` — one row per fixed-
    stride analysis frame with an INTEGER energy (e.g. milli-RMS from
    :func:`decode_wav` frames). Keeping the detector separate from the
    decode keeps it exactly SQL-oracle-able over any energy source.

    Scale shape: ONE shuffle partitioned by media file; both the
    row_number and the segment grouping live on that same per-media
    partitioning (frame counts per file, never corpus-sized), and the
    output is segment-count sized. Returns ``(media_id, seg_start,
    seg_end, n_frames, mean_energy_milli)``."""
    act = frames.where(F.col(energy_col) > threshold).select(
        F.col(media_col).alias("media_id"),
        F.col(idx_col).cast("bigint").alias("idx"),
        F.col(energy_col).cast("bigint").alias("e"),
    )
    w = Window.partitionBy("media_id").orderBy("idx")
    grp = (F.col("idx") - F.row_number().over(w)).alias("grp")
    return (
        act.select("media_id", "idx", "e", grp)
        .groupBy("media_id", "grp")
        .agg(
            F.min("idx").alias("seg_start"),
            F.max("idx").alias("seg_end"),
            F.count(F.lit(1)).cast("bigint").alias("n_frames"),
            F.expr("sum(e) div count(*)").cast("bigint").alias(
                "mean_energy_milli"
            ),
        )
        .where(F.col("n_frames") >= min_frames)
        .select(
            "media_id", "seg_start", "seg_end", "n_frames", "mean_energy_milli"
        )
    )
