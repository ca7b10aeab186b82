"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed through `mapInPandas` stages.

The image and audio decoders are REAL: the synthesizer emits
self-describing uncompressed formats — WAV (RIFF, PCM16 mono) and BMP
(BITMAPINFOHEADER, 24-bit BI_RGB with 4-byte row padding) — and the
decode kernel parses the actual container bytes with numpy (header
walk, chunk scan, padded pixel rows) to recover width/height/mean-luma
and duration/RMS. Only the video codec is stubbed (no ffmpeg in this
environment): video rows carry an opaque container and take the
clearly-flagged `is_fake_decode=true` path (`strict=True` raises at
that point, where a real frame decoder would run).

The synthesis parameters are closed-form functions of `media_id`, so a
SQL oracle (queries.O_MEDIA_FEATURES) can recompute every decoded
feature independently — the decoder is checked as a true round-trip
through the real file format, not against the code that wrote it.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),       # image|audio|video
        T.StructField("format", T.StringType()),     # bmp|wav|fakevid
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("data", T.BinaryType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("content_sha", T.StringType()),
        T.StructField("width", T.IntegerType()),        # image (decoded)
        T.StructField("height", T.IntegerType()),       # image (decoded)
        T.StructField("duration_ms", T.IntegerType()),  # audio (decoded)
        T.StructField("rms", T.DoubleType()),           # audio (decoded)
        T.StructField("luma_milli", T.LongType()),      # image (decoded)
        T.StructField("feature", T.ArrayType(T.FloatType())),
        T.StructField("is_fake_decode", T.BooleanType()),
    ]
)

SAMPLE_RATE = 16000

# Synthesis closed forms (mirrored by queries.O_MEDIA_FEATURES — change
# them together):
#   kind        = media_id % 3 -> 0 image, 1 audio, 2 video
#   image  BMP  : w = 16 + id%64, h = 16 + id%48,
#                 color (R,G,B) = (id%256, (id*7)%256, (id*13)%256)
#   audio  WAV  : n_samples = 400 + (id%1200)*16 (16 kHz -> 25+id%1200 ms),
#                 square wave of amplitude A = 1000 + id%20000 (RMS = A)
#   video  fake : 8-byte magic + 12-byte params + (id%4096) opaque bytes


def _bmp_params(mid: int) -> tuple[int, int, int, int, int]:
    return (
        16 + mid % 64, 16 + mid % 48,
        mid % 256, (mid * 7) % 256, (mid * 13) % 256,
    )


def _bmp_bytes(mid: int) -> bytes:
    w, h, r, g, b = _bmp_params(mid)
    row = ((3 * w + 3) // 4) * 4              # rows padded to 4 bytes
    size = 54 + row * h
    hdr = struct.pack(
        "<2sIHHI", b"BM", size, 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, row * h, 2835, 2835, 0, 0
    )
    line = bytearray((b, g, r) * w)           # BMP stores BGR
    line += b"\x00" * (row - 3 * w)
    return hdr + bytes(line) * h


def _wav_params(mid: int) -> tuple[int, int]:
    return 400 + (mid % 1200) * 16, 1000 + mid % 20000


def _wav_bytes(mid: int) -> bytes:
    n, amp = _wav_params(mid)
    samples = np.empty(n, dtype="<i2")
    samples[0::2] = amp                        # square wave: RMS == amp
    samples[1::2] = -amp
    data = samples.tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16, 1, 1, SAMPLE_RATE, SAMPLE_RATE * 2, 2, 16,
        b"data", len(data),
    )
    return hdr + data


def _vid_bytes(mid: int) -> bytes:
    n = mid % 4096
    body = (hashlib.sha256(str(mid).encode()).digest() * (n // 32 + 1))[:n]
    return b"FAKEVID0" + struct.pack("<iii", 320, 240, mid % 90000) + body


def synthesize_media(documents: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Deterministic media rows keyed by `id_col`: real BMP / WAV
    containers (parameters are closed forms of the id — see module
    header) plus an opaque fake-video container; used by tests and the
    bench to exercise the binary-column path without external data.
    `text_col` is unused for payloads (kept for API stability)."""

    @F.pandas_udf(T.BinaryType())
    def pack(ids: pd.Series) -> pd.Series:
        def one(mid):
            mid = int(mid)
            k = mid % 3
            if k == 0:
                return _bmp_bytes(mid)
            if k == 1:
                return _wav_bytes(mid)
            return _vid_bytes(mid)

        return ids.map(one)

    kinds = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col(id_col) % 3 + 1).cast("int"),
    )
    fmts = F.element_at(
        F.array(F.lit("bmp"), F.lit("wav"), F.lit("fakevid")),
        (F.col(id_col) % 3 + 1).cast("int"),
    )
    return documents.select(
        F.col(id_col).alias("media_id"),
        kinds.alias("kind"),
        fmts.alias("format"),
        (F.col(id_col) % 64 + 16).cast("int").alias("width"),
        (F.col(id_col) % 48 + 16).cast("int").alias("height"),
        (F.col(id_col) % 90000).cast("int").alias("duration_ms"),
        pack(F.col(id_col)).alias("data"),
    )


def _decode_bmp(b: bytes) -> tuple[int, int, int]:
    """-> (width, height, luma_milli). Parses the real header: pixel
    offset @10, int32 dims @18/@22, bpp @28; walks padded BGR rows."""
    off = struct.unpack_from("<I", b, 10)[0]
    w, h = struct.unpack_from("<ii", b, 18)
    bpp = struct.unpack_from("<H", b, 28)[0]
    if bpp != 24:
        raise ValueError(f"unsupported BMP bpp={bpp}")
    h_abs = abs(h)
    row = ((bpp // 8 * w + 3) // 4) * 4
    px = np.frombuffer(b, dtype=np.uint8, count=row * h_abs, offset=off)
    px = px.reshape(h_abs, row)[:, : 3 * w].reshape(h_abs, w, 3)
    means = px.reshape(-1, 3).mean(axis=0)     # BGR order
    ib, ig, ir = (int(round(float(x))) for x in means)
    return w, h_abs, 299 * ir + 587 * ig + 114 * ib


def _decode_wav(b: bytes) -> tuple[int, float, np.ndarray]:
    """-> (duration_ms, rms, samples). Real RIFF chunk walk: reads the
    fmt chunk for rate/channels/bits, then the data chunk as int16."""
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, rate, channels, bits, data = 12, None, None, None, None
    while pos + 8 <= len(b):
        cid, sz = struct.unpack_from("<4sI", b, pos)
        body = b[pos + 8 : pos + 8 + sz]
        if cid == b"fmt ":
            _, channels, rate, _, _, bits = struct.unpack_from("<HHIIHH", body)
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)               # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    if bits != 16 or channels != 1:
        raise ValueError(f"unsupported WAV layout bits={bits} ch={channels}")
    samples = np.frombuffer(data, dtype="<i2")
    dur_ms = int(round(len(samples) * 1000.0 / rate))
    rms = float(np.sqrt(np.mean(samples.astype(np.float64) ** 2)))
    return dur_ms, rms, samples


def extract_features(
    media: DataFrame, feature_dim: int = 8, strict: bool = False,
    batch_rows: int = 256,
) -> DataFrame:
    """Decode + feature-extract via mapInPandas. WAV and BMP rows are
    decoded for real (numpy header/chunk parsing); unknown containers
    (video) take the fake path flagged by `is_fake_decode=true`
    (`strict=True` raises there instead). The working-set bound for fat
    binary rows is enforced INSIDE the kernel: each incoming Arrow
    batch is processed in `batch_rows`-row slices and yielded
    incrementally, so peak memory per python worker is one slice of
    decoded output regardless of the session's
    arrow.maxRecordsPerBatch. (Setting that conf here and restoring it
    in a finally block would be a silent no-op — mapInPandas is lazy
    and the conf is read at ACTION time, after restore.) This is the
    knob you tune for 100 MB media blobs at cluster scale, cf. the
    reference raising Kafka limits to 200 MB for mega account states
    (README.md:30-39)."""

    def one(mid, kind, b):
        b = b or b""
        out = {
            "media_id": mid, "kind": kind, "n_bytes": len(b),
            "content_sha": hashlib.sha256(b).hexdigest(),
            "width": None, "height": None, "duration_ms": None,
            "rms": None, "luma_milli": None,
            "feature": None, "is_fake_decode": False,
        }
        if b[:2] == b"BM":
            w, h, luma = _decode_bmp(b)
            out.update(width=w, height=h, luma_milli=luma,
                       feature=_image_feature(b, w, h, feature_dim))
        elif b[:4] == b"RIFF":
            dur, rms, samples = _decode_wav(b)
            out.update(duration_ms=dur, rms=rms,
                       feature=_audio_feature(samples, feature_dim))
        else:
            if strict:
                raise NotImplementedError(
                    "video codecs are not available in this environment; "
                    "install ffmpeg and replace this branch"
                )
            out.update(feature=_fake_feature(b, feature_dim),
                       is_fake_decode=True)
        return out

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in FEATURE_SCHEMA.fields]
        for pdf in batches:
            for lo in range(0, len(pdf), batch_rows):
                sl = pdf.iloc[lo : lo + batch_rows]
                rows = [
                    one(m, k, d)
                    for m, k, d in zip(sl["media_id"], sl["kind"], sl["data"])
                ]
                yield pd.DataFrame(rows, columns=cols)

    return media.mapInPandas(run, FEATURE_SCHEMA)


def _image_feature(b: bytes, w: int, h: int, dim: int) -> list[float]:
    off = struct.unpack_from("<I", b, 10)[0]
    row = ((3 * w + 3) // 4) * 4
    px = np.frombuffer(b, dtype=np.uint8, count=row * h, offset=off)
    px = px.reshape(h, row)[:, : 3 * w].astype(np.float64)
    cuts = np.array_split(px.ravel(), dim)
    return [float(c.mean() / 255.0) if len(c) else 0.0 for c in cuts]


def _audio_feature(samples: np.ndarray, dim: int) -> list[float]:
    cuts = np.array_split(samples.astype(np.float64), dim)
    return [
        float(np.sqrt((c ** 2).mean()) / 32768.0) if len(c) else 0.0
        for c in cuts
    ]


def _fake_feature(b: bytes, dim: int) -> list[float]:
    h = hashlib.sha256(b or b"").digest()
    arr = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=">u4")
    return (arr.astype(np.float64) / 2**32).astype(np.float32).tolist()


def sample_frames(media: DataFrame, every_ms: int = 10_000,
                  strict: bool = False) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame
    offset (explode on a JVM-computed sequence); the frame-decode kernel
    is the stub."""
    frames = media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ms"),
        "data",
    )
    if strict:
        raise NotImplementedError("frame decode requires ffmpeg")
    return frames.select(
        "media_id",
        "frame_ms",
        F.sha2(F.concat(F.col("data"), F.col("frame_ms").cast("binary")), 256)
        .alias("frame_sha"),
    )
