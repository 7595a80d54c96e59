"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns next to typed metadata
structs; all heavy per-item work (decode, resize, frame-sample,
feature-extract) runs as Arrow-batched ``mapInPandas`` so bytes never
round-trip through the driver and batches stay columnar end-to-end.

The decode kernels themselves are STUBS in this container (no
PIL/ffmpeg/librosa baked in — see the module-level ``HAS_*`` gates):
they either raise NotImplementedError (strict mode) or produce a
deterministic fake (test mode) — the Spark-side contract (schemas,
batch iteration, partitioning, UDF signatures) is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # pragma: no cover - not in this container
    import PIL.Image  # noqa: F401

    HAS_PIL = True
except Exception:  # pragma: no cover
    HAS_PIL = False

# Schema of a media column: raw bytes + typed metadata. At 100 TB the
# binary payload dominates — keep media in their own parquet column
# chunks (automatic) and ALWAYS prune it out of plans that only touch
# metadata (Catalyst column pruning does this when you select narrow).
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_s", T.DoubleType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16


def _fake_feature(payload: bytes | None, dim: int) -> list[float]:
    """Deterministic stand-in for a real decoder+encoder: hash bytes
    into a unit-ish vector. Replace with the real kernel when the
    media libs are available."""
    if payload is None:
        return [0.0] * dim
    h = np.frombuffer(payload[: dim * 8].ljust(dim * 8, b"\0"), dtype=np.uint64)
    v = (h % 1000).astype(np.float64) / 1000.0
    return v[:dim].tolist()


def extract_features(df: DataFrame, strict: bool = False, dim: int = FEATURE_DIM) -> DataFrame:
    """Decode + feature-extract media bytes → array<double> features.

    ``mapInPandas``: Arrow batches in/out, one pass, no shuffle. In a
    real deployment the body calls the codec; here it is gated.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("kind", T.StringType(), False),
            T.StructField("features", T.ArrayType(T.DoubleType()), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if strict and not HAS_PIL:
                raise NotImplementedError(
                    "media decode requires image/audio libs not present in this container"
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": [_fake_feature(b, dim) for b in pdf["content"]],
                }
            )

    return df.select("media_id", "kind", "content").mapInPandas(batches, schema=out_schema)


def sample_frames(df: DataFrame, every_s: float = 1.0, strict: bool = False) -> DataFrame:
    """Frame-sample videos: one output row per sampled frame offset.

    Spark shape: compute n_frames from metadata (JVM-side), explode the
    offsets, and only then decode the needed frames in mapInPandas —
    so the expensive decode fan-out happens AFTER the cheap row
    explosion, partition-parallel."""
    # sequence() is integral-only: generate frame indices, scale to
    # seconds afterwards. dur=4s, every=1s → indices 0..3.
    n_frames = F.greatest(
        F.ceil(F.coalesce(F.col("meta.duration_s"), F.lit(0.0)) / F.lit(float(every_s))),
        F.lit(1),
    ).cast("long")
    with_n = df.withColumn(
        "_frame_idx", F.explode(F.sequence(F.lit(0).cast("long"), n_frames - 1))
    ).withColumn("frame_offset", F.col("_frame_idx") * F.lit(float(every_s)))
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_offset", T.DoubleType(), False),
            T.StructField("frame", T.BinaryType(), True),
        ]
    )

    def decode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if strict:
                raise NotImplementedError("video decode not available in this container")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "frame_offset": pdf["frame_offset"],
                    # deterministic fake frame: 8 bytes derived from id+offset
                    "frame": [
                        (int(m) * 1000003 + int(o * 1000)).to_bytes(8, "little")
                        for m, o in zip(pdf["media_id"], pdf["frame_offset"])
                    ],
                }
            )

    return with_n.select("media_id", "frame_offset", "content").mapInPandas(decode, out_schema)


def synthetic_media(spark, n: int = 100) -> DataFrame:
    """Deterministic fake media table for tests (no real codecs)."""
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        rows.append(
            (
                i,
                kind,
                bytes([(i * 7 + j) % 256 for j in range(128)]),
                {
                    "mime": {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                    "width": 64 if kind == "image" else None,
                    "height": 64 if kind == "image" else None,
                    "duration_s": 4.0 if kind != "image" else None,
                    "sample_rate": 16000 if kind == "audio" else None,
                },
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# REAL decode kernels for dependency-free formats
# ---------------------------------------------------------------------------
#
# WAV (stdlib `wave`) and PPM/PGM (10-line header parse + numpy) need
# no media library, so these two lanes are REAL end-to-end: genuine
# bytes in parquet → Arrow batch → decoded samples/pixels → stats.
# JPEG/MP4/…, which need PIL/ffmpeg, stay behind the strict/fake gate
# above — the honest split between what this container can and cannot
# decode.


def synthetic_wav_bytes(
    seconds: float = 0.25, rate: int = 8000, freq: float = 440.0
) -> bytes:
    """A real RIFF/WAVE payload: 16-bit mono sine at ``freq`` Hz."""
    import io
    import wave

    t = np.arange(int(seconds * rate)) / rate
    samples = (np.sin(2 * np.pi * freq * t) * 32000).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def synthetic_ppm_bytes(width: int = 8, height: int = 6, seed: int = 0) -> bytes:
    """A real binary PPM (P6) payload with deterministic pixels."""
    rng = np.random.default_rng(seed)
    pixels = rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)
    return b"P6\n%d %d\n255\n" % (width, height) + pixels.tobytes()


def _decode_wav(payload: bytes):
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        rate = w.getframerate()
        n = w.getnframes()
        width = w.getsampwidth()
        raw = w.readframes(n)
    dtype = {1: np.int8, 2: np.dtype("<i2"), 4: np.dtype("<i4")}[width]
    samples = np.frombuffer(raw, dtype=dtype).astype(np.float64)
    peak = float(2 ** (8 * width - 1))
    rms = float(np.sqrt(np.mean((samples / peak) ** 2))) if len(samples) else 0.0
    return rate, n, n / rate if rate else 0.0, rms


def audio_stats(df: DataFrame, strict: bool = False) -> DataFrame:
    """REAL audio decode for WAV payloads → (sample_rate, n_samples,
    duration_s, rms). Arrow-batched mapInPandas over the audio rows
    only (filter first — the plan never drags image/video bytes
    through the decoder). Non-WAV audio needs a codec library: strict
    raises, lax yields nulls."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("sample_rate", T.IntegerType(), True),
            T.StructField("n_samples", T.LongType(), True),
            T.StructField("duration_s", T.DoubleType(), True),
            T.StructField("rms", T.DoubleType(), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"media_id": [], "sample_rate": [], "n_samples": [],
                   "duration_s": [], "rms": []}
            for mid, payload in zip(pdf["media_id"], pdf["content"]):
                try:
                    rate, n, dur, rms = _decode_wav(payload)
                except Exception:
                    if strict:
                        raise NotImplementedError(
                            "non-WAV audio needs a codec library not in "
                            "this container"
                        )
                    rate = n = dur = rms = None
                out["media_id"].append(mid)
                out["sample_rate"].append(rate)
                out["n_samples"].append(n)
                out["duration_s"].append(dur)
                out["rms"].append(rms)
            yield pd.DataFrame(out)

    return (
        df.filter(F.col("kind") == "audio")
        .select("media_id", "content")
        .mapInPandas(batches, out_schema)
    )


def _decode_ppm_luma(payload: bytes):
    if not payload.startswith((b"P6", b"P5")):
        raise ValueError("not a binary PPM/PGM")
    parts = []
    i = 2
    while len(parts) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":  # comment line
            i = payload.index(b"\n", i) + 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        parts.append(int(payload[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    w, h, _maxval = parts
    ch = 3 if payload.startswith(b"P6") else 1
    pixels = np.frombuffer(payload[i : i + w * h * ch], dtype=np.uint8)
    pixels = pixels.reshape(h, w, ch).astype(np.float64)
    # Rec.601 luma for color, identity for gray
    luma = (
        pixels[:, :, 0] * 0.299 + pixels[:, :, 1] * 0.587 + pixels[:, :, 2] * 0.114
        if ch == 3
        else pixels[:, :, 0]
    )
    return w, h, luma


def _decode_ppm(payload: bytes):
    w, h, luma = _decode_ppm_luma(payload)
    return w, h, float(luma.mean())


def parse_image_header(payload: bytes | None):
    """Container-format header parse — REAL geometry without any
    imaging library, from the byte layout of the public formats:

    - PNG: 8-byte signature, then the IHDR chunk (always first, RFC
      2083 §4.1.1) carries width/height as u32be at offsets 16/20 and
      color type at 25 (0 gray, 2 RGB, 3 palette, 4 gray+alpha,
      6 RGBA).
    - JPEG: walk the marker segments from SOI; any SOFn frame header
      (0xFFC0-0xCF except DHT/DAC/RST) carries [len u16, precision u8,
      height u16be, width u16be, n_components u8] (ITU T.81 §B.2.2).
    - PPM/PGM: ASCII header (P6/P5, whitespace-separated w h maxval).

    Returns (format, width, height, channels) or raises ValueError for
    unrecognized/truncated payloads. Pixel DECODE still needs PIL (the
    strict/fake gate) — this lane covers the metadata-only pipelines
    (resolution filters, aspect-ratio buckets, thumbnail planning)
    that never need pixels at all."""
    import struct

    if payload is None or len(payload) < 4:
        raise ValueError("empty/truncated image payload")
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        if len(payload) < 26 or payload[12:16] != b"IHDR":
            raise ValueError("PNG without leading IHDR")
        w, h = struct.unpack(">II", payload[16:24])
        color_type = payload[25]
        channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
        if channels is None:
            raise ValueError(f"PNG bad color type {color_type}")
        return "png", w, h, channels
    if payload[:2] == b"\xff\xd8":  # JPEG SOI
        i = 2
        while i + 2 <= len(payload):
            if payload[i] != 0xFF:
                raise ValueError("JPEG marker desync")
            # T.81 §B.1.1.2: markers may be preceded by any number of
            # 0xFF fill bytes — skip the run, the marker code is the
            # first non-0xFF byte after it
            while i < len(payload) and payload[i] == 0xFF:
                i += 1
            if i >= len(payload):
                break
            marker = payload[i]
            i += 1
            if marker == 0xD8 or 0xD0 <= marker <= 0xD7 or marker == 0x01:
                continue  # SOI/RSTn/TEM: no segment payload
            if marker in (0xDA, 0xD9):
                # SOS starts entropy-coded data, EOI ends the image —
                # neither is followed by a walkable segment, and SOF
                # always precedes SOS, so the frame header is absent
                break
            if i + 2 > len(payload):
                break
            seg_len = struct.unpack(">H", payload[i : i + 2])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                # needs bytes up to payload[i + 7] (the channels byte)
                if i + 8 > len(payload):
                    raise ValueError("JPEG truncated SOF")
                h, w = struct.unpack(">HH", payload[i + 3 : i + 7])
                return "jpeg", w, h, payload[i + 7]
            if seg_len < 2:
                raise ValueError("JPEG bad segment length")
            i += seg_len
        raise ValueError("JPEG without SOF frame header")
    if payload[:2] in (b"P6", b"P5"):
        w, h, _luma = _decode_ppm(payload)
        if payload[:2] == b"P6":
            return "ppm", w, h, 3
        return "pgm", w, h, 1
    raise ValueError("unrecognized image container")


def image_headers(df: DataFrame, strict: bool = False) -> DataFrame:
    """Geometry for every image row from header bytes alone (PNG IHDR
    / JPEG SOFn / PPM-PGM ASCII header — ``parse_image_header``), no
    imaging library involved. Arrow-batched like the decode lanes;
    strict raises on unrecognized payloads, lax yields nulls.

    100 TB note: this reads the BINARY column only to slice its first
    bytes — when media sit in parquet the payload column is still
    fully read (parquet has no partial-value reads), so pipelines that
    can persist geometry should do it at ingest and let Catalyst prune
    the payload instead."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("format", T.StringType(), True),
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
            T.StructField("channels", T.IntegerType(), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "media_id": [],
                "format": [],
                "width": [],
                "height": [],
                "channels": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["content"]):
                try:
                    fmt, w, h, ch = parse_image_header(payload)
                except Exception:
                    if strict:
                        raise
                    fmt = w = h = ch = None
                out["media_id"].append(mid)
                out["format"].append(fmt)
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(ch)
            yield pd.DataFrame(out)

    return (
        df.filter(F.col("kind") == "image")
        .select("media_id", "content")
        .mapInPandas(batches, out_schema)
    )


def synthetic_png_bytes(
    width: int = 5, height: int = 4, seed: int = 0
) -> bytes:
    """A REAL, spec-valid RGB PNG built with stdlib zlib only
    (signature + IHDR + IDAT with filter-0 scanlines + IEND, CRCs via
    zlib.crc32) — decodable by any PNG reader, deterministic pixels."""
    import struct
    import zlib

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)
    raw = b"".join(b"\x00" + px[r].tobytes() for r in range(height))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def synthetic_jpeg_header_bytes(width: int = 7, height: int = 3) -> bytes:
    """A JPEG byte PREFIX with valid marker structure through SOF0
    (SOI + APP0/JFIF + DQT stub + SOF0) — enough for any header
    parser; not a complete decodable image (entropy-coded data needs
    a real encoder)."""
    import struct

    app0 = b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    dqt = b"\x00" + bytes(64)
    sof0 = (
        struct.pack(">BHHB", 8, height, width, 3)
        + b"\x01\x22\x00\x02\x11\x01\x03\x11\x01"
    )
    return (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
        + b"\xff\xdb" + struct.pack(">H", len(dqt) + 2) + dqt
        + b"\xff\xc0" + struct.pack(">H", len(sof0) + 2) + sof0
    )


def image_stats(df: DataFrame, strict: bool = False) -> DataFrame:
    """REAL image decode for PPM/PGM payloads → (width, height,
    mean_luma); PIL-backed formats decode when PIL exists, else
    strict raises / lax yields nulls."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
            T.StructField("mean_luma", T.DoubleType(), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"media_id": [], "width": [], "height": [], "mean_luma": []}
            for mid, payload in zip(pdf["media_id"], pdf["content"]):
                try:
                    w, h, luma = _decode_ppm(payload)
                except Exception:
                    if HAS_PIL:
                        import io

                        import PIL.Image

                        img = PIL.Image.open(io.BytesIO(payload)).convert("L")
                        w, h = img.size
                        luma = float(np.asarray(img).mean())
                    elif strict:
                        raise NotImplementedError(
                            "non-PPM image needs PIL, not in this container"
                        )
                    else:
                        w = h = luma = None
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["mean_luma"].append(luma)
            yield pd.DataFrame(out)

    return (
        df.filter(F.col("kind") == "image")
        .select("media_id", "content")
        .mapInPandas(batches, out_schema)
    )


def synthetic_media_real(spark, n: int = 30) -> DataFrame:
    """Media table whose audio rows are REAL WAVs and image rows REAL
    PPMs (decodable in this container); video stays a fake payload
    behind the gate."""
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        if kind == "audio":
            content = synthetic_wav_bytes(
                seconds=0.1 + (i % 3) * 0.1, rate=8000, freq=220.0 * (1 + i % 4)
            )
            meta = {"mime": "audio/wav", "width": None, "height": None,
                    "duration_s": None, "sample_rate": 8000}
        elif kind == "image":
            content = synthetic_ppm_bytes(8 + i % 5, 6 + i % 4, seed=i)
            meta = {"mime": "image/x-portable-pixmap",
                    "width": 8 + i % 5, "height": 6 + i % 4,
                    "duration_s": None, "sample_rate": None}
        else:
            content = bytes([(i * 7 + j) % 256 for j in range(64)])
            meta = {"mime": "video/mp4", "width": None, "height": None,
                    "duration_s": 4.0, "sample_rate": None}
        rows.append((i, kind, content, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


# ------------------------------------------------------ perceptual hashing

def _phash_bits(luma: "np.ndarray", grid: int = 32, keep: int = 8) -> int:
    """Classic DCT pHash, numpy-only: nearest-neighbor resample to
    ``grid``², DCT-II (cosine-basis matmul — no scipy), keep the
    low-frequency ``keep``² block minus the DC term, threshold at the
    median → a 63-bit signature. Deterministic: fixed grids, exact
    index arithmetic, ties (coef == median) hash to 0."""
    h, w = luma.shape
    rows = (np.arange(grid) * h) // grid
    cols = (np.arange(grid) * w) // grid
    a = luma[np.ix_(rows, cols)]
    n = np.arange(grid)
    basis = np.cos(np.pi * (n[None, :] + 0.5) * n[:, None] / grid)
    d = basis @ a @ basis.T
    block = d[:keep, :keep].flatten()[1:]  # drop DC
    med = float(np.median(block))
    bits = 0
    for i, v in enumerate(block):
        if v > med:
            bits |= 1 << i
    return bits


def image_phash(df: DataFrame, strict: bool = False) -> DataFrame:
    """Per-image 63-bit perceptual hash → (media_id, phash). PPM/PGM
    decodes for real in this container; PIL formats decode when PIL
    exists, else strict raises / lax yields nulls. Arrow-batched
    mapInPandas — the decode-heavy stage is embarrassingly parallel
    and emits 8 bytes per image, so everything downstream (the
    near-dup join) moves hashes, never pixels."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("phash", T.LongType(), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, hashes = [], []
            for mid, payload in zip(pdf["media_id"], pdf["content"]):
                try:
                    _, _, luma = _decode_ppm_luma(payload)
                    ph = _phash_bits(luma)
                except Exception:
                    if HAS_PIL:
                        import io

                        import PIL.Image

                        img = PIL.Image.open(io.BytesIO(payload)).convert("L")
                        ph = _phash_bits(np.asarray(img, dtype=np.float64))
                    elif strict:
                        raise NotImplementedError(
                            "non-PPM image needs PIL, not in this container"
                        )
                    else:
                        ph = None
                ids.append(mid)
                hashes.append(ph)
            yield pd.DataFrame({"media_id": ids, "phash": hashes})

    return (
        df.filter(F.col("kind") == "image")
        .select("media_id", "content")
        .mapInPandas(batches, out_schema)
    )


def phash_near_dups(hashes: DataFrame, max_hamming: int = 6) -> DataFrame:
    """Image near-duplicate pairs by pHash hamming distance — the
    multimodal twin of simhash_near_dups, same pigeonhole plan: split
    the 63-bit hash into ``max_hamming + 1`` chunks; any pair within
    the radius shares at least one intact chunk (pigeonhole — EXACT
    recall, not probabilistic), so candidates come from an equi-join
    on (chunk_idx, chunk_value) and only candidates pay the
    bit_count(xor) verify. Hashes, never pixels, on the shuffle."""
    n_chunks = int(max_hamming) + 1
    width = 63 // n_chunks + (1 if 63 % n_chunks else 0)
    mask = (1 << width) - 1
    chunks = F.array(
        *[
            F.struct(
                F.lit(i).alias("ci"),
                F.expr(f"shiftright(phash, {i * width})")
                .bitwiseAND(F.lit(mask))
                .alias("cv"),
            )
            for i in range(n_chunks)
        ]
    )
    banded = (
        hashes.filter(F.col("phash").isNotNull())
        .select("media_id", "phash", F.explode(chunks).alias("_c"))
        .select(
            "media_id",
            "phash",
            F.col("_c.ci").alias("_ci"),
            F.col("_c.cv").alias("_cv"),
        )
    )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(b, ["_ci", "_cv"])
        .filter(F.col("a.media_id") < F.col("b.media_id"))
        .select(
            F.col("a.media_id").alias("id_a"),
            F.col("b.media_id").alias("id_b"),
            F.bit_count(
                F.col("a.phash").bitwiseXOR(F.col("b.phash"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )
