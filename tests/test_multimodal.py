"""Multimodal column plumbing (operators.multimodal): schemas, Arrow
batch iteration, explode-then-decode frame sampling, metadata-only
plans pruning the binary payload."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ramen_spark.operators.multimodal import (
    FEATURE_DIM,
    extract_features,
    sample_frames,
    synthetic_media,
)


@pytest.fixture(scope="module")
def media(spark):
    return synthetic_media(spark, n=30)


def test_feature_extraction_shape(spark, media):
    out = extract_features(media).collect()
    assert len(out) == 30
    assert all(len(r["features"]) == FEATURE_DIM for r in out)
    # deterministic fake: same input → same features
    again = extract_features(media).collect()
    assert {r["media_id"]: tuple(r["features"]) for r in out} == {
        r["media_id"]: tuple(r["features"]) for r in again
    }


def test_strict_mode_raises(spark, media):
    with pytest.raises(Exception, match="NotImplementedError|media decode"):
        extract_features(media, strict=True).collect()


def test_frame_sampling_fanout(spark, media):
    videos = media.filter(F.col("kind") == "video")
    out = sample_frames(videos, every_s=1.0)
    rows = out.collect()
    n_videos = videos.count()
    # 4s duration → offsets 0,1,2,3 per video
    assert len(rows) == n_videos * 4
    assert all(r["frame"] is not None for r in rows)


def test_metadata_only_plan_prunes_binary(spark, media, tmp_path):
    """Reading just metadata must NOT read the content column — the
    100 TB property that makes media tables queryable."""
    p = str(tmp_path / "media.parquet")
    media.write.parquet(p)
    df = spark.read.parquet(p).select("media_id", "kind", "meta.mime")
    plan = df._jdf.queryExecution().executedPlan().toString()
    schema_seg = plan.split("ReadSchema:")[1]
    assert "content" not in schema_seg


def test_audio_stats_real_wav_decode(spark):
    """REAL WAV decode end-to-end: genuine RIFF bytes through the
    Arrow-batched kernel — sample rate, sample count, duration, and
    the sine's RMS (1/√2) all come from actually parsing the payload."""
    from ramen_spark.operators.multimodal import (
        audio_stats,
        synthetic_media_real,
    )

    media = synthetic_media_real(spark, 12)
    rows = {r["media_id"]: r for r in audio_stats(media, strict=True).collect()}
    assert len(rows) == 4  # audio rows only
    for r in rows.values():
        assert r["sample_rate"] == 8000
        assert abs(r["duration_s"] - r["n_samples"] / 8000.0) < 1e-9
        assert abs(r["rms"] - 0.7071 * 32000 / 32768) < 0.01  # sine RMS


def test_image_stats_real_ppm_decode(spark):
    """REAL PPM decode: width/height from the header, mean luma from
    the pixel plane — verified against a numpy recomputation."""
    import numpy as np

    from ramen_spark.operators.multimodal import (
        _decode_ppm,
        image_stats,
        synthetic_media_real,
        synthetic_ppm_bytes,
    )

    media = synthetic_media_real(spark, 12)
    rows = {r["media_id"]: r for r in image_stats(media, strict=True).collect()}
    assert len(rows) == 4
    for mid, r in rows.items():
        w, h, luma = _decode_ppm(synthetic_ppm_bytes(8 + mid % 5, 6 + mid % 4, seed=mid))
        assert (r["width"], r["height"]) == (w, h)
        assert abs(r["mean_luma"] - luma) < 1e-9


def test_non_decodable_formats_stay_gated(spark):
    """Video (no ffmpeg here) keeps the honest strict/lax contract;
    a fake payload through audio_stats lax mode yields nulls, strict
    raises."""
    import pytest as _pytest

    from ramen_spark.operators.multimodal import audio_stats, synthetic_media

    fake = synthetic_media(spark, 9)  # payloads are NOT real WAVs
    lax = audio_stats(fake, strict=False).collect()
    assert len(lax) == 3 and all(r["sample_rate"] is None for r in lax)
    with _pytest.raises(Exception):
        audio_stats(fake, strict=True).collect()


def test_image_header_parse_png_jpeg_ppm():
    """Stdlib header parse: PNG IHDR geometry (on a spec-valid PNG
    built with zlib), JPEG SOF0 geometry (valid marker walk past
    APP0/DQT), PPM/PGM fallthrough, and error paths."""
    import pytest as _pytest

    from ramen_spark.operators.multimodal import (
        parse_image_header,
        synthetic_jpeg_header_bytes,
        synthetic_png_bytes,
        synthetic_ppm_bytes,
    )

    assert parse_image_header(synthetic_png_bytes(5, 4)) == ("png", 5, 4, 3)
    assert parse_image_header(synthetic_png_bytes(640, 480)) == (
        "png", 640, 480, 3,
    )
    assert parse_image_header(synthetic_jpeg_header_bytes(7, 3)) == (
        "jpeg", 7, 3, 3,
    )
    assert parse_image_header(synthetic_ppm_bytes(8, 6)) == ("ppm", 8, 6, 3)
    with _pytest.raises(ValueError):
        parse_image_header(b"GIF89a......")
    with _pytest.raises(ValueError):
        parse_image_header(b"\x89PNG\r\n\x1a\n" + b"\x00" * 4)  # truncated
    with _pytest.raises(ValueError):
        parse_image_header(b"\xff\xd8\xff\xd9")  # JPEG with no SOF


def test_jpeg_padding_and_terminal_markers():
    """T.81 edge cases the marker walk must survive: (a) runs of 0xFF
    fill bytes before a marker are padding, not a 0xFF marker code
    with a garbage length; (b) SOS (0xDA) and EOI (0xD9) have no
    walkable segment length — hitting them without a SOF is a clean
    ValueError, never a desync into entropy-coded data."""
    import struct

    import pytest as _pytest

    from ramen_spark.operators.multimodal import parse_image_header

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    sof0 = struct.pack(">BHHB", 8, 9, 11, 3) + b"\x01\x11\x00\x02\x11\x01\x03\x11\x01"
    # APP0, then FF-fill padding, then SOF0
    padded = (
        b"\xff\xd8"
        + seg(0xE0, b"JFIF\x00")
        + b"\xff\xff\xff"  # fill bytes (spec-valid padding)
        + seg(0xC0, sof0)
    )
    assert parse_image_header(padded) == ("jpeg", 11, 9, 3)

    # DQT then straight to SOS (no SOF): clean reject, the walk must
    # NOT read a "length" out of the entropy-coded bytes after SOS
    no_sof = (
        b"\xff\xd8"
        + seg(0xDB, b"\x00" + b"\x01" * 64)
        + b"\xff\xda"
        + b"\x93\x27\xfa\x01\x55"  # entropy-coded garbage
    )
    with _pytest.raises(ValueError):
        parse_image_header(no_sof)

    # padding immediately before EOI on an SOF-less stream
    with _pytest.raises(ValueError):
        parse_image_header(b"\xff\xd8" + seg(0xE0, b"JFIF\x00") + b"\xff\xff\xd9")

    # SOF truncated EXACTLY after the width field (missing the
    # channels byte at i+7): must be the intended ValueError
    # 'JPEG truncated SOF', never an IndexError from payload[i+7]
    sof_cut = b"\xff\xd8\xff\xc0" + struct.pack(">H", 11) + struct.pack(
        ">BHH", 8, 9, 11
    )
    with _pytest.raises(ValueError, match="truncated SOF"):
        parse_image_header(sof_cut)


def test_png_bytes_decodable_when_pil_present():
    """The synthetic PNG is a complete, valid file — if an imaging
    library is available it must decode to the same geometry/pixels."""
    from ramen_spark.operators.multimodal import (
        HAS_PIL,
        synthetic_png_bytes,
    )

    if not HAS_PIL:
        pytest.skip("PIL not in this container (gate under test elsewhere)")
    import io

    import PIL.Image

    img = PIL.Image.open(io.BytesIO(synthetic_png_bytes(9, 2, seed=3)))
    assert img.size == (9, 2) and img.mode == "RGB"


def test_image_headers_operator(spark):
    """The Arrow-batched geometry lane over a mixed media table:
    real geometry for PNG/JPEG/PPM rows with no imaging library, and
    the strict/lax contract for junk payloads."""
    import pytest as _pytest

    from ramen_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        image_headers,
        synthetic_jpeg_header_bytes,
        synthetic_png_bytes,
        synthetic_ppm_bytes,
    )

    rows = [
        (1, "image", bytearray(synthetic_png_bytes(12, 7)), None),
        (2, "image", bytearray(synthetic_jpeg_header_bytes(31, 17)), None),
        (3, "image", bytearray(synthetic_ppm_bytes(8, 6)), None),
        (4, "image", bytearray(b"not an image"), None),
        (5, "audio", bytearray(b"ignored: not kind=image"), None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in image_headers(media).collect()}
    assert set(got) == {1, 2, 3, 4}  # audio row filtered out
    assert (got[1]["format"], got[1]["width"], got[1]["height"], got[1]["channels"]) == ("png", 12, 7, 3)
    assert (got[2]["format"], got[2]["width"], got[2]["height"], got[2]["channels"]) == ("jpeg", 31, 17, 3)
    assert (got[3]["format"], got[3]["width"], got[3]["height"], got[3]["channels"]) == ("ppm", 8, 6, 3)
    assert got[4]["format"] is None and got[4]["width"] is None
    with _pytest.raises(Exception):
        image_headers(media, strict=True).collect()


def test_phash_near_dups_finds_planted_noisy_copies(spark):
    """pHash image dedup on real PPM decodes: plant noisy copies of
    base images (±2 luma jitter per pixel) among distinct random
    images — every planted (base, copy) pair lands within hamming 6
    and is found by the pigeonhole join; unrelated random pairs stay
    out. Also: the candidate join is an equi-join, never cartesian."""
    import numpy as np

    from ramen_spark.operators.multimodal import (
        image_phash,
        phash_near_dups,
        synthetic_ppm_bytes,
    )

    rng = np.random.default_rng(3)

    def ppm(pixels: np.ndarray) -> bytes:
        h, w, _ = pixels.shape
        return (
            f"P6\n{w} {h}\n255\n".encode()
            + pixels.astype(np.uint8).tobytes()
        )

    rows = []
    planted = set()
    n_base = 12
    for i in range(n_base):
        base = rng.integers(0, 256, size=(48, 64, 3))
        rows.append((i, "image", ppm(base), {}))
        if i < 6:  # noisy copy of the first six
            noise = rng.integers(-2, 3, size=base.shape)
            copy = np.clip(base + noise, 0, 255)
            rows.append((100 + i, "image", ppm(copy), {}))
            planted.add((i, 100 + i))
    df = spark.createDataFrame(
        rows,
        "media_id long, kind string, content binary, meta map<string,string>",
    )
    hashes = image_phash(df)
    pairs = phash_near_dups(hashes, max_hamming=6)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert planted <= got, f"missed {planted - got}"
    # random distinct images must not all collide: allow at most one
    # coincidental pair beyond the planted set
    assert len(got - planted) <= 1, got - planted

    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan

    # sanity: the 63-bit signature is stable across identical decodes
    one = {r["media_id"]: r["phash"] for r in hashes.collect()}
    assert all(v is not None and 0 <= v < (1 << 63) for v in one.values())
