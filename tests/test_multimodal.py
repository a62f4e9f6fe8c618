"""Multimodal tests: schema, Arrow batch shape, deterministic fake decode,
REAL stdlib decode for uncompressed formats (BMP via struct, WAV via wave —
round-2 verdict item 5), metadata-only frame planning."""

import io
import struct
import wave

import numpy as np
import pytest
from pyspark.sql import functions as F

from entity_linking_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_media,
    extract_features,
    fake_decode_features,
    frame_sample_plan,
    pooled_features,
    resize_stub,
)


def _bmp_bytes(pixels: np.ndarray) -> bytes:
    """Serialize an (h, w, 3) uint8 RGB array as an uncompressed 24-bit BMP
    (bottom-up rows, 4-byte padded, BGR channel order)."""
    h, w, _ = pixels.shape
    stride = (w * 3 + 3) // 4 * 4
    body = bytearray()
    for y in range(h - 1, -1, -1):
        for x in range(w):
            r, g, b = pixels[y, x]
            body += bytes([b, g, r])
        body += b"\x00" * (stride - w * 3)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 0, 0, 0, 0)
    head = b"BM" + struct.pack("<IHHI", 14 + 40 + len(body), 0, 0, 54)
    return head + info + bytes(body)


def _wav_bytes(samples: np.ndarray, rate: int = 8000) -> bytes:
    """Serialize int16 mono samples as a PCM WAV."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(samples.astype(np.int16).tobytes())
    return buf.getvalue()


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", "image/png", bytes([137, 80, 78, 71]) * 10, (64, 48, None, 40)),
        (2, "image", "image/jpeg", b"\xff\xd8\xff" * 30, (640, 480, None, 90)),
        (3, "audio", "audio/wav", b"RIFF" + b"\x00" * 100, (None, None, 4500, 104)),
        (4, "video", "video/mp4", b"ftyp" + b"\x01" * 200, (1280, 720, 10500, 204)),
        (5, "image", "image/png", None, (None, None, None, 0)),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_decode_bmp_real_pixels():
    px = np.arange(4 * 3 * 3, dtype=np.uint8).reshape(4, 3, 3)
    out = decode_media(_bmp_bytes(px), "image/bmp")
    assert out.shape == (4, 3, 3)
    assert out.dtype == np.float32
    assert np.allclose(out, px.astype(np.float32) / 255.0)


def test_decode_wav_real_samples():
    samples = (np.sin(np.linspace(0, 6.28, 200)) * 20000).astype(np.int16)
    out = decode_media(_wav_bytes(samples), "audio/wav")
    assert out.shape == (200, 1)
    assert np.allclose(out[:, 0], samples.astype(np.float32) / 32768.0)


def test_compressed_mimes_still_raise():
    with pytest.raises(NotImplementedError):
        decode_media(b"\x89PNG....", "image/png")
    with pytest.raises(NotImplementedError):
        decode_media(b"\xff\xd8\xff", "image/jpeg")
    with pytest.raises(ValueError):
        decode_media(b"not a bmp", "image/bmp")


def test_real_decoder_in_spark_plan(spark):
    px = np.full((8, 8, 3), 128, dtype=np.uint8)
    samples = (np.ones(64) * 1000).astype(np.int16)
    rows = [
        (10, "image", "image/bmp", _bmp_bytes(px), (8, 8, None, None)),
        (11, "audio", "audio/wav", _wav_bytes(samples), (None, None, 8, None)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {
        r["media_id"]: np.array(r["feature"], np.float32)
        for r in extract_features(media, use_real_decoder=True).collect()
    }
    want_img = pooled_features(decode_media(_bmp_bytes(px), "image/bmp"))
    want_aud = pooled_features(decode_media(_wav_bytes(samples), "audio/wav"))
    assert np.allclose(out[10], want_img, atol=1e-6)
    assert np.allclose(out[11], want_aud, atol=1e-6)
    # real values, not the hash fake
    assert np.allclose(out[10], 128.0 / 255.0, atol=1e-3)
    assert np.allclose(out[11], 1000.0 / 32768.0, atol=1e-4)


def test_fake_decode_deterministic_unit():
    a = fake_decode_features(b"payload")
    b = fake_decode_features(b"payload")
    c = fake_decode_features(b"other")
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)
    assert abs(float(np.linalg.norm(a)) - 1.0) < 1e-6
    assert np.array_equal(fake_decode_features(None), np.zeros(16, np.float32))


def test_extract_features_schema_and_values(spark, media):
    out = extract_features(media)
    assert out.schema.simpleString() == (
        "struct<media_id:bigint,kind:string,feature:array<float>>"
    )
    rows = {r["media_id"]: r for r in out.collect()}
    assert len(rows) == 5
    assert len(rows[1]["feature"]) == 16
    # matches the driver-side fake (same bytes → same vector through Arrow)
    want = fake_decode_features(bytes([137, 80, 78, 71]) * 10)
    got = np.array(rows[1]["feature"], dtype=np.float32)
    assert np.allclose(got, want, atol=1e-6)
    assert rows[5]["feature"] == [0.0] * 16  # null payload


def test_real_decoder_path_raises_on_compressed(spark, media):
    # the fixture's payloads are compressed mimes (png/jpeg/mp4) and a
    # malformed RIFF blob — the real decoder must refuse loudly rather
    # than fake features; whichever row's task fails first surfaces either
    # the no-codec NotImplementedError or the wave parse error
    with pytest.raises(Exception) as exc:
        extract_features(media, use_real_decoder=True).collect()
    msg = str(exc.value)
    assert any(s in msg for s in ("NotImplementedError", "no codec", "wave"))


def test_frame_sample_plan_metadata_only(spark, media, tmp_path):
    # pruning is only observable on a file scan (LocalTableScan keeps all
    # columns), so round-trip through parquet first
    media.write.mode("overwrite").parquet(str(tmp_path / "media"))
    on_disk = spark.read.parquet(str(tmp_path / "media"))
    frames = frame_sample_plan(on_disk, every_ms=1000)
    rows = frames.collect()
    # only the video row (10500ms → 10 frames at 1s)
    assert {r["media_id"] for r in rows} == {4}
    assert len(rows) == 10
    assert max(r["frame_ts_ms"] for r in rows) == 9000
    # the parquet scan must not read the payload column (column pruning)
    plan = frames._jdf.queryExecution().executedPlan().toString()
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema and "payload" not in read_schema[0]


def test_resize_stub_rewrites_meta(spark, media):
    out = resize_stub(media, 32, 32).select("media_id", "meta.width", "meta.height")
    for r in out.collect():
        assert (r["width"], r["height"]) == (32, 32)
