"""Multimodal plumbing tests: schema, Arrow batch shape, deterministic fake
decode, stubbed real decode, metadata-only frame planning."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from entity_linking_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_media,
    extract_features,
    fake_decode_features,
    frame_sample_plan,
    resize_stub,
)


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


def test_real_decoder_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_media(b"bytes", "image/png")


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


def test_real_decoder_path_raises_in_plan(spark, media):
    with pytest.raises(Exception) as exc:
        extract_features(media, use_real_decoder=True).collect()
    assert "NotImplementedError" in str(exc.value) or "media decoding" in str(
        exc.value
    )


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
