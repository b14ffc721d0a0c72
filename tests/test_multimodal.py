"""Multimodal plumbing: binary payload column + mapInPandas contract."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from vector_search_ai_assistant_mongodbvcore_spark.sources.multimodal import (
    MEDIA_SCHEMA,
    extract_features,
    fake_decoder,
)


@pytest.fixture()
def media(spark):
    rows = [
        ("m1", "image", "image/png", 4, 4, None, bytes(range(16))),
        ("m2", "image", "image/png", 2, 2, None, b"\xff\x00\xff\x00"),
        ("m3", "audio", "audio/wav", None, None, 1000, b""),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_fake_decoder_features(spark, media):
    out = {r.media_id: r for r in extract_features(media, decoder=fake_decoder).collect()}
    assert all(out[m].decode_ok for m in ("m1", "m2", "m3"))
    assert len(out["m1"].feature) == 8
    f = out["m1"].feature
    assert f[2] == 0.0 and f[3] == 15.0 and f[4] == 16.0  # min, max, length
    assert out["m3"].feature == [0.0] * 8  # empty payload -> zero feature


def test_default_decoder_is_honest_stub(spark, media):
    with pytest.raises(Exception):  # NotImplementedError surfaces via Py4J
        extract_features(media).collect()


def test_failing_rows_flagged_not_fatal(spark, media):
    def half_broken(payload: bytes) -> np.ndarray:
        if len(payload) == 0:
            raise ValueError("cannot decode empty payload")
        return fake_decoder(payload)

    out = {r.media_id: r for r in extract_features(media, decoder=half_broken).collect()}
    assert out["m1"].decode_ok and out["m2"].decode_ok
    assert not out["m3"].decode_ok  # flagged, row preserved


def test_batch_rows_bounds_memory_not_results(spark, media):
    small = {r.media_id: r.feature for r in extract_features(media, decoder=fake_decoder, batch_rows=1).collect()}
    large = {r.media_id: r.feature for r in extract_features(media, decoder=fake_decoder, batch_rows=64).collect()}
    assert small == large


def test_resize_media_with_fake_kernel(spark, media):
    from vector_search_ai_assistant_mongodbvcore_spark.sources.multimodal import (
        fake_resizer,
        resize_media,
    )

    out = {r["media_id"]: r for r in resize_media(media, 4, 3, resizer=fake_resizer).collect()}
    assert len(out) == media.count()
    for r in out.values():
        assert r["width"] == 4 and r["height"] == 3 and r["resize_ok"]
        assert len(bytes(r["payload"])) == 12  # clamped/padded to w*h


def test_resize_without_kernel_is_honest_stub(spark, media):
    from vector_search_ai_assistant_mongodbvcore_spark.sources.multimodal import resize_media

    with pytest.raises(Exception, match="No image codec"):
        resize_media(media, 2, 2).collect()


def test_resize_failures_quarantined_not_fatal(spark, media):
    from vector_search_ai_assistant_mongodbvcore_spark.sources.multimodal import resize_media

    def flaky(payload: bytes, w: int, h: int) -> bytes:
        if len(payload) % 2 == 0:
            raise ValueError("bad image")
        return payload[: w * h]

    rows = resize_media(media, 2, 2, resizer=flaky).collect()
    assert any(not r["resize_ok"] for r in rows) or all(len(bytes(r["payload"])) % 2 for r in rows)
    assert len(rows) == media.count()  # no row lost


def test_sample_frames_with_fake_kernel(spark):
    from vector_search_ai_assistant_mongodbvcore_spark.sources.multimodal import (
        fake_frame_sampler,
        sample_frames,
    )

    rows = [
        ("v1", bytearray(b"0123456789abcdef"), 1000),
        ("v2", bytearray(b"xy"), None),      # shorter than n_frames slices
        ("v3", bytearray(b""), 400),         # empty payload: zero frames
    ]
    media = spark.createDataFrame(
        rows, "media_id string, payload binary, duration_ms int"
    )
    out = sample_frames(media, n_frames=4, sampler=fake_frame_sampler).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["media_id"], []).append(r)
    assert len(by_id["v1"]) == 4
    assert [r["frame_idx"] for r in sorted(by_id["v1"], key=lambda r: r["frame_idx"])] == [0, 1, 2, 3]
    # uniform timestamps over duration
    assert [r["ts_ms"] for r in sorted(by_id["v1"], key=lambda r: r["frame_idx"])] == [0, 250, 500, 750]
    # frame payloads reassemble the original stream
    assert b"".join(bytes(r["payload"]) for r in sorted(by_id["v1"], key=lambda r: r["frame_idx"])) == b"0123456789abcdef"
    # no duration -> NULL timestamps, frames still emitted
    assert all(r["ts_ms"] is None for r in by_id["v2"])
    assert "v3" not in by_id


def test_sample_frames_without_kernel_is_honest_stub(spark):
    from vector_search_ai_assistant_mongodbvcore_spark.sources.multimodal import sample_frames

    media = spark.createDataFrame(
        [("v1", bytearray(b"abc"), 100)], "media_id string, payload binary, duration_ms int"
    )
    with pytest.raises(Exception, match="No video codec"):
        sample_frames(media).collect()
