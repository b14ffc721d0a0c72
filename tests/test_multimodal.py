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
