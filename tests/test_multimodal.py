"""Multimodal plumbing: binary columns through mapInPandas; the codec
itself is stubbed (libs absent) but batch shape / schema / metadata
explosion are real."""

from pyspark.sql import functions as F

from reader_spark.operators import multimodal as MM


def media_df(spark):
    rows = [
        (1, "image", "image/png", bytearray(b"\x89PNG-fake-1"),
         (640, 480, None, None)),
        (2, "image", "image/png", bytearray(b"\x89PNG-fake-2"),
         (64, 64, None, None)),
        (3, "video", "video/mp4", bytearray(b"mp4-fake"),
         (1920, 1080, 3500, None)),
        (4, "audio", "audio/wav", None, (None, None, 2000, 16000)),
    ]
    return spark.createDataFrame(rows, MM.MEDIA_SCHEMA)


def test_extract_features_shape(spark):
    out = MM.extract_features(media_df(spark), dim=8).collect()
    by_id = {r["media_id"]: r for r in out}
    assert len(out) == 4
    assert by_id[1]["n_bytes"] == 11
    assert len(by_id[1]["feat"]) == 8
    assert all(0.0 <= x <= 1.0 for x in by_id[1]["feat"])
    # deterministic: same bytes -> same features
    again = {r["media_id"]: r for r in MM.extract_features(media_df(spark), dim=8).collect()}
    assert again[2]["feat"] == by_id[2]["feat"]
    assert by_id[1]["feat"] != by_id[2]["feat"]
    # null payload propagates
    assert by_id[4]["sha256"] is None and by_id[4]["feat"] is None


def test_frame_sample_plan(spark):
    out = MM.frame_sample_plan(media_df(spark), every_ms=1000).collect()
    stamps = sorted(r["sample_ms"] for r in out)
    assert stamps == [0, 1000, 2000, 3000]  # duration 3500ms, 1s cadence
    assert {r["media_id"] for r in out} == {3}


def test_decoder_stub_raises_not_implemented():
    import pytest

    with pytest.raises((NotImplementedError, Exception)):
        MM.DECODERS["image"](b"not-an-image")
