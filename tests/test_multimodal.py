"""Multimodal binary-column plumbing: schema, Arrow batching, stubbed
decode boundary (SURVEY north-star extension)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_ingestion_auto_spark.operators import multimodal as M
from data_ingestion_auto_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    return M.media_from_documents(load_table(spark, sf_dir, "documents"))


def test_media_table_schema(media):
    d = dict(media.dtypes)
    assert d["payload"] == "binary"
    assert d["media_type"] == "string"
    assert d["meta"].startswith("struct<width:int")


def test_extract_features_deterministic(media):
    f1 = M.extract_features(media).orderBy("media_id").collect()
    f2 = M.extract_features(media).orderBy("media_id").collect()
    assert f1 == f2
    assert all(r.feat_dim == 16 and 0.0 <= r.feat_mean <= 1.0 for r in f1)
    assert all(r.payload_bytes > 0 for r in f1)


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        M.decode_image(b"\x89PNG...")


def test_frame_sampling_counts(media):
    frames = M.frame_sample_plan(media, every_n=4)
    per = frames.groupBy("media_id").agg(F.count("*").alias("n"), F.max("frame_idx").alias("mx"))
    meta = media.filter(F.col("media_type") == "video").select(
        "media_id", F.col("meta.n_frames").alias("n_frames")
    )
    joined = per.join(meta, "media_id").collect()
    for r in joined:
        expect = (r.n_frames + 3) // 4  # ceil(n_frames / 4) indices 0,4,8,...
        assert r.n == expect
        assert r.mx <= r.n_frames - 1
