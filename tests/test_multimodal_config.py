"""Multimodal plumbing + config validation."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from spark_streaming_postgres_lab2_spark.config import EngineConfig, load_config
from spark_streaming_postgres_lab2_spark.functions.multimodal import (
    decode_features,
    decode_real,
    frame_sample,
    synthesize_media,
)
from spark_streaming_postgres_lab2_spark.sources.tables import load_tables


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = load_tables(spark, sf_dir, ["documents"])["documents"].limit(50)
    return synthesize_media(docs)


def test_media_schema(media):
    assert dict(media.dtypes)["content"] == "binary"
    assert media.filter(F.col("meta.n_bytes") != F.octet_length("content")).count() == 0


def test_decode_features_deterministic(media):
    a = {r["media_id"]: r["checksum"] for r in decode_features(media).collect()}
    b = {r["media_id"]: r["checksum"] for r in decode_features(media).collect()}
    assert a == b and len(a) == 50


def test_decode_features_match_payload(spark, media):
    feats = decode_features(media)
    joined = feats.join(media, "media_id")
    assert joined.filter(F.col("n_bytes") != F.octet_length("content")).count() == 0


def test_frame_sample_shapes(media):
    row = frame_sample(media, every_n_bytes=16).first()
    assert isinstance(row["frames"], list) and len(row["frames"]) >= 1


def test_decode_real_is_stubbed(media):
    with pytest.raises(NotImplementedError):
        decode_real(media)


def test_config_defaults_valid():
    cfg = load_config()
    assert cfg.validate() == []
    d = cfg.to_dict()
    assert "password" not in d["database"]  # secret-free serialization


def test_config_validation_catches_bad_values():
    cfg = EngineConfig()
    cfg.quality.min_validity_rate = 2.0
    cfg.retry.backoff_factor = 0.5
    problems = cfg.validate()
    assert len(problems) == 2


def test_jdbc_url_shape():
    cfg = EngineConfig()
    assert cfg.database.jdbc_url.startswith("jdbc:postgresql://")
    assert cfg.database.jdbc_properties()["batchsize"] == "5000"


def test_resize_stub_shapes(spark, media):
    from spark_streaming_postgres_lab2_spark.functions.multimodal import resize_stub

    out = resize_stub(media, target_bytes=128).collect()
    assert len(out) == 50
    assert all(len(r["content"]) == 128 and r["n_bytes"] == 128 for r in out)
    # deterministic
    again = resize_stub(media, target_bytes=128).collect()
    assert {r["media_id"]: bytes(r["content"]) for r in out} == {
        r["media_id"]: bytes(r["content"]) for r in again
    }
