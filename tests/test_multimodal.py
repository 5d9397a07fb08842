"""Multimodal column plumbing tests: binary + metadata schema, Arrow-batched
decode stub, real binary features."""

import hashlib

import pytest
from pyspark.sql import functions as F

from chessmate_spark.operators.multimodal import (
    attach_fake_media,
    binary_features,
    byte_entropy,
    decode_image_features,
    frame_sample,
)


@pytest.fixture(scope="module")
def media(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, ""), (3, None), (4, "spark media pipeline")],
        "doc_id long, text string",
    )
    return attach_fake_media(df, "doc_id", "text")


def test_media_schema(media):
    assert dict(media.dtypes)["blob"] == "binary"
    meta_type = dict(media.dtypes)["meta"]
    assert "mime" in meta_type and "n_frames" in meta_type


def test_binary_features_real(media):
    rows = {r["media_id"]: r for r in binary_features(media).collect()}
    assert rows[1]["blob_len"] == len(b"hello world")
    assert rows[1]["blob_md5"] == hashlib.md5(b"hello world").hexdigest()
    assert rows[1]["magic_hex"] == b"hell".hex()
    assert rows[2]["blob_len"] == 0


def test_decode_stub_batch_shape(media):
    rows = {r["media_id"]: r for r in decode_image_features(media).collect()}
    assert len(rows) == 4
    r = rows[1]
    assert r["decoded"] is True
    assert r["width"] >= 16 and r["height"] >= 16
    assert 0.0 <= r["mean_r"] <= 1.0
    assert "stub" in r["decode_note"]
    # deterministic: same blob -> same fake stats
    digest = hashlib.md5(b"hello world").digest()
    assert r["width"] == digest[0] * 4 + 16


def test_entropy(media):
    rows = {r["media_id"]: r for r in byte_entropy(media).collect()}
    assert rows[2]["entropy"] == 0.0
    assert rows[1]["entropy"] > 2.0  # natural text entropy


def test_frame_sample(media):
    frames = frame_sample(media, every_n=1).collect()
    # every fake media row has n_frames=1 -> exactly one frame each
    assert len(frames) == 4
    assert all(f["frame_index"] == 0 for f in frames)
