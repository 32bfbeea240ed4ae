"""Multimodal binary-column plumbing tests."""

from __future__ import annotations

import pytest
import pyspark.sql.functions as F

from harvard_artifacts_collection_data_engineering_analytics_app_spark.operators import (
    multimodal as M,
)


@pytest.fixture()
def blobs(spark):
    rows = [
        (1, bytes.fromhex("89504E47") + b"fakepng"),
        (2, bytes.fromhex("FFD8FF") + b"fakejpeg"),
        (3, b"plain text bytes"),
        (4, bytes.fromhex("25504446") + b"fakepdf"),
    ]
    return spark.createDataFrame(rows, "doc_id long, blob binary")


def test_magic_byte_format_detection(blobs):
    out = {r["doc_id"]: r["format"] for r in
           blobs.select("doc_id", M.detect_format(F.col("blob")).alias("format")).collect()}
    assert out == {1: "png", 2: "jpeg", 3: "unknown", 4: "pdf"}


def test_blob_metadata(blobs):
    rows = {r["doc_id"]: r for r in M.with_blob_metadata(blobs).collect()}
    assert rows[3]["n_bytes"] == len(b"plain text bytes")
    assert len(rows[1]["content_sha256"]) == 64


def test_decode_pipeline_deterministic(blobs):
    out1 = sorted(M.decode_images(blobs, partitions=2).collect())
    out2 = sorted(M.decode_images(blobs, partitions=3).collect())
    assert out1 == out2  # partitioning must not change results
    r = {x["doc_id"]: x for x in out1}
    assert r[1]["format"] == "png"
    assert r[1]["n_pixels"] == r[1]["width"] * r[1]["height"]
    assert r[3]["thumbnail"] == b"plain text bytes"[:16]


def test_real_decoder_is_stubbed():
    with pytest.raises(NotImplementedError):
        M.decode_image(b"\x89PNGxxxx")
