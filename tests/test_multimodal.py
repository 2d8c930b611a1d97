"""Multimodal binary plumbing: Arrow-batched mapInPandas metadata
extraction + the honest NotImplementedError on the codec stub."""

from __future__ import annotations

import hashlib

import pytest

from build_datawarehouse_demo_spark.operators.multimodal import (
    attach_binary,
    decode_image,
    fake_decode_metadata,
)


def test_fake_decode_metadata_deterministic(spark):
    df = spark.createDataFrame([(1, "AB test payload"), (2, "")], "doc_id long, text string")
    rows = {r.id: r for r in fake_decode_metadata(attach_binary(df)).collect()}
    assert rows[1].n_bytes == 15
    assert rows[1].fake_width == ord("A") and rows[1].fake_height == ord("B")
    assert rows[1].content_md5 == hashlib.md5(b"AB test payload").hexdigest()
    assert rows[2].n_bytes == 0 and rows[2].fake_width == 0 and rows[2].fake_height == 0


def test_binary_schema_is_binary(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    bin_df = attach_binary(df)
    assert dict(bin_df.dtypes)["payload"] == "binary"


def test_decode_image_stub_raises_without_codec(spark):
    df = attach_binary(spark.createDataFrame([(1, "x")], "doc_id long, text string"))
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present; stub path not applicable")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="PIL"):
        decode_image(df)
