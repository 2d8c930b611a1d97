"""Multimodal binary plumbing: Arrow-batched mapInPandas metadata
extraction + real end-to-end image decode (built-in BMP parser; PIL
used opportunistically when present)."""

from __future__ import annotations

import hashlib
import struct

import pytest

from build_datawarehouse_demo_spark.operators.multimodal import (
    attach_binary,
    decode_bmp_header,
    decode_image,
    fake_decode_metadata,
)


def _bmp_bytes(width: int, height: int, core_header: bool = False) -> bytes:
    """Assemble a minimal valid BMP: 14-byte file header + DIB header
    (24bpp, no compression) + padded pixel rows."""
    if core_header:
        dib = struct.pack("<IHHHH", 12, width, height, 1, 24)
    else:
        dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, 0, 2835, 2835, 0, 0)
    row = (3 * width + 3) // 4 * 4
    pixels = bytes(row) * abs(height)
    off = 14 + len(dib)
    return struct.pack("<2sIHHI", b"BM", off + len(pixels), 0, 0, off) + dib + pixels


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


def test_decode_bmp_header_variants():
    assert decode_bmp_header(_bmp_bytes(7, 5)) == (7, 5)
    assert decode_bmp_header(_bmp_bytes(3, 2, core_header=True)) == (3, 2)
    # top-down BMP stores negative height
    b = bytearray(_bmp_bytes(4, 6))
    b[22:26] = struct.pack("<i", -6)
    assert decode_bmp_header(bytes(b)) == (4, 6)
    assert decode_bmp_header(b"\x89PNG\r\n\x1a\n" + bytes(20)) is None
    assert decode_bmp_header(b"BM") is None  # truncated


def test_decode_image_end_to_end_without_pil(spark):
    """Real bytes through the full Spark path — binary column, Arrow
    batches, mapInPandas — decoded by the dependency-free BMP parser
    (this container has no PIL)."""
    rows = [(1, _bmp_bytes(7, 5)), (2, _bmp_bytes(640, 480)), (3, None)]
    df = spark.createDataFrame(rows, "id long, payload binary")
    got = {r.id: r for r in decode_image(df).collect()}
    assert (got[1].width, got[1].height, got[1].format) == (7, 5, "bmp")
    assert (got[2].width, got[2].height) == (640, 480)
    assert got[1].n_bytes == len(rows[0][1])
    assert got[1].content_md5 == hashlib.md5(rows[0][1]).hexdigest()
    assert got[3].width is None and got[3].content_md5 is None  # null payload -> null meta


def test_decode_image_unknown_format_fails_loud(spark):
    df = spark.createDataFrame([(1, b"\x89PNG\r\n\x1a\n" + bytes(64))], "id long, payload binary")
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present; it may actually decode PNG")
    except ImportError:
        pass
    with pytest.raises(Exception, match="no decoder for payload"):
        decode_image(df).collect()


def test_resize_payload_nearest_kernel(spark):
    from build_datawarehouse_demo_spark.operators.multimodal import resize_payload_nearest

    df = spark.createDataFrame(
        [(1, b"abcd"), (2, b"x"), (3, None), (4, b"")],
        "id long, payload binary",
    )
    rows = {r["id"]: r for r in resize_payload_nearest(df, target_bytes=8).collect()}
    # null/empty payloads are skipped, not fatal
    assert set(rows) == {1, 2}
    import hashlib

    # id 1: n=4, target=8 -> indices (j*4)//8 = [0,0,1,1,2,2,3,3]
    assert rows[1]["resized_md5"] == hashlib.md5(b"aabbccdd").hexdigest()
    assert rows[1]["src_bytes"] == 4 and rows[1]["dst_bytes"] == 8
    # id 2: single byte replicated
    assert rows[2]["resized_md5"] == hashlib.md5(b"xxxxxxxx").hexdigest()
    with pytest.raises(ValueError):
        resize_payload_nearest(df, target_bytes=0)


def test_audio_windows_overlap_and_energy(spark):
    """Overlapped framing: hop < window means consecutive windows
    share bytes (the STFT shape sample_frames' disjoint stride can't
    express); energy = byte-value sum; payloads shorter than one
    window emit nothing; nulls skip."""
    import pytest

    from build_datawarehouse_demo_spark.operators.multimodal import (
        attach_binary,
        audio_windows,
    )

    df = spark.createDataFrame(
        [(1, "abcdefgh"), (2, "ab"), (3, None)], "doc_id long, text string"
    )
    rows = sorted(
        audio_windows(attach_binary(df), window_bytes=4, hop_bytes=2).collect(),
        key=lambda r: (r.id, r.win_idx),
    )
    got = [(r.id, r.win_idx, r.win_off, r.n_bytes, r.energy) for r in rows]
    abcd = sum(b"abcd")
    assert got == [
        (1, 0, 0, 4, abcd),
        (1, 1, 2, 4, sum(b"cdef")),
        (1, 2, 4, 4, sum(b"efgh")),
    ]
    with pytest.raises(ValueError):
        audio_windows(attach_binary(df), window_bytes=4, hop_bytes=0)
