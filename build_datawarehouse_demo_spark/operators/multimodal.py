"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side machinery is real and tested — binary schema, Arrow
batch transfer, mapInPandas operator shape, partition-size control.
The actual codec step is stubbed: PIL/torchaudio/ffmpeg are not in
this container, so `decode_image` raises NotImplementedError unless a
decoder import succeeds, and `fake_decode_metadata` derives
deterministic pseudo-metadata from the bytes so the pipeline is
end-to-end testable.

Scale notes: binary payloads ride in the same parquet row-group as
their metadata; filters on metadata columns prune row-groups without
touching payload bytes. mapInPandas streams Arrow batches, so executor
memory is bounded by batch size (spark.sql.execution.arrow.
maxRecordsPerBatch), not partition size.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MULTIMODAL_META_SCHEMA = (
    "id bigint, n_bytes bigint, fake_width int, fake_height int, content_md5 string"
)


def attach_binary(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Treat a text column as an opaque binary payload (UTF-8 bytes) —
    the test stand-in for reading real image/audio bytes."""
    return df.select(
        F.col(id_col).alias("id"), F.encode(F.col(text_col), "UTF-8").alias("payload")
    )


def fake_decode_metadata(df: DataFrame) -> DataFrame:
    """'Decode' binary payloads into typed metadata with mapInPandas.

    The decode itself is a deterministic fake (first two bytes stand in
    for width/height); the Spark-side contract — binary in Arrow
    batches, typed struct out — is exactly what a PIL/libvips decode
    UDF would use.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "fake_width": payloads.map(lambda b: b[0] if len(b) > 0 else 0).astype("int32"),
                    "fake_height": payloads.map(lambda b: b[1] if len(b) > 1 else 0).astype("int32"),
                    "content_md5": payloads.map(lambda b: hashlib.md5(b).hexdigest()),
                }
            )

    return df.mapInPandas(decode, schema=MULTIMODAL_META_SCHEMA)


def decode_image(df: DataFrame) -> DataFrame:
    """Real image decode — requires a codec library absent from this
    container. The plumbing (same shape as fake_decode_metadata) is the
    deliverable; the codec is the stub."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - container has no PIL
        raise NotImplementedError(
            "image decoding needs PIL/pillow on executors; "
            "use fake_decode_metadata for pipeline tests"
        ) from exc

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:  # pragma: no cover
        import io

        import PIL.Image

        for pdf in batches:
            ims = pdf["payload"].map(lambda b: PIL.Image.open(io.BytesIO(b)))
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "fake_width": ims.map(lambda im: im.width).astype("int32"),
                    "fake_height": ims.map(lambda im: im.height).astype("int32"),
                    "content_md5": pdf["payload"].map(
                        lambda b: __import__("hashlib").md5(b).hexdigest()
                    ),
                }
            )

    return df.mapInPandas(decode, schema=MULTIMODAL_META_SCHEMA)
