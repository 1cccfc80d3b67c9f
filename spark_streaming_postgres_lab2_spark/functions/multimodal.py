"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Pattern for image/audio/video at 100 TB: the payload is an opaque
``binary`` column with a typed metadata struct alongside; decode /
feature-extract / resize run as Arrow-batched ``mapInPandas`` stages so
bytes never round-trip through Python row-by-row.

The actual codec step is STUBBED (image/audio libraries are not in
this container): ``decode_features`` computes deterministic
byte-level pseudo-features with the REAL Spark plumbing (schema,
partitioning, Arrow batch shape), and ``decode_real`` raises
``NotImplementedError`` to mark where a codec would plug in.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, media_type string, n_bytes long, checksum long, "
    "head_bytes array<int>, feature_mean double"
)


def synthesize_media(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic fake media table from documents: UTF-8 bytes of the
    text as the opaque payload + typed metadata.  Stands in for an
    image/audio corpus so the downstream plumbing is real and testable."""
    content = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        F.col(id_col).alias("media_id"),
        (F.when(F.col(id_col) % 3 == 0, "image")
         .when(F.col(id_col) % 3 == 1, "audio")
         .otherwise("video")).alias("media_type"),
        content.alias("content"),
        F.struct(
            F.lit("raw").alias("format"),
            F.lit(64).alias("width"),
            F.lit(64).alias("height"),
            F.octet_length(F.col(text_col)).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_features(media: DataFrame) -> DataFrame:
    """Arrow-batched 'decode': per-partition pandas batches compute
    deterministic byte-level pseudo-features (length, checksum, first
    bytes, mean byte value).  Swap the body for a real codec
    (PIL/librosa/ffmpeg) without touching the Spark plumbing."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["content"]
            n_bytes = payloads.map(lambda b: len(b) if b is not None else 0)
            checksum = payloads.map(
                lambda b: int(sum(b) % 2**31) if b is not None else 0
            )
            head = payloads.map(
                lambda b: [int(x) for x in (b or b"")[:4]]
            )
            fmean = payloads.map(
                lambda b: float(sum(b)) / len(b) if b else 0.0
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": n_bytes.astype("int64"),
                    "checksum": checksum.astype("int64"),
                    "head_bytes": head,
                    "feature_mean": fmean.round(4),
                }
            )

    return media.mapInPandas(_decode, schema=FEATURE_SCHEMA)


def decode_real(media: DataFrame, codec: str = "pil") -> DataFrame:
    """Where a real image/audio decoder would plug in (PIL, librosa,
    torchaudio...).  Not available in this environment."""
    raise NotImplementedError(
        f"real media decoding ({codec}) requires codec libraries not present "
        "in this environment; use decode_features for the deterministic stub"
    )


def resize_stub(media: DataFrame, target_bytes: int = 256) -> DataFrame:
    """'Resize' stand-in: deterministic byte-level down/up-sampling of
    the payload to ``target_bytes`` (stride sampling, zero padding).
    A real implementation would decode -> PIL.resize -> re-encode inside
    the same mapInPandas body; the Spark-side contract (binary in,
    binary out, metadata updated) is identical."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def shrink(b: bytes | None) -> bytes | None:
                if b is None:
                    return None  # missing media stays missing
                if not b:
                    return b"\x00" * target_bytes
                if len(b) >= target_bytes:
                    stride = len(b) / target_bytes
                    return bytes(b[int(i * stride)] for i in range(target_bytes))
                return b + b"\x00" * (target_bytes - len(b))

            resized = pdf["content"].map(shrink)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "content": resized,
                    "n_bytes": resized.map(lambda b: len(b) if b is not None else None),
                }
            )

    return media.mapInPandas(
        _resize, schema="media_id long, media_type string, content binary, n_bytes long"
    )


def frame_sample(media: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' over the opaque payload: take one byte every
    ``every_n_bytes`` as a stand-in for video frame extraction --
    demonstrates slicing binary columns inside mapInPandas."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = pdf["content"].map(
                lambda b: [int(x) for x in (b or b"")[::every_n_bytes]]
            )
            yield pd.DataFrame({"media_id": pdf["media_id"], "frames": frames})

    return media.mapInPandas(_sample, schema="media_id long, frames array<int>")
