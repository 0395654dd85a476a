"""Multimodal column plumbing (LLM-data-pipeline surface).

Treats image/audio/video payloads as opaque ``binary`` columns with a
typed metadata struct, per the standard lakehouse pattern. The Spark
side — schema, partition-preserving ``mapInPandas`` feature
extraction, Arrow batch shapes — is real and tested; the actual
codec decode is STUBBED (Pillow/librosa/av are not in this runtime):
``decode_image_batch`` raises ``NotImplementedError`` unless
``fake=True``, in which case a deterministic fake decoder (seeded by
the payload hash) produces stable pseudo-dimensions so the
downstream plumbing is exercisable end-to-end.

At scale: media payloads dominate row size, so the operators keep
binary columns out of shuffles — metadata-only projections go through
aggregations, and feature extraction is a mapInPandas pass with no
shuffle at all (partition-local, Arrow-batched).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from trendengine_spark.operators.util import fan_out

#: Canonical media metadata struct.
MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType(), True),  # image|audio|video
        T.StructField("format", T.StringType(), True),      # png|jpeg|wav|...
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mean_luma", T.DoubleType(), True),
    ]
)


def attach_fake_media(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic fake media column for plumbing tests: payload =
    UTF-8 bytes of the text, metadata derived from the id. Replace
    with a real binary source (``spark.read.format('binaryFile')`` or
    parquet with a binary column) in production."""
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "UTF-8").alias("media"),
        F.struct(
            F.lit("image").alias("media_type"),
            F.lit("fake").alias("format"),
            ((F.col(id_col) % 64) * 16 + 64).cast("int").alias("width"),
            ((F.col(id_col) % 48) * 16 + 64).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("media_meta"),
    )


def decode_image_batch(payloads: pd.Series, fake: bool = False) -> pd.DataFrame:
    """Decode a batch of image payloads → (width, height, mean_luma).

    Real decode needs an imaging library absent from this runtime —
    see the guard. The ``fake=True`` path derives stable values from
    the payload bytes (first/last byte + length) so tests exercise the
    full Arrow round trip deterministically.
    """
    if not fake:
        raise NotImplementedError(
            "image decode requires an imaging library (e.g. Pillow) not "
            "present in this runtime; pass fake=True for the deterministic "
            "plumbing-test decoder"
        )
    n = payloads.str.len().fillna(0).astype("int64")
    first = payloads.map(lambda b: b[0] if b else 0).astype("int64")
    last = payloads.map(lambda b: b[-1] if b else 0).astype("int64")
    return pd.DataFrame(
        {
            "width": (64 + (n % 512)).astype("int32"),
            "height": (64 + ((n * 7 + first) % 512)).astype("int32"),
            "mean_luma": ((first + last) % 256) / 255.0,
        }
    )


def extract_media_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """Partition-local feature extraction over the media column via
    ``mapInPandas`` (Arrow-batched, no shuffle). Output schema is
    :data:`FEATURE_SCHEMA`."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = decode_image_batch(pdf["media"], fake=fake)
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": pdf["media"].str.len().astype("int64"),
                    "width": feats["width"],
                    "height": feats["height"],
                    "mean_luma": feats["mean_luma"],
                }
            )
            yield out

    return fan_out(df.select("doc_id", "media")).mapInPandas(gen, FEATURE_SCHEMA)


def media_content_stats(df: DataFrame) -> DataFrame:
    """Metadata-only roll-up (binary column pruned from the scan):
    byte length + sha256 content hash per document — the dedup key
    for binary payloads."""
    return df.select(
        "doc_id",
        F.octet_length("media").alias("n_bytes"),
        F.sha2("media", 256).alias("sha256_hex"),
        F.col("media_meta.width").alias("width"),
        F.col("media_meta.height").alias("height"),
    )
