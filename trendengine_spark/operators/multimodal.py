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


def attach_fake_video(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic fake video column for plumbing tests: payload =
    UTF-8 bytes of the text, duration keyed off the id (1..120 s)."""
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "UTF-8").alias("media"),
        F.struct(
            F.lit("video").alias("media_type"),
            F.lit("fake").alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            (((F.col(id_col) % 120) + 1) * 1000).cast("long").alias("duration_ms"),
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


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("out_width", T.IntegerType(), True),
        T.StructField("out_height", T.IntegerType(), True),
        T.StructField("media", T.BinaryType(), True),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("frame_idx", T.IntegerType(), True),
        T.StructField("ts_ms", T.LongType(), True),
        T.StructField("frame_md5", T.StringType(), True),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


def resize_images(
    df: DataFrame, max_side: int = 256, fake: bool = False
) -> DataFrame:
    """Aspect-preserving resize plumbing via ``mapInPandas`` (Arrow
    batches, partition-local, no shuffle — at 100 TB the payload bytes
    never leave the executor that scanned them).

    Target geometry (pure arithmetic, exercised for real): scale the
    longer side down to ``max_side`` (never upscale), floor the short
    side, clamp at 1 px. The pixel resample itself needs an imaging
    library absent from this runtime: ``fake=True`` passes the payload
    through unchanged; ``fake=False`` raises (same contract as
    :func:`decode_image_batch`).
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "pixel resampling requires an imaging library (e.g. "
                    "Pillow) not present in this runtime; pass fake=True "
                    "for the pass-through plumbing-test resizer"
                )
            w = pdf["width"].astype("int64")
            h = pdf["height"].astype("int64")
            long_side = pd.concat([w, h], axis=1).max(axis=1)
            needs = long_side > max_side
            ow = w.where(~needs, (w * max_side // long_side).clip(lower=1))
            oh = h.where(~needs, (h * max_side // long_side).clip(lower=1))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "width": w.astype("int32"),
                    "height": h.astype("int32"),
                    "out_width": ow.astype("int32"),
                    "out_height": oh.astype("int32"),
                    "media": pdf["media"],
                }
            )

    narrowed = df.select(
        "doc_id",
        F.col("media_meta.width").alias("width"),
        F.col("media_meta.height").alias("height"),
        "media",
    )
    return fan_out(narrowed).mapInPandas(gen, RESIZE_SCHEMA)


def sample_frames(
    df: DataFrame, step_ms: int = 1000, fake: bool = False
) -> DataFrame:
    """Video frame-sampling plumbing via ``mapInPandas``: one input
    row fans out to one output row per sampled timestamp (0, step_ms,
    2·step_ms, … < duration_ms) — the Arrow-batch row-expansion shape
    a real ffmpeg/pyav sampler needs. Frame decode is STUBBED
    (``fake=True`` emits a deterministic md5 frame tag and an empty
    payload; ``fake=False`` raises). Partition-local: no shuffle, the
    natural layout for payload-heavy fan-out at scale.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "frame extraction requires a video library (e.g. PyAV) "
                    "not present in this runtime; pass fake=True for the "
                    "deterministic plumbing-test sampler"
                )
            rows = {
                "doc_id": [],
                "frame_idx": [],
                "ts_ms": [],
                "frame_md5": [],
                "frame": [],
            }
            for doc_id, dur in zip(pdf["doc_id"], pdf["duration_ms"]):
                n = max(0, -(-int(dur) // step_ms)) if pd.notna(dur) else 0
                for i in range(n):
                    rows["doc_id"].append(int(doc_id))
                    rows["frame_idx"].append(i)
                    rows["ts_ms"].append(i * step_ms)
                    rows["frame_md5"].append(
                        hashlib.md5(f"{int(doc_id)}:{i}".encode()).hexdigest()
                    )
                    rows["frame"].append(b"")
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
                    "frame_idx": pd.Series(rows["frame_idx"], dtype="int32"),
                    "ts_ms": pd.Series(rows["ts_ms"], dtype="int64"),
                    "frame_md5": pd.Series(rows["frame_md5"], dtype="object"),
                    "frame": pd.Series(rows["frame"], dtype="object"),
                }
            )

    narrowed = df.select("doc_id", F.col("media_meta.duration_ms").alias("duration_ms"))
    return fan_out(narrowed).mapInPandas(gen, FRAME_SCHEMA)


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
