"""Multimodal column plumbing (LLM-data-pipeline surface).

Treats image/audio/video payloads as opaque ``binary`` columns with a
typed metadata struct, per the standard lakehouse pattern. The Spark
side — schema, partition-preserving ``mapInPandas`` feature
extraction, Arrow batch shapes — is real and tested. Decode status:

- **PNG decodes and resamples FOR REAL** via the pure-stdlib codec in
  :mod:`.codecs` (zlib inflate + PNG spec filter reconstruction +
  numpy nearest-neighbor resample) — no imaging library needed; the
  ``multimodal_png_decode`` registry query hash-matches the DuckDB
  oracle end-to-end. WAV PCM decodes via stdlib ``wave``. Baseline
  JPEG decodes FOR REAL (canonical Huffman entropy decode + IDCT).
- **Video decodes FOR REAL for MJPEG-in-AVI**: the RIFF container is
  chunk-walked (:func:`codecs.avi_parse`) and each sampled frame is a
  baseline JPEG the real decoder handles —
  ``sample_frames(fake=False)`` + :func:`decode_frame_stats` is an
  end-to-end container-parse → entropy-decode path. Other containers
  (MP4/H.264…) remain honestly stubbed behind ``NotImplementedError``:
  Pillow/libav are absent from this runtime and cannot be installed,
  so that constraint is final.

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


def attach_png_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL media column: a valid PNG per row, generated executor-side.

    Deterministic grayscale constant-fill images (value = id % 256,
    width = 4 + id % 13, height = 4 + id % 11) so a downstream REAL
    decode is exactly predictable — the decode round trip is therefore
    DuckDB-oracle-checkable: mean luma of a constant grayscale image
    is (id % 256) / 255.0 with no float-summation ambiguity (integer
    sums are exact in both engines). Payload generation happens inside
    ``mapInPandas`` (partition-local; the driver never sees a byte of
    media), which is exactly how a real binary-column ingest behaves.
    """
    import numpy as np

    from trendengine_spark.operators.codecs import png_encode

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("media", T.BinaryType(), True),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = [
                png_encode(
                    np.full(
                        (4 + int(i) % 11, 4 + int(i) % 13),
                        int(i) % 256,
                        dtype=np.uint8,
                    )
                )
                for i in ids
            ]
            yield pd.DataFrame({id_col: ids, "media": payloads})

    return fan_out(df.select(id_col), cpu_dense=True).mapInPandas(gen, out_schema)


def attach_jpeg_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL media column: a valid baseline JPEG per row, generated
    executor-side. Deterministic grayscale constant-fill images
    (value = id % 256, width = 8 + id % 13, height = 8 + id % 11) with
    DC quantization step 8, so the sequential-DCT decode is EXACT: a
    constant block's level-shifted DC is 8·(g−128) (a multiple of 8,
    so quantize→dequantize round-trips) and every AC coefficient is
    zero — decoded mean luma is exactly (id % 256) / 255.0, which the
    DuckDB oracle expresses in integer arithmetic."""
    import numpy as np

    from trendengine_spark.operators.codecs import jpeg_encode

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("media", T.BinaryType(), True),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = [
                jpeg_encode(
                    np.full(
                        (8 + int(i) % 11, 8 + int(i) % 13),
                        int(i) % 256,
                        dtype=np.uint8,
                    )
                )
                for i in ids
            ]
            yield pd.DataFrame({id_col: ids, "media": payloads})

    return fan_out(df.select(id_col), cpu_dense=True).mapInPandas(gen, out_schema)


def attach_wav_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL audio column: a valid PCM WAV per row, generated
    executor-side. Deterministic square wave (amplitude = 100 +
    id % 900, n = 160 + id % 80 samples at 8 kHz) so real decode
    features are exactly predictable: peak = amplitude, RMS =
    amplitude (square wave), duration_ms = n * 1000 / 8000 — all
    DuckDB-oracle-expressible integer arithmetic."""
    import numpy as np

    from trendengine_spark.operators.codecs import wav_encode

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("media", T.BinaryType(), True),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = []
            for i in ids:
                amp = 100 + int(i) % 900
                n = 160 + int(i) % 80
                wavef = np.where(np.arange(n) % 2 == 0, amp, -amp).astype(np.int16)
                payloads.append(wav_encode(8000, wavef))
            yield pd.DataFrame({id_col: ids, "media": payloads})

    return fan_out(df.select(id_col), cpu_dense=True).mapInPandas(gen, out_schema)


def extract_audio_features(df: DataFrame) -> DataFrame:
    """REAL WAV decode inside ``mapInPandas``: sample rate, sample
    count, duration, peak and RMS from the decoded PCM frames (stdlib
    ``wave`` + numpy — no audio library). Partition-local, payload
    bytes never shuffle."""
    import numpy as np

    from trendengine_spark.operators.codecs import wav_decode

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("sample_rate", T.IntegerType(), True),
            T.StructField("n_samples", T.LongType(), True),
            T.StructField("duration_ms", T.LongType(), True),
            T.StructField("peak", T.IntegerType(), True),
            T.StructField("rms", T.DoubleType(), True),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, b in zip(pdf["doc_id"].astype("int64"), pdf["media"]):
                rate, samples = wav_decode(bytes(b))
                mono = samples[:, 0].astype(np.float64)
                rows.append(
                    (
                        int(i),
                        rate,
                        len(mono),
                        len(mono) * 1000 // rate,
                        int(np.abs(samples[:, 0].astype(np.int64)).max()),
                        float(np.sqrt(np.mean(mono * mono))),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "sample_rate", "n_samples",
                    "duration_ms", "peak", "rms",
                ],
            ).astype(
                {
                    "doc_id": "int64",
                    "sample_rate": "int32",
                    "n_samples": "int64",
                    "duration_ms": "int64",
                    "peak": "int32",
                    "rms": "float64",
                }
            )

    return fan_out(df.select("doc_id", "media"), cpu_dense=True).mapInPandas(gen, out_schema)


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

    PNG and baseline-JPEG payloads decode FOR REAL via the
    pure-stdlib/numpy codecs in
    :mod:`trendengine_spark.operators.codecs` (PNG: zlib inflate +
    spec filter reconstruction; JPEG: canonical Huffman entropy decode
    + dequantize + IDCT + YCbCr→RGB). ``fake=True`` keeps the
    deterministic plumbing-test decoder (stable values from payload
    bytes) for other formats; an unrecognized payload with
    ``fake=False`` raises — video entropy decode would need a codec
    library this runtime doesn't have.
    """
    import numpy as np

    from trendengine_spark.operators.codecs import (
        is_jpeg,
        is_png,
        jpeg_decode,
        png_decode,
    )

    widths, heights, lumas = [], [], []
    for b in payloads:
        if b and (is_png(bytes(b)) or is_jpeg(bytes(b))):
            raw = bytes(b)
            a = png_decode(raw) if is_png(raw) else jpeg_decode(raw)
            h, w, c = a.shape
            rgb = a[:, :, :3] if c >= 3 else a[:, :, :1]
            weights = (
                np.array([0.299, 0.587, 0.114]) if rgb.shape[2] == 3 else np.array([1.0])
            )
            luma = float((rgb.astype(np.float64) @ weights).mean() / 255.0)
            widths.append(w)
            heights.append(h)
            lumas.append(luma)
        elif fake:
            n = len(b) if b else 0
            first = b[0] if b else 0
            last = b[-1] if b else 0
            widths.append(64 + (n % 512))
            heights.append(64 + ((n * 7 + first) % 512))
            lumas.append(((first + last) % 256) / 255.0)
        else:
            raise NotImplementedError(
                "unrecognized image format: only PNG and baseline JPEG "
                "decode for real in this runtime (pass fake=True for the "
                "deterministic plumbing-test decoder on other formats)"
            )
    return pd.DataFrame(
        {
            "width": pd.Series(widths, dtype="int32"),
            "height": pd.Series(heights, dtype="int32"),
            "mean_luma": pd.Series(lumas, dtype="float64"),
        }
    )


def extract_media_features(
    df: DataFrame, fake: bool = True, keep_cols: list[str] | None = None
) -> DataFrame:
    """Partition-local feature extraction over the media column via
    ``mapInPandas`` (Arrow-batched, no shuffle). Output schema is
    :data:`FEATURE_SCHEMA` plus any ``keep_cols`` passed through
    unchanged — pass-through beats re-joining the producer subtree,
    which would execute the upstream decode pipeline TWICE."""
    keep = keep_cols or []

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
            for c in keep:
                out[c] = pdf[c].to_numpy()
            yield out

    schema = T.StructType(
        FEATURE_SCHEMA.fields
        + [df.schema[c] for c in keep]
    )
    return fan_out(df.select("doc_id", "media", *keep), cpu_dense=True).mapInPandas(gen, schema)


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
    side, clamp at 1 px. PNG payloads resample FOR REAL (pure-numpy
    nearest-neighbor over the stdlib-decoded pixels, re-encoded as
    PNG via :mod:`.codecs`); ``fake=True`` passes non-PNG payloads
    through unchanged; a non-PNG payload with ``fake=False`` raises
    (same contract as :func:`decode_image_batch`).
    """

    def _resample_png(b: bytes) -> tuple[bytes, int, int, int, int]:
        import numpy as np

        from trendengine_spark.operators.codecs import png_decode, png_encode

        a = png_decode(b)
        h, w = a.shape[:2]
        long_side = max(h, w)
        if long_side <= max_side:
            return b, w, h, w, h
        ow = max(1, w * max_side // long_side)
        oh = max(1, h * max_side // long_side)
        ys = (np.arange(oh) * h // oh).astype(np.int64)
        xs = (np.arange(ow) * w // ow).astype(np.int64)
        return png_encode(a[ys][:, xs]), w, h, ow, oh

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from trendengine_spark.operators.codecs import is_png

        for pdf in batches:
            png_mask = pdf["media"].map(
                lambda b: bool(b) and is_png(bytes(b))
            )
            if png_mask.any():
                real = pdf[png_mask].copy()
                resampled = [_resample_png(bytes(b)) for b in real["media"]]
                yield pd.DataFrame(
                    {
                        "doc_id": real["doc_id"].astype("int64").to_numpy(),
                        "width": pd.Series([r[1] for r in resampled], dtype="int32"),
                        "height": pd.Series([r[2] for r in resampled], dtype="int32"),
                        "out_width": pd.Series([r[3] for r in resampled], dtype="int32"),
                        "out_height": pd.Series([r[4] for r in resampled], dtype="int32"),
                        "media": [r[0] for r in resampled],
                    }
                )
            pdf = pdf[~png_mask]
            if pdf.empty:
                continue
            if not fake:
                raise NotImplementedError(
                    "non-PNG pixel resampling requires a codec library not "
                    "present in this runtime (PNG resamples for real; pass "
                    "fake=True for the pass-through plumbing-test resizer)"
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
    return fan_out(narrowed, cpu_dense=True).mapInPandas(gen, RESIZE_SCHEMA)


def attach_mjpeg_video(
    df: DataFrame, id_col: str = "doc_id", frame_size: int = 16
) -> DataFrame:
    """Deterministic REAL video column: per row, a valid MJPEG-in-AVI
    container (RIFF hdrl/movi/idx1) holding 2-5 constant-fill baseline
    JPEG frames at 1 fps — frame count ``(id % 4) + 2``, frame *i*'s
    gray level ``(id·31 + i·17) % 256``. Every byte is produced by the
    pure-stdlib codecs (:func:`codecs.jpeg_encode` →
    :func:`codecs.avi_mjpeg_encode`), so downstream container parsing
    and frame decode exercise the real path, not a stub. Construction
    runs inside ``mapInPandas`` (partition-local, payload never
    shuffled)."""
    from trendengine_spark.operators.codecs import avi_mjpeg_encode, jpeg_encode

    id_type = df.schema[id_col].dataType
    out_schema = T.StructType(
        [
            T.StructField(id_col, id_type),
            T.StructField("media", T.BinaryType()),
            T.StructField(
                "media_meta",
                T.StructType(
                    [
                        T.StructField("media_type", T.StringType()),
                        T.StructField("format", T.StringType()),
                        T.StructField("width", T.IntegerType()),
                        T.StructField("height", T.IntegerType()),
                        T.StructField("duration_ms", T.LongType()),
                    ]
                ),
            ),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            medias, metas = [], []
            for did in pdf[id_col]:
                did = int(did)
                n = (did % 4) + 2
                frames = [
                    jpeg_encode(
                        np.full(
                            (frame_size, frame_size),
                            (did * 31 + i * 17) % 256,
                            dtype=np.uint8,
                        )
                    )
                    for i in range(n)
                ]
                medias.append(avi_mjpeg_encode(frames, fps=1))
                metas.append(
                    {
                        "media_type": "video",
                        "format": "avi-mjpeg",
                        "width": frame_size,
                        "height": frame_size,
                        "duration_ms": n * 1000,
                    }
                )
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "media": pd.Series(medias, dtype="object"),
                    "media_meta": pd.Series(metas, dtype="object"),
                }
            )

    return df.select(id_col).mapInPandas(gen, out_schema)


def sample_frames(
    df: DataFrame, step_ms: int = 1000, fake: bool = False
) -> DataFrame:
    """Video frame sampling via ``mapInPandas``: one input row fans out
    to one output row per sampled timestamp (0, step_ms, 2·step_ms, …
    < duration) — the Arrow-batch row-expansion shape any frame
    sampler needs. Partition-local: no shuffle, the natural layout for
    payload-heavy fan-out at scale.

    ``fake=False`` (default) is a REAL decode path for MJPEG-in-AVI
    payloads: the RIFF container is chunk-walked
    (:func:`codecs.avi_parse`), each sampled timestamp maps to the
    frame covering it (``ts // frame_period``), and the emitted
    ``frame`` is the actual JPEG payload with its md5 — decodable by
    :func:`codecs.jpeg_decode`. Non-AVI payloads raise
    ``NotImplementedError`` (other containers need codec libraries
    this runtime doesn't have). ``fake=True`` keeps the payload-free
    plumbing sampler driven by ``media_meta.duration_ms`` (deterministic
    md5 tag, empty frame) for containers we can't parse.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        from trendengine_spark.operators.codecs import avi_parse, is_avi

        for pdf in batches:
            rows = {
                "doc_id": [],
                "frame_idx": [],
                "ts_ms": [],
                "frame_md5": [],
                "frame": [],
            }
            if fake:
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
            else:
                for doc_id, payload in zip(pdf["doc_id"], pdf["media"]):
                    raw = bytes(payload) if payload is not None else b""
                    if not is_avi(raw):
                        raise NotImplementedError(
                            "real frame extraction handles MJPEG-in-AVI only; "
                            "other containers need codec libraries not present "
                            "in this runtime (pass fake=True for the "
                            "metadata-driven plumbing sampler)"
                        )
                    p = avi_parse(raw)
                    n_frames = len(p["frames"])
                    if not n_frames:
                        continue
                    period_ms = max(1, p["us_per_frame"] // 1000)
                    duration_ms = n_frames * period_ms
                    for ts in range(0, duration_ms, step_ms):
                        fi = min(ts // period_ms, n_frames - 1)
                        fb = p["frames"][fi]
                        rows["doc_id"].append(int(doc_id))
                        rows["frame_idx"].append(int(fi))
                        rows["ts_ms"].append(ts)
                        rows["frame_md5"].append(hashlib.md5(fb).hexdigest())
                        rows["frame"].append(fb)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
                    "frame_idx": pd.Series(rows["frame_idx"], dtype="int32"),
                    "ts_ms": pd.Series(rows["ts_ms"], dtype="int64"),
                    "frame_md5": pd.Series(rows["frame_md5"], dtype="object"),
                    "frame": pd.Series(rows["frame"], dtype="object"),
                }
            )

    if fake:
        narrowed = df.select(
            "doc_id", F.col("media_meta.duration_ms").alias("duration_ms")
        )
    else:
        narrowed = df.select("doc_id", "media")
    return fan_out(narrowed, cpu_dense=True).mapInPandas(gen, FRAME_SCHEMA)


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


FRAME_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("frame_idx", T.IntegerType(), True),
        T.StructField("ts_ms", T.LongType(), True),
        T.StructField("gray", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), True),
    ]
)


def decode_frame_stats(frames: DataFrame) -> DataFrame:
    """Decode sampled JPEG frames (``sample_frames(fake=False)``
    output) to per-frame stats: integer mean gray level + payload
    size. Constant-fill frames from :func:`attach_mjpeg_video` decode
    EXACTLY (DC-only blocks, dc_quant=8), so ``gray`` is
    oracle-checkable as pure arithmetic — the strongest end-to-end
    evidence the container walk + entropy decode are right. Decode is
    partition-local ``mapInPandas``; the frame payload never
    shuffles."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from trendengine_spark.operators.codecs import jpeg_decode

        for pdf in batches:
            grays = [
                int(round(float(jpeg_decode(bytes(b)).mean())))
                for b in pdf["frame"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "frame_idx": pdf["frame_idx"].astype("int32"),
                    "ts_ms": pdf["ts_ms"].astype("int64"),
                    "gray": pd.Series(grays, dtype="int32"),
                    "n_bytes": pdf["frame"].map(len).astype("int64"),
                }
            )

    return frames.select("doc_id", "frame_idx", "ts_ms", "frame").mapInPandas(
        gen, FRAME_STATS_SCHEMA
    )


def attach_tone_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL audio column for spectral analysis: a pure sine tone per
    row at f = 200 + (id % 20)·150 Hz (8 kHz PCM, 1024 + (id % 4)·256
    samples, amplitude 8000) — a known ground-truth frequency, so the
    spectrogram's dominant bin is exactly predictable per document."""
    import numpy as np

    from trendengine_spark.operators.codecs import wav_encode

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("media", T.BinaryType(), True),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = []
            for i in ids:
                freq = 200.0 + (int(i) % 20) * 150.0
                n = 1024 + (int(i) % 4) * 256
                t = np.arange(n, dtype=np.float64) / 8000.0
                wavef = (8000.0 * np.sin(2 * np.pi * freq * t)).astype(np.int16)
                payloads.append(wav_encode(8000, wavef))
            yield pd.DataFrame({id_col: ids, "media": payloads})

    return fan_out(df.select(id_col), cpu_dense=True).mapInPandas(gen, out_schema)


def audio_spectrogram(
    df: DataFrame,
    n_fft: int = 256,
    hop: int = 128,
    id_col: str = "doc_id",
) -> DataFrame:
    """REAL short-time spectral analysis inside ``mapInPandas``:
    Hann-windowed rfft frames over the decoded PCM stream (stdlib
    ``wave`` + numpy — no audio library), emitting per frame the
    dominant frequency bin (DC excluded), its frequency in Hz, and
    the frame's total spectral energy. The DSP every audio-feature
    pipeline starts from (mel/MFCC stack on top of exactly this).
    Partition-local — payload bytes and sample streams never shuffle;
    output is #frames small metadata rows per document. Rows-only
    (no FFT in the DuckDB oracle); the math is pinned by a golden
    known-tone test."""
    import numpy as np

    from trendengine_spark.operators.codecs import wav_decode

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), True),
            T.StructField("dominant_bin", T.IntegerType(), True),
            T.StructField("dominant_hz", T.DoubleType(), True),
            T.StructField("energy", T.DoubleType(), True),
        ]
    )
    window = None  # built lazily so the closure ships cheaply

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        nonlocal window
        if window is None:
            window = np.hanning(n_fft)
        for pdf in batches:
            ids, frames, bins, hzs, energies = [], [], [], [], []
            for i, b in zip(pdf[id_col].astype("int64"), pdf["media"]):
                rate, samples = wav_decode(bytes(b))
                mono = samples[:, 0].astype(np.float64)
                n_frames = max(0, (len(mono) - n_fft) // hop + 1)
                for f in range(n_frames):
                    seg = mono[f * hop : f * hop + n_fft] * window
                    spec = np.abs(np.fft.rfft(seg)) ** 2
                    dom = int(np.argmax(spec[1:]) + 1)  # skip DC
                    ids.append(int(i))
                    frames.append(f)
                    bins.append(dom)
                    hzs.append(round(dom * rate / n_fft, 3))
                    energies.append(round(float(spec.sum()), 3))
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(frames, dtype="int32"),
                    "dominant_bin": pd.Series(bins, dtype="int32"),
                    "dominant_hz": pd.Series(hzs, dtype="float64"),
                    "energy": pd.Series(energies, dtype="float64"),
                }
            )

    return fan_out(df, cpu_dense=True).mapInPandas(gen, out_schema)


def attach_gradient_png(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL media column for resampling tests: a grayscale gradient
    PNG per row, pixel(y, x) = (3x + 5y + id) % 256 at
    w = 20 + id % 13, h = 20 + id % 11 — spatial structure (unlike
    the constant-fill of :func:`attach_png_media`) whose
    nearest-neighbor downsample is closed-form integer arithmetic,
    so a real decode→resample→re-encode→decode round trip is
    DuckDB-oracle-checkable pixel-exactly."""
    import numpy as np

    from trendengine_spark.operators.codecs import png_encode

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("media", T.BinaryType(), True),
            T.StructField(
                "media_meta",
                T.StructType(
                    [
                        T.StructField("media_type", T.StringType(), True),
                        T.StructField("format", T.StringType(), True),
                        T.StructField("width", T.IntegerType(), True),
                        T.StructField("height", T.IntegerType(), True),
                        T.StructField("duration_ms", T.LongType(), True),
                    ]
                ),
                True,
            ),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads, metas = [], []
            for i in ids:
                w = 20 + int(i) % 13
                h = 20 + int(i) % 11
                yy, xx = np.mgrid[0:h, 0:w]
                a = ((3 * xx + 5 * yy + int(i)) % 256).astype(np.uint8)
                payloads.append(png_encode(a[:, :, None]))
                metas.append(("image", "png", w, h, None))
            yield pd.DataFrame(
                {id_col: ids, "media": payloads, "media_meta": metas}
            )

    return fan_out(df.select(id_col), cpu_dense=True).mapInPandas(gen, out_schema)


def image_tile_means(
    df: DataFrame, grid: int = 2, id_col: str = "doc_id"
) -> DataFrame:
    """ViT-style patchify: split each decoded image into a
    ``grid``×``grid`` tile lattice and emit every tile's mean pixel —
    the patch-embedding prep of vision transformers reduced to its
    verifiable core (real decode → block reduction → per-patch
    scalar). Tile (ty, tx) covers rows [ty·h//g, (ty+1)·h//g) — the
    floor-split convention, so the math is pure integer arithmetic an
    oracle can reproduce. Partition-local ``mapInPandas``; payloads
    never shuffle; output is g² small rows per image."""
    import numpy as np

    from trendengine_spark.operators.codecs import png_decode

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("tile_y", T.IntegerType(), True),
            T.StructField("tile_x", T.IntegerType(), True),
            T.StructField("mean_pixel", T.DoubleType(), True),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, tys, txs, means = [], [], [], []
            for i, b in zip(pdf[id_col].astype("int64"), pdf["media"]):
                a = png_decode(bytes(b))[:, :, 0].astype(np.float64)
                h, w = a.shape
                for ty in range(grid):
                    y0, y1 = ty * h // grid, (ty + 1) * h // grid
                    for tx in range(grid):
                        x0, x1 = tx * w // grid, (tx + 1) * w // grid
                        ids.append(int(i))
                        tys.append(ty)
                        txs.append(tx)
                        means.append(float(a[y0:y1, x0:x1].mean()))
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "tile_y": pd.Series(tys, dtype="int32"),
                    "tile_x": pd.Series(txs, dtype="int32"),
                    "mean_pixel": pd.Series(means, dtype="float64"),
                }
            )

    return fan_out(df.select(id_col, "media"), cpu_dense=True).mapInPandas(gen, out_schema)


def attach_animated_gif(
    df: DataFrame, n_frames: int = 4, id_col: str = "doc_id"
) -> DataFrame:
    """REAL animated-GIF media column: ``n_frames`` grayscale gradient
    frames per row, pixel(f, y, x) = (3x + 5y + id + 7f) % 256 at
    w = 16 + id % 9, h = 16 + id % 7, encoded through the pure-python
    GIF89a/LZW codec (:mod:`.codecs`) with a real Graphic Control
    delay per frame — closed-form pixel math, so a full
    encode→decode round trip is DuckDB-oracle-checkable exactly."""
    import numpy as np

    from trendengine_spark.operators.codecs import gif_encode

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("media", T.BinaryType(), True),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = []
            for i in ids:
                w = 16 + int(i) % 9
                h = 16 + int(i) % 7
                yy, xx = np.mgrid[0:h, 0:w]
                frames = [
                    ((3 * xx + 5 * yy + int(i) + 7 * f) % 256).astype(
                        np.uint8
                    )
                    for f in range(n_frames)
                ]
                payloads.append(gif_encode(frames, delay_cs=4))
            yield pd.DataFrame({id_col: ids, "media": payloads})

    return fan_out(df.select(id_col), cpu_dense=True).mapInPandas(gen, out_schema)


def gif_frame_stats(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Decode an animated-GIF media column and emit one row per frame
    with its dimensions, delay and mean pixel — the video-lite twin
    of the MJPEG/AVI frame sampler, exercising a second real
    container+entropy-coding path (LZW vs Huffman/DCT). Decode is
    partition-local ``mapInPandas``; payloads never shuffle."""
    import numpy as np

    from trendengine_spark.operators.codecs import gif_decode

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), True),
            T.StructField("n_frames", T.IntegerType(), True),
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
            T.StructField("delay_cs", T.IntegerType(), True),
            T.StructField("mean_pixel", T.DoubleType(), True),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (
                id_col, "frame_idx", "n_frames", "width", "height",
                "delay_cs", "mean_pixel",
            )}
            for i, b in zip(pdf[id_col].astype("int64"), pdf["media"]):
                g = gif_decode(bytes(b))
                n = len(g["frames"])
                for fi, (fr, dl) in enumerate(
                    zip(g["frames"], g["delays_cs"])
                ):
                    rows[id_col].append(int(i))
                    rows["frame_idx"].append(fi)
                    rows["n_frames"].append(n)
                    rows["width"].append(g["width"])
                    rows["height"].append(g["height"])
                    rows["delay_cs"].append(dl)
                    rows["mean_pixel"].append(
                        float(np.asarray(fr, dtype=np.float64).mean())
                    )
            yield pd.DataFrame(
                {
                    id_col: pd.Series(rows[id_col], dtype="int64"),
                    "frame_idx": pd.Series(rows["frame_idx"], dtype="int32"),
                    "n_frames": pd.Series(rows["n_frames"], dtype="int32"),
                    "width": pd.Series(rows["width"], dtype="int32"),
                    "height": pd.Series(rows["height"], dtype="int32"),
                    "delay_cs": pd.Series(rows["delay_cs"], dtype="int32"),
                    "mean_pixel": pd.Series(
                        rows["mean_pixel"], dtype="float64"
                    ),
                }
            )

    return fan_out(df.select(id_col, "media"), cpu_dense=True).mapInPandas(gen, out_schema)


def attach_textured_png(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL media column with PLANTED near-duplicates for perceptual-
    hash dedup (r9): even ids get a 36×32 multiplicative texture
    ``p(x, y) = ((x+1)(y+2)k + 31x + 57y + id) % 256`` with
    ``k = id % 97 + 3`` (the x·y cross term decorrelates documents —
    a pure linear gradient would make dHash collapse across the
    corpus since dHash is brightness-invariant); each odd id is the
    REALISTIC near-duplicate of ``id − 1``: the same texture
    nearest-neighbor UPSCALED 2× (72×64) and re-encoded at +1
    brightness (mod 256). Upscaling preserves every dHash cell
    comparison exactly; the +1 wrap (255→0 pixels only) flips a few
    — measured planted Hamming ≤ 6 of 64 at 500 docs, unrelated
    cross-parity mean 32. All pixel math is integer, so a DuckDB
    oracle reproduces the decoded images exactly."""
    import numpy as np

    from trendengine_spark.operators.codecs import png_encode

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("media", T.BinaryType(), True),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = []
            for i in ids:
                i = int(i)
                if i % 2 == 0:
                    w, h, base, bright, s = 36, 32, i, 0, 1
                else:
                    w, h, base, bright, s = 72, 64, i - 1, 1, 2
                k = base % 97 + 3
                yy, xx = np.mgrid[0:h, 0:w]
                bx, by = xx // s, yy // s
                a = (
                    ((bx + 1) * (by + 2) * k + 31 * bx + 57 * by + base + bright)
                    % 256
                ).astype(np.uint8)
                payloads.append(png_encode(a[:, :, None]))
            yield pd.DataFrame({id_col: ids, "media": payloads})

    return fan_out(df.select(id_col), cpu_dense=True).mapInPandas(gen, out_schema)


def image_dhash(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """64-bit difference hash (dHash) over REAL decoded pixels — the
    standard perceptual fingerprint for image near-dup detection:
    reduce the image to a 9×8 grid of mean intensities (floor-split
    boundaries ``x·9//w`` / ``y·8//h``, the convention every
    multimodal operator here uses) and set bit ``j = cy·8 + cx`` iff
    the right cell's mean exceeds the left's. Means are compared by
    CROSS-MULTIPLIED integer sums (``S_b·N_a > S_a·N_b``) so the
    hash is bit-exact for ANY image size — no float resize, which is
    what makes a DuckDB oracle possible. Cell sums come from an
    int64 integral image (exact). Bit 63 packs as the sign bit (the
    same convention as the Hamming ANN codes in
    operators/similarity.py). Resize- and brightness-invariant by
    construction: only the ORDER of neighboring cell means matters.
    Partition-local mapInPandas; one int64 out per image."""
    import numpy as np

    from trendengine_spark.operators.codecs import png_decode

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("dhash", T.LongType(), True),
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes, ws, hs = [], [], [], []
            for i, b in zip(pdf[id_col].astype("int64"), pdf["media"]):
                a = png_decode(bytes(b))[:, :, 0]
                h, w = a.shape
                c = np.zeros((h + 1, w + 1), dtype=np.int64)
                c[1:, 1:] = a.astype(np.int64).cumsum(0).cumsum(1)
                ys = [y * h // 8 for y in range(9)]
                xs = [x * w // 9 for x in range(10)]
                v = 0
                for cy in range(8):
                    y0, y1 = ys[cy], ys[cy + 1]
                    for cx in range(8):
                        x0a, x1a = xs[cx], xs[cx + 1]
                        x0b, x1b = xs[cx + 1], xs[cx + 2]
                        sa = c[y1, x1a] - c[y0, x1a] - c[y1, x0a] + c[y0, x0a]
                        sb = c[y1, x1b] - c[y0, x1b] - c[y1, x0b] + c[y0, x0b]
                        na = (y1 - y0) * (x1a - x0a)
                        nb = (y1 - y0) * (x1b - x0b)
                        if int(sb) * na > int(sa) * nb:
                            j = cy * 8 + cx
                            v += (1 << j) if j < 63 else -(1 << 63)
                ids.append(int(i))
                hashes.append(v)
                ws.append(w)
                hs.append(h)
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "dhash": pd.Series(hashes, dtype="int64"),
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                }
            )

    return fan_out(df.select(id_col, "media"), cpu_dense=True).mapInPandas(gen, out_schema)


def attach_textured_wav(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL audio column with PLANTED near-duplicates for acoustic-
    fingerprint dedup (r9 — the audio twin of
    :func:`attach_textured_png`): even ids get a 2,080-sample int16
    PCM waveform ``s(t) = ((t+1)·k + t² mod 509 + id) mod 401 − 200``
    with ``k = id % 89 + 2`` (the quadratic term decorrelates frame
    energies across documents); each odd id is the REALISTIC
    near-duplicate of ``id − 1``: the same waveform 2× UPSAMPLED
    (sample-and-hold), amplitude-DOUBLED and +1 DC-shifted — a
    re-encoded / resampled / re-mastered copy. Upsampling and pure
    gain preserve every frame-energy comparison exactly; the DC
    shift flips a few (measured planted Hamming ≤ 2 at 500 docs,
    unrelated minimum 10). All sample math is integer, so a DuckDB
    oracle reproduces the decoded PCM exactly."""
    import numpy as np

    from trendengine_spark.operators.codecs import wav_encode

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("media", T.BinaryType(), True),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = []
            for i in ids:
                i = int(i)
                if i % 2 == 0:
                    n, base, scale, off = 2080, i, 1, 0
                else:
                    n, base, scale, off = 4160, i - 1, 2, 1
                t = np.arange(n, dtype=np.int64)
                bt = t if i % 2 == 0 else t // 2
                s = ((bt + 1) * (base % 89 + 2) + (bt * bt) % 509 + base) % 401 - 200
                payloads.append(
                    wav_encode(8000, (scale * s + off).astype(np.int16))
                )
            yield pd.DataFrame({id_col: ids, "media": payloads})

    return fan_out(df.select(id_col), cpu_dense=True).mapInPandas(gen, out_schema)


def audio_fingerprint(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """64-bit energy-contour acoustic fingerprint over REAL decoded
    PCM — the audio analog of :func:`image_dhash` (same family as
    the spectral-peak hashing of production audio fingerprinting,
    reduced to its integer-verifiable core): split the signal into
    65 equal frames, compute each frame's int64 energy Σs², and set
    bit f iff frame f+1 is louder than frame f. Gain- and
    upsample-invariant by construction (only the ORDER of frame
    energies matters — pure amplification scales every energy by the
    same factor; sample-and-hold upsampling scales by the repeat
    count). Bit 63 packs as the sign bit. Frames are ``n // 65``
    samples (tail truncated), energies exact int64, so the hash is
    engine-reproducible. Partition-local mapInPandas; one int64 per
    clip."""
    import numpy as np

    from trendengine_spark.operators.codecs import wav_decode

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("afp", T.LongType(), True),
            T.StructField("n_samples", T.LongType(), True),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fps, ns = [], [], []
            for i, b in zip(pdf[id_col].astype("int64"), pdf["media"]):
                _, samples = wav_decode(bytes(b))
                s = samples[:, 0].astype(np.int64)
                n = len(s)
                frame = n // 65
                e = (s[: frame * 65] ** 2).reshape(65, frame).sum(axis=1)
                v = 0
                for f in range(64):
                    if int(e[f + 1]) > int(e[f]):
                        v += (1 << f) if f < 63 else -(1 << 63)
                ids.append(int(i))
                fps.append(v)
                ns.append(n)
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "afp": pd.Series(fps, dtype="int64"),
                    "n_samples": pd.Series(ns, dtype="int64"),
                }
            )

    return fan_out(df.select(id_col, "media"), cpu_dense=True).mapInPandas(gen, out_schema)
