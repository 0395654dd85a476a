"""Ingest normalization (reference F6/F7 + §1.4 canonical schema).

The reference's materialization step turns the ``getRegion`` payload
into a pandas frame and normalizes two things the engine also
normalizes at ingest:

- epoch-millisecond timestamps, in two wire shapes: a scalar ms
  (``TrendEngine/calculations/utils.py:16``) and a ``{'value': ms}``
  dict (``utils.py:19`` — the DBEST path) → :func:`decode_epoch_ms`
  / :func:`decode_epoch_ms_json`;
- ``"[lon, lat]"`` coordinate strings (``polytrend.py:435-448``) →
  :func:`parse_coordinates`.

All are single-pass column expressions (codegen, no UDF, no shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: canonical observations schema (SURVEY §1.4)
OBS_COLUMNS = ("series_id", "image_id", "longitude", "latitude", "time", "value")


def decode_epoch_ms(col: Column) -> Column:
    """Epoch-ms long → TimestampType (reference
    ``pd.to_datetime(unit='ms')``, ``utils.py:16``)."""
    return F.timestamp_millis(col.cast("long"))


def decode_epoch_ms_json(col: Column, key: str = "value") -> Column:
    """The DBEST wire shape: ``{'value': ms}`` JSON → TimestampType
    (reference ``utils.py:19``)."""
    return decode_epoch_ms(F.get_json_object(col, f"$.{key}").cast("long"))


def parse_coordinates(col: Column) -> Column:
    """``"[lon, lat]"`` string → struct(lon double, lat double)
    (reference regex strip + split + cast, ``polytrend.py:435-448``).
    More than two elements means a polygon ring in the reference; the
    engine's AOI surface is point/bbox only (SURVEY §1.1), so the
    caller decides by ``size``."""
    parts = F.split(F.regexp_replace(F.trim(col), r"[\[\]\s]", ""), ",")
    return F.struct(
        parts.getItem(0).cast("double").alias("lon"),
        parts.getItem(1).cast("double").alias("lat"),
    )


def normalize_observations(
    df: DataFrame,
    series_id: str | Column = "series_id",
    image_id: str = "image_id",
    longitude: str = "longitude",
    latitude: str = "latitude",
    time_col: str = "time",
    value_col: str = "value",
    time_unit: str = "timestamp",
    round_coords: int | None = None,
) -> DataFrame:
    """Project any long-format source onto the canonical observations
    schema. ``time_unit``: 'timestamp' (as-is), 'epoch_ms', or
    'epoch_ms_json' (the two reference wire shapes). ``round_coords``
    applies the reference's coordinate rounding (``dbest.py:127-129``).
    """
    time_expr = F.col(time_col)
    if time_unit == "epoch_ms":
        time_expr = decode_epoch_ms(time_expr)
    elif time_unit == "epoch_ms_json":
        time_expr = decode_epoch_ms_json(time_expr)
    elif time_unit != "timestamp":
        raise ValueError(f"unknown time_unit {time_unit!r}")

    lon = F.col(longitude).cast("double")
    lat = F.col(latitude).cast("double")
    if round_coords is not None:
        lon, lat = F.round(lon, round_coords), F.round(lat, round_coords)

    sid = F.lit(series_id) if isinstance(series_id, str) and series_id not in df.columns else F.col(series_id)  # type: ignore[arg-type]
    return df.select(
        sid.cast("string").alias("series_id"),
        F.col(image_id).cast("string").alias("image_id"),
        lon.alias("longitude"),
        lat.alias("latitude"),
        time_expr.cast("timestamp").alias("time"),
        F.col(value_col).cast("double").alias("value"),
    )


def read_jsonl_corpus(
    spark,
    path: str,
    schema: str = "doc_id long, text string, lang string, source string",
    quarantine: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """JSON-Lines corpus ingest with malformed-record quarantine —
    the front door for LLM training data (web corpora ship as
    ``.jsonl`` / ``.jsonl.gz``; Spark's text-based JSON source reads
    both and splits uncompressed files across executors).

    PERMISSIVE parsing with an explicit schema (schema inference
    would scan the corpus twice AND lock in whatever the first files
    happen to contain): rows that fail to parse land whole in
    ``_corrupt_record`` instead of killing the job — a 100 TB crawl
    ALWAYS contains broken lines, and dropping them silently is how
    corpora lose provenance. Returns ``(good, bad)``: ``good`` has
    exactly the schema's columns; ``bad`` carries the raw offending
    line for quarantine. ``quarantine`` optionally writes the bad
    rows to a parquet sink as a side effect so the caller's lineage
    keeps them.

    Spark caveat handled here: since 2.3, filtering on
    ``_corrupt_record`` alone from the same cached plan is disallowed
    (the parser elides other columns and the column is unpopulated);
    the documented workaround is applied — the corrupt column is
    materialized together with the data columns before the split.
    """
    full = f"{schema}, _corrupt_record string"
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    import hashlib

    from trendengine_spark.operators.util import owned_cache

    # materialize corrupt+data together (the Spark caveat above);
    # owned_cache, not bare cache() — pool-bounded across invocations
    # (the r3 unbounded-leak lesson); md5 key, not hash() (salted
    # per process — keys must be stable across sessions)
    key = hashlib.md5(str(path).encode()).hexdigest()[:10]
    df = owned_cache(df, f"ingest.jsonl.{key}")
    good = df.filter(F.col("_corrupt_record").isNull()).drop(
        "_corrupt_record"
    )
    bad = df.filter(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("raw_line")
    )
    if quarantine:
        bad.write.mode("overwrite").parquet(quarantine)
    return good, bad
