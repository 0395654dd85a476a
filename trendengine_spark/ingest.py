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
