"""``te_region``: partitioned raster-region acquisition source.

The reference acquires data by materializing a whole region × period
into driver memory in ONE ``getRegion().getInfo()`` RPC
(`/root/reference/TrendEngine/calculations/utils.py:9-14`) and fails
outright on oversized requests ("dataset is too large … study period
too long", `polytrend.py:479-481`, `dbest.py:533-535`). This source
is the Spark-native answer to that capacity wall — the deferred
"GEE-style raster ingest" item from SURVEY §4.3, built on the
PySpark Python Data Source API:

- **Partitioned acquisition.** The (bbox × years) request splits
  into one :class:`~pyspark.sql.datasource.InputPartition` per
  (spatial tile, year): each executor task materializes only its
  tile-year slice, so request size scales with the cluster, not the
  driver heap.
- **Filter pushdown** (``pushFilters``): range predicates on
  ``time`` / ``longitude`` / ``latitude`` shrink the partition grid
  BEFORE generation — a date-range or bbox query plans only the
  matching tile-years (asserted in tests). Non-range filters are
  returned unsupported and Spark re-applies them post-scan.
- **Arrow batches.** Each partition yields one pyarrow RecordBatch
  built with numpy — no per-row Python objects on the read path.
- **Output** is the engine's canonical observations schema
  (SURVEY §1.4): ``series_id, image_id, longitude, latitude, time,
  value`` — the same long format ``getRegion`` returns, ready for
  ``normalize_observations`` / composites / PolyTrend-DBEST.

Backend honesty: the container has no raster store or network, so
pixel values come from a deterministic synthetic NDVI field (a pure
function of dataset, lon, lat, date — documented below, pinned by
golden tests). The SOURCE mechanics — schema, tiling, pushdown,
cadence, Arrow batching — are the real deliverable, exactly like the
stub-then-real policy the multimodal codecs followed.

Datasets mirror the reference's two catalogues (cadence + value
range, `TrendEngine/templates/home.html:25-36`):

- ``gimms``: bimonthly (1st/15th), NDVI ∈ [-1, 1]
- ``modis``: 16-day from Jan 1, integer-scaled NDVI ∈ [-2000, 10000]
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from datetime import date, datetime, timedelta
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)

_SCHEMA = (
    "series_id string, image_id string, longitude double, latitude double,"
    " time timestamp, value double"
)

_DATASETS = {
    # cadence_days=None → bimonthly (1st + 15th of each month)
    "gimms": {"band": "ndvi", "cadence_days": None, "lo": -1.0, "hi": 1.0},
    "modis": {"band": "NDVI", "cadence_days": 16, "lo": -2000.0, "hi": 10000.0},
}


def _dates_for_year(year: int, cadence_days: int | None) -> list[date]:
    if cadence_days is None:  # bimonthly
        return [date(year, m, d) for m in range(1, 13) for d in (1, 15)]
    out, d = [], date(year, 1, 1)
    while d.year == year:
        out.append(d)
        d += timedelta(days=cadence_days)
    return out


def synthetic_ndvi(dataset: str, lon, lat, doy):
    """Deterministic synthetic NDVI field (vectorized over numpy
    inputs): a seasonal harmonic phase-shifted by longitude plus a
    smooth latitudinal gradient, rescaled to the dataset's value
    range. Pure function of its arguments — golden-pinned in tests."""
    import numpy as np

    spec = _DATASETS[dataset]
    raw = (
        0.25
        + 0.35 * np.sin(2 * math.pi * doy / 365.25 + 0.1 * lon)
        + 0.2 * np.cos(0.05 * lat)
    )  # ∈ [-0.3, 0.8]
    lo, hi = spec["lo"], spec["hi"]
    scaled = lo + (np.clip(raw, -1.0, 1.0) + 1.0) / 2.0 * (hi - lo)
    return np.round(scaled, 6)


@dataclass
class _TileYear(InputPartition):
    lon0: float
    lat0: float
    lon1: float
    lat1: float
    year: int


@dataclass
class _TileDates(InputPartition):
    lon0: float
    lat0: float
    lon1: float
    lat1: float
    dates: tuple  # ISO "YYYY-MM-DD" strings


def _emit_batches(dataset: str, scale_deg: float, lon0, lat0, lon1, lat1, dates):
    """Yield one Arrow RecordBatch per image date for a tile — the
    shared generation path of the batch and stream readers."""
    import numpy as np
    import pyarrow as pa

    lons = np.arange(lon0, lon1 - 1e-12, scale_deg)
    lats = np.arange(lat0, lat1 - 1e-12, scale_deg)
    if lons.size == 0 or lats.size == 0:
        return
    glon, glat = np.meshgrid(lons, lats)
    glon, glat = glon.ravel(), glat.ravel()
    spec = _DATASETS[dataset]
    series = f"{dataset}/{spec['band']}"
    n_px = glon.size
    for d in dates:
        doy = d.timetuple().tm_yday
        vals = synthetic_ndvi(dataset, glon, glat, doy)
        ts = np.full(n_px, datetime(d.year, d.month, d.day), dtype="datetime64[us]")
        yield pa.record_batch(
            {
                "series_id": pa.array([series] * n_px),
                "image_id": pa.array([f"{dataset}_{d:%Y%m%d}"] * n_px),
                "longitude": pa.array(glon, pa.float64()),
                "latitude": pa.array(glat, pa.float64()),
                "time": pa.array(ts, pa.timestamp("us")),
                "value": pa.array(vals, pa.float64()),
            }
        )


class RegionReader(DataSourceReader):
    def __init__(self, options):
        self.dataset = options.get("dataset", "gimms")
        if self.dataset not in _DATASETS:
            raise ValueError(
                f"unknown dataset {self.dataset!r}; one of {sorted(_DATASETS)}"
            )
        bbox = [float(v) for v in options.get("bbox", "0,0,4,4").split(",")]
        if len(bbox) != 4:
            raise ValueError("bbox must be 'lon_min,lat_min,lon_max,lat_max'")
        self.lon_min, self.lat_min, self.lon_max, self.lat_max = bbox
        years = [int(v) for v in options.get("years", "2001,2002").split(",")]
        self.year_start, self.year_end = years[0], years[-1]
        self.scale_deg = float(options.get("scale_deg", "0.5"))
        self.tile_deg = float(options.get("tile_deg", "2.0"))
        # pushdown PRUNING bounds — used ONLY to skip whole tiles in
        # :meth:`tiles`; the generation grid stays anchored to the
        # ORIGINAL bbox. (An earlier version mutated the bbox itself,
        # which re-anchored np.arange at the filter value and produced
        # different pixel coordinates/values than the unfiltered scan —
        # pruning must be conservative, never re-gridding.)
        self._prune_lon = [self.lon_min, self.lon_max]
        self._prune_lat = [self.lat_min, self.lat_max]

    # -- pushdown: range predicates shrink the partition grid ----------
    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        for f in filters:
            attr = f.attribute[-1] if isinstance(f.attribute, tuple) else f.attribute
            if attr == "time" and isinstance(
                f, (GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual)
            ):
                v = f.value
                if isinstance(v, (datetime, date)):
                    if isinstance(f, (GreaterThan, GreaterThanOrEqual)):
                        self.year_start = max(self.year_start, v.year)
                    else:
                        self.year_end = min(self.year_end, v.year)
                # pruning is year-granular; re-yield so Spark applies
                # the exact timestamp bound post-scan
            elif attr in ("longitude", "latitude") and isinstance(
                f, (GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual)
            ):
                v = float(f.value)
                lo = isinstance(f, (GreaterThan, GreaterThanOrEqual))
                side = self._prune_lon if attr == "longitude" else self._prune_lat
                if lo:
                    side[0] = max(side[0], v)
                else:
                    side[1] = min(side[1], v)
                # tile-granular pruning only (whole tiles kept when
                # they INTERSECT the bound, so boundary pixels
                # survive); the re-yielded filter applies the exact
                # pixel-level predicate post-scan
            yield f

    def tiles(self) -> list[tuple[float, float, float, float]]:
        """Tile grid anchored at the ORIGINAL bbox origin; tiles that
        don't intersect the pushdown pruning bounds are skipped. A
        tile intersects [lo, hi] when tile_end > lo and tile_start <=
        hi — the closed upper test keeps the tile containing a pixel
        AT a <=/>= bound."""
        out = []
        lon = self.lon_min
        while lon < self.lon_max:
            lon1 = min(lon + self.tile_deg, self.lon_max)
            if lon1 > self._prune_lon[0] and lon <= self._prune_lon[1]:
                lat = self.lat_min
                while lat < self.lat_max:
                    lat1 = min(lat + self.tile_deg, self.lat_max)
                    if lat1 > self._prune_lat[0] and lat <= self._prune_lat[1]:
                        out.append((lon, lat, lon1, lat1))
                    lat += self.tile_deg
            lon += self.tile_deg
        return out

    def partitions(self):
        # an over-filtered request yields zero partitions → empty scan,
        # NOT the reference's error page (SURVEY §4.4 emptiness guard)
        return [
            _TileYear(lon0, lat0, lon1, lat1, yr)
            for (lon0, lat0, lon1, lat1) in self.tiles()
            for yr in range(self.year_start, self.year_end + 1)
        ]

    def read(self, part: _TileYear):
        dates = _dates_for_year(part.year, _DATASETS[self.dataset]["cadence_days"])
        yield from _emit_batches(
            self.dataset, self.scale_deg,
            part.lon0, part.lat0, part.lon1, part.lat1, dates,
        )


class RegionStreamReader(DataSourceStreamReader):
    """Microbatch backfill acquisition: the image-date sequence is the
    offset axis. Each ``latestOffset`` call admits at most
    ``dates_per_batch`` new image dates (source-side admission
    control, the same shape as file-source ``maxFilesPerTrigger``);
    a batch's work splits into one InputPartition per spatial tile,
    so every microbatch parallelizes exactly like the batch reader.
    Offsets are ``{"i": <index into the date sequence>}`` — replaying
    (start, end] is deterministic, which is all Structured Streaming
    needs for exactly-once over this source."""

    def __init__(self, options):
        self._cfg = RegionReader(options)
        spec = _DATASETS[self._cfg.dataset]
        self._dates = [
            d
            for yr in range(self._cfg.year_start, self._cfg.year_end + 1)
            for d in _dates_for_year(yr, spec["cadence_days"])
        ]
        self._per_batch = int(options.get("dates_per_batch", "6"))
        self._available = 0

    def initialOffset(self) -> dict:
        return {"i": 0}

    def latestOffset(self) -> dict:
        self._available = min(self._available + self._per_batch, len(self._dates))
        return {"i": self._available}

    def partitions(self, start: dict, end: dict):
        dates = tuple(d.isoformat() for d in self._dates[start["i"] : end["i"]])
        if not dates:
            return [_TileDates(0.0, 0.0, 0.0, 0.0, ())]  # empty batch
        return [
            _TileDates(lon0, lat0, lon1, lat1, dates)
            for (lon0, lat0, lon1, lat1) in self._cfg.tiles()
        ]

    def read(self, part: _TileDates):
        dates = [date.fromisoformat(s) for s in part.dates]
        yield from _emit_batches(
            self._cfg.dataset, self._cfg.scale_deg,
            part.lon0, part.lat0, part.lon1, part.lat1, dates,
        )

    def commit(self, end: dict) -> None:
        pass


class RegionDataSource(DataSource):
    """``spark.read.format("te_region")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "te_region"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> RegionReader:
        return RegionReader(self.options)

    def streamReader(self, schema) -> RegionStreamReader:
        return RegionStreamReader(self.options)
