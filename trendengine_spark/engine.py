"""High-level engine API — the Spark-native equivalent of the
reference's two analytical entry points (``do_polytrend`` /
``do_dbest``, ``TrendEngine/calculations/polytrend.py:402``,
``dbest.py:443``), minus the HTTP/plot layers (out of engine scope,
SURVEY.md §3.5).

AOI semantics follow the reference UI (marker or rectangle only,
``TrendEngine/static/utils.js:104-110``): a point selects the nearest
series; a bbox is a conjunctive range predicate that Catalyst pushes
to the Parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from trendengine_spark.functions.dbest import (
    dbest_changes,
    dbest_decomposition,
    dbest_generalize,
)
from trendengine_spark.functions.polytrend import polytrend_groups
from trendengine_spark.operators.composite import (
    annual_composite,
    fill_missing_months,
    monthly_composite,
)
from trendengine_spark.operators.stats import polytrend_summary

PIXEL = ["longitude", "latitude"]


class EmptySelectionError(ValueError):
    """Raised when a filtered selection contains no observations —
    the engine analog of the reference's first-image emptiness probe
    → error page (D4: ``polytrend.py:463-467``, ``utils.py:7``)."""


def require_nonempty(df: DataFrame, context: str = "selection") -> DataFrame:
    """D4 guard: fail fast (with a typed error) when the AOI/date
    selection matches nothing, instead of propagating empty frames
    into the fitting stage. Uses ``isEmpty`` — a limit-1 probe job,
    not a full count."""
    if df.isEmpty():
        raise EmptySelectionError(
            f"{context} matched no observations (empty AOI/date selection)"
        )
    return df


def filter_years(obs: DataFrame, year_from: int, year_to: int, time_col: str = "time") -> DataFrame:
    """Temporal range filter (reference F1: ``filterDate(f'{y}-01-01',
    f'{y}-12-31')``, ``polytrend.py:452-458``). Half-open end bound so
    sub-second timestamps in the final day are kept (a ``between ...
    23:59:59`` bound silently drops them — VERDICT r1)."""
    return obs.filter(
        (F.col(time_col) >= F.lit(f"{year_from}-01-01"))
        & (F.col(time_col) < F.lit(f"{year_to + 1}-01-01"))
    )


def filter_bbox(
    obs: DataFrame, lon1: float, lat1: float, lon2: float, lat2: float
) -> DataFrame:
    """Spatial rectangle filter (reference F2: ``filterBounds``,
    ``polytrend.py:458``) — pure range predicates, parquet-prunable."""
    return obs.filter(
        F.col("longitude").between(min(lon1, lon2), max(lon1, lon2))
        & F.col("latitude").between(min(lat1, lat2), max(lat1, lat2))
    )


def filter_point(obs: DataFrame, lon: float, lat: float) -> DataFrame:
    """Point AOI → nearest pixel (reference point flow,
    ``polytrend.py:316-372``). Distance ranking over the distinct
    pixel grid (tiny), then a semi-join back — the grid frame
    broadcasts."""
    pixels = obs.select(*PIXEL).distinct()
    nearest = (
        pixels.withColumn(
            "_d2",
            (F.col("longitude") - lon) ** 2 + (F.col("latitude") - lat) ** 2,
        )
        .orderBy("_d2")
        .limit(1)
        .drop("_d2")
    )
    return obs.join(F.broadcast(nearest), PIXEL, "left_semi")


def filter_polygon(
    obs: DataFrame, vertices: list[tuple[float, float]]
) -> DataFrame:
    """General polygon AOI (r8) — the reference's coordinate parser
    builds ``ee.Geometry.Polygon`` for >2 points
    (``polytrend.py:444-448``) but its UI never emits one; here the
    polygon case is real: a bbox PRE-FILTER from the vertex envelope
    (range predicates — row-group prunable, and the part AQE/parquet
    can use) followed by the exact ray-casting parity expression
    (:func:`~trendengine_spark.operators.spatial.polygon_contains`,
    codegen, no UDF)."""
    from trendengine_spark.operators.spatial import polygon_contains

    xs = [v[0] for v in vertices]
    ys = [v[1] for v in vertices]
    return filter_bbox(obs, min(xs), min(ys), max(xs), max(ys)).filter(
        polygon_contains(F.col("longitude"), F.col("latitude"), vertices)
    )


def polytrend(
    obs: DataFrame,
    year_from: int,
    year_to: int,
    alpha: float = 0.05,
    threshold: float = 0.1,
    bbox: tuple[float, float, float, float] | None = None,
    point: tuple[float, float] | None = None,
    polygon: list[tuple[float, float]] | None = None,
    composite: str = "mean",
    series_cols: list[str] | None = None,
    include_series: bool | None = None,
) -> DataFrame:
    """PolyTrend flow (reference §3.2): filter → annual composite →
    quality gate + per-series classification. ``include_series``
    defaults to True for point AOIs (the reference's point result
    carries the analyzed series + degree, ``polytrend.py:346-366``)
    and False for polygon runs (the polygon table has no ts column,
    ``polytrend.py:291-297``)."""
    series_cols = series_cols or PIXEL
    if include_series is None:
        include_series = point is not None
    df = filter_years(obs, year_from, year_to)
    if bbox is not None:
        df = filter_bbox(df, *bbox)
    if polygon is not None:
        df = filter_polygon(df, polygon)
    if point is not None:
        df = filter_point(df, *point)
    annual = annual_composite(df, series_cols, how=composite)
    return polytrend_groups(
        annual,
        series_cols,
        time_col="yr",
        value_col="value",
        alpha=alpha,
        threshold=threshold,
        include_series=include_series,
    )


def polytrend_stats(result: DataFrame) -> DataFrame:
    """Roll-up statistics over a PolyTrend result (reference
    ``utils.py:37-64``)."""
    return polytrend_summary(result)


def polytrend_report(
    result: DataFrame,
    path: str,
    title: str = "PolyTrend analysis",
    series: tuple | None = None,
) -> str:
    """S6 presentation sink: render a PolyTrend run into a
    self-contained HTML report — per-class roll-up table + pie (the
    reference's polygon Bokeh stage, ``polytrend.py:38-126``) and,
    for point AOIs, the observed-vs-fitted series plot
    (``polytrend.py:213-239``) via ``series=(xs, ys, fit)``. Thin
    client over bounded result tables; see
    :mod:`trendengine_spark.report`."""
    from trendengine_spark.report import write_html_report

    stats = polytrend_summary(result)
    labeled = stats.filter(F.col("trend_type_label") != "total")
    return write_html_report(
        path,
        title,
        stats=stats,
        pie=("trend_type_label", "n", labeled),
        series=series,
        result_table=result.drop("ts"),
    )


def dbest(
    obs: DataFrame,
    year_from: int,
    year_to: int,
    algorithm: str = "change_detection",
    threshold: float | None = None,
    bbox: tuple[float, float, float, float] | None = None,
    point: tuple[float, float] | None = None,
    polygon: list[tuple[float, float]] | None = None,
    series_cols: list[str] | None = None,
    largest_only: bool = False,
    **knobs,
) -> DataFrame:
    """DBEST flow (reference §3.3): filter → monthly composite →
    per-series change detection / decomposition.

    ``algorithm`` is canonicalized to ``change_detection`` /
    ``generalization`` (the reference's form and code disagree on the
    string — SURVEY.md §4.4.7)."""
    series_cols = series_cols or PIXEL
    algorithm = algorithm.replace(" ", "_").replace("changedetection", "change_detection")
    df = filter_years(obs, year_from, year_to)
    if bbox is not None:
        df = filter_bbox(df, *bbox)
    if polygon is not None:
        df = filter_polygon(df, polygon)
    if point is not None:
        df = filter_point(df, *point)
    # densify to a regular monthly grid: the fitting UDFs index seasonal
    # phase by position, so missing months must become null rows (then
    # interpolated in-UDF), not silently absent (ADVICE r1)
    monthly = fill_missing_months(monthly_composite(df, series_cols), series_cols)
    if algorithm == "change_detection":
        return dbest_changes(
            monthly, series_cols, threshold=threshold, largest_only=largest_only, **knobs
        )
    if algorithm == "decomposition":
        return dbest_decomposition(monthly, series_cols, **knobs)
    if algorithm == "generalization":
        return dbest_generalize(monthly, series_cols, **knobs)
    raise ValueError(f"unknown algorithm {algorithm!r}")


def mann_kendall(
    obs: DataFrame,
    year_from: int,
    year_to: int,
    bbox: tuple[float, float, float, float] | None = None,
    point: tuple[float, float] | None = None,
    composite: str = "mean",
    series_cols: list[str] | None = None,
) -> DataFrame:
    """Mann–Kendall + Sen's slope flow (r7): the non-parametric trend
    baseline the PolyTrend/DBEST literature benchmarks against, run
    through the SAME acquisition spine as the reference flows —
    filter → annual composite → per-series test. No reference analog
    (the reference offers only the two R algorithms); output per
    series: n, S, tie-corrected variance, z, two-sided p, trend
    verdict at α=0.05, Sen's slope (`functions/mannkendall.py`)."""
    from trendengine_spark.functions.mannkendall import mann_kendall_groups

    series_cols = series_cols or PIXEL
    df = filter_years(obs, year_from, year_to)
    if bbox is not None:
        df = filter_bbox(df, *bbox)
    if point is not None:
        df = filter_point(df, *point)
    annual = annual_composite(df, series_cols, how=composite)
    return mann_kendall_groups(
        annual, series_cols, time_col="yr", value_col="value"
    )


def seasonal_mann_kendall(
    obs: DataFrame,
    year_from: int,
    year_to: int,
    bbox: tuple[float, float, float, float] | None = None,
    point: tuple[float, float] | None = None,
    series_cols: list[str] | None = None,
) -> DataFrame:
    """Seasonal (Hirsch–Slack) Mann–Kendall flow (r7): MONTHLY
    composite → per-series seasonal MK (month-of-year as the season
    label). The right trend test for NDVI-class series, whose annual
    cycle plain MK reads as noise; combines per-month S/Var and pools
    within-month Sen slopes (`functions/mannkendall.py`)."""
    from trendengine_spark.functions.mannkendall import (
        seasonal_mann_kendall_groups,
    )

    series_cols = series_cols or PIXEL
    df = filter_years(obs, year_from, year_to)
    if bbox is not None:
        df = filter_bbox(df, *bbox)
    if point is not None:
        df = filter_point(df, *point)
    monthly = monthly_composite(df, series_cols)
    monthly = monthly.withColumn(
        "season", F.month("period_start")
    ).withColumn("yy", F.year("period_start"))
    return seasonal_mann_kendall_groups(
        monthly, series_cols, time_col="yy", season_col="season",
        value_col="value",
    )


def bfast_monitor(
    obs: DataFrame,
    year_from: int,
    year_to: int,
    bbox: tuple[float, float, float, float] | None = None,
    point: tuple[float, float] | None = None,
    series_cols: list[str] | None = None,
    freq: float = 12.0,
    h_frac: float = 0.25,
    lam: float = 4.0,
) -> DataFrame:
    """BFAST-monitor-lite flow (r7): monthly composite → per-series
    MOSUM monitoring against the stable-history harmonic+trend fit —
    near-real-time disturbance detection, the monitoring complement
    to the offline dbest() change detection
    (`functions/bfast.py`; golden-tested planted-shift contract)."""
    from trendengine_spark.functions.bfast import bfast_monitor_groups

    series_cols = series_cols or PIXEL
    df = filter_years(obs, year_from, year_to)
    if bbox is not None:
        df = filter_bbox(df, *bbox)
    if point is not None:
        df = filter_point(df, *point)
    monthly = monthly_composite(df, series_cols)
    return bfast_monitor_groups(
        monthly, series_cols, time_col="period_start",
        value_col="value", freq=freq, h_frac=h_frac, lam=lam,
    )


class TrendEngine:
    """Facade binding a SparkSession + observation table to the full
    flow surface — the one-object migration target for a reference
    user (the reference's Flask routes dispatch to exactly these two
    flows, ``calculations/routes.py:22-33``):

        eng = TrendEngine(spark, obs)          # or .from_parquet(...)
        result = eng.polytrend(1990, 2010, point=(13.8, 55.6))
        stats  = eng.polytrend_stats(result)
        change = eng.dbest(2000, 2010, bbox=(10, 50, 15, 55))

    Pure delegation — every method is the module-level function with
    the bound observation table as its first argument, so the
    functional API and the facade cannot drift.
    """

    def __init__(self, spark, obs: DataFrame):
        self.spark = spark
        self.obs = obs

    @classmethod
    def from_parquet(cls, spark, path: str) -> "TrendEngine":
        return cls(spark, spark.read.parquet(path))

    def filter_years(self, year_from: int, year_to: int) -> DataFrame:
        return filter_years(self.obs, year_from, year_to)

    def polytrend(self, year_from: int, year_to: int, **kw) -> DataFrame:
        return polytrend(self.obs, year_from, year_to, **kw)

    def polytrend_stats(self, result: DataFrame) -> DataFrame:
        return polytrend_stats(result)

    def dbest(self, year_from: int, year_to: int, **kw) -> DataFrame:
        return dbest(self.obs, year_from, year_to, **kw)

    def mann_kendall(self, year_from: int, year_to: int, **kw) -> DataFrame:
        return mann_kendall(self.obs, year_from, year_to, **kw)

    def seasonal_mann_kendall(
        self, year_from: int, year_to: int, **kw
    ) -> DataFrame:
        return seasonal_mann_kendall(self.obs, year_from, year_to, **kw)

    def bfast_monitor(self, year_from: int, year_to: int, **kw) -> DataFrame:
        return bfast_monitor(self.obs, year_from, year_to, **kw)
