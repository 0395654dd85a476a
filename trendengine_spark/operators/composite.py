"""Temporal composites — the reference's acquire-stage aggregations.

Reference behavior (cited into /root/reference):
- Annual mean composite: per year, mean over all images in the year
  (``TrendEngine/calculations/polytrend.py:375-399``; mean at :387 —
  note README.md:22 says "maximum", code computes mean; we default to
  mean and expose ``how`` to match either).
- Monthly mean composite: nested year×month loop, per-month mean
  (``TrendEngine/calculations/dbest.py:34-62``; mean at :53).
- The reference drives these with a zip-repeat-map over a generated
  year list (``polytrend.py:391-398``) — in Spark the same result is
  a single ``groupBy(series, year(time))`` aggregation: one shuffle,
  map-side partial aggregation, whole-stage codegen, no driver loop.

Scale notes: the composite is a hash aggregate keyed on
(series, period). Cardinality = #series × #periods, which shards
uniformly — no skew risk even at 100 TB because every series
contributes the same number of periods. Input-side filters (date
range, AOI) are applied by the caller *before* this operator so they
push down to the Parquet scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _exact_mean(c: str) -> Column:
    """Deterministic mean: exact decimal sum (order-independent, so
    results don't vary with partial-aggregation merge order across
    runs/partitionings — a reproducibility requirement for an engine
    whose results are hash-compared) divided in double. Inputs cast to
    DECIMAL(18,10) (long-backed → codegen-fast per-row path; holds
    values < 1e8); Spark widens the SUM buffer to (28,10), so group
    totals up to ~1e18 are exact — headroom for 1e12-row groups of
    1e5-magnitude values."""
    return F.sum(F.col(c).cast("decimal(18,10)")).cast("double") / F.count(F.col(c))


_AGGS = {
    "mean": _exact_mean,
    "max": F.max,
    "min": F.min,
    "sum": F.sum,
    "median": lambda c: F.median(c),
}


def _agg(how: str, col: str) -> Column:
    if how not in _AGGS:
        raise ValueError(f"unknown composite agg {how!r}; one of {sorted(_AGGS)}")
    return _AGGS[how](col)


def annual_composite(
    obs: DataFrame,
    series_cols: list[str],
    time_col: str = "time",
    value_col: str = "value",
    how: str = "mean",
) -> DataFrame:
    """Per-series annual composite (reference A1).

    Returns one row per (series, year) with the aggregated value and
    a canonical period timestamp (Jan 1 of the year, mirroring the
    reference stamping ``system:time_start`` to the year,
    ``polytrend.py:388``).
    """
    yr = F.year(F.col(time_col)).alias("yr")
    return (
        obs.groupBy(*series_cols, yr)
        .agg(_agg(how, value_col).alias(value_col))
        .withColumn("period_start", F.make_date(F.col("yr"), F.lit(1), F.lit(1)))
    )


def monthly_composite(
    obs: DataFrame,
    series_cols: list[str],
    time_col: str = "time",
    value_col: str = "value",
    how: str = "mean",
) -> DataFrame:
    """Per-series monthly composite (reference A2).

    Months with no observations are simply absent (the reference
    produces masked images there, ``dbest.py:34-62``); use
    :func:`fill_missing_months` to densify + interpolate when an
    algorithm needs a regular grid.
    """
    period = F.date_trunc("month", F.col(time_col)).alias("period_start")
    return obs.groupBy(*series_cols, period).agg(_agg(how, value_col).alias(value_col))


def grid_composite(
    obs: DataFrame,
    cell_size: float,
    lon_col: str = "longitude",
    lat_col: str = "latitude",
    value_col: str = "value",
    extra_keys: list[str] | None = None,
) -> DataFrame:
    """Spatial resolution reduction (reference ``scale=`` resampling,
    ``utils.py:9``): snap pixels to a grid of ``cell_size`` degrees and
    average. Explicit operator — no Catalyst analog (SURVEY.md §4.1).
    """
    cell_x = F.floor(F.col(lon_col) / cell_size).alias("cell_x")
    cell_y = F.floor(F.col(lat_col) / cell_size).alias("cell_y")
    keys = list(extra_keys or [])
    return (
        obs.groupBy(cell_x, cell_y, *keys)
        .agg(
            _exact_mean(lon_col).alias(lon_col),
            _exact_mean(lat_col).alias(lat_col),
            _exact_mean(value_col).alias(value_col),
            F.count(F.lit(1)).alias("n_obs"),
        )
    )


def interpolate_months(
    dense: DataFrame,
    series_cols: list[str],
    period_col: str = "period_start",
    value_col: str = "value",
    out_col: str = "value_filled",
) -> DataFrame:
    """Linear interpolation of null gaps on a regular monthly grid —
    entirely JVM-side (window functions, no UDF), the set-based twin
    of the in-UDF :func:`~trendengine_spark.functions.dbest.interpolate_gaps`.

    For each null row, take the last non-null (index, value) before
    and the first after (``last/first ... ignorenulls`` over
    running/future frames) and interpolate on the month index; edge
    gaps carry the nearest value. One shuffle on the series key, two
    in-partition window passes.
    """
    from pyspark.sql import Window

    idx = (F.year(period_col) * 12 + F.month(period_col)).alias("_i")
    d = dense.withColumn("_i", idx)
    known = F.when(
        F.col(value_col).isNotNull(), F.struct(F.col("_i").alias("i"), F.col(value_col).alias("v"))
    )
    w_back = (
        Window.partitionBy(*series_cols)
        .orderBy("_i")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(*series_cols)
        .orderBy("_i")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    d = d.withColumn("_prev", F.last(known, ignorenulls=True).over(w_back)).withColumn(
        "_next", F.first(known, ignorenulls=True).over(w_fwd)
    )
    pv, pi = F.col("_prev.v"), F.col("_prev.i")
    nv, ni = F.col("_next.v"), F.col("_next.i")
    interp = pv + (nv - pv) * (F.col("_i") - pi) / (ni - pi)
    filled = (
        F.when(F.col(value_col).isNotNull(), F.col(value_col))
        .when(pv.isNull(), nv)           # leading gap → first known
        .when(nv.isNull(), pv)           # trailing gap → last known
        .otherwise(interp)
    )
    return d.withColumn(out_col, filled).drop("_i", "_prev", "_next")


def fill_missing_months(
    monthly: DataFrame,
    series_cols: list[str],
    period_col: str = "period_start",
    value_col: str = "value",
) -> DataFrame:
    """Densify a monthly composite to a regular grid.

    Missing months get a null value (caller may interpolate inside
    the fitting UDF). Implemented as per-series min/max span →
    ``sequence`` + ``explode`` → left join back; the join is on the
    series key so it co-partitions with the original aggregation.
    """
    spans = monthly.groupBy(*series_cols).agg(
        F.min(period_col).alias("_mn"), F.max(period_col).alias("_mx")
    )
    grid = spans.select(
        *series_cols,
        F.explode(
            F.sequence(F.col("_mn"), F.col("_mx"), F.expr("interval 1 month"))
        ).alias(period_col),
    )
    return grid.join(monthly, [*series_cols, period_col], "left")
