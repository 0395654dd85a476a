"""End-to-end engine flow tests (SURVEY §3.2/§3.3 replayed on the
synthetic observation table) + composite/quality-gate properties."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from tests.conftest import obs_frame
from trendengine_spark import engine
from trendengine_spark.operators.composite import (
    annual_composite,
    fill_missing_months,
    monthly_composite,
)
from trendengine_spark.operators.quality import quality_gate
from trendengine_spark.operators.stats import decode_trend_type, polytrend_summary


def test_polytrend_flow_bbox(spark):
    obs = obs_frame(spark)
    res = engine.polytrend(
        obs, 1990, 2009, bbox=(12.9, 51.9, 13.9, 52.1)
    ).toPandas().set_index("longitude")
    truth = (
        obs.select("longitude", "recipe").distinct().toPandas().set_index("longitude")
    )
    # every pixel classified, majority match their recipes
    assert len(res) == len(truth)
    expected = {
        "no_trend": 0, "linear_up": 1, "linear_down": 1,
        "quadratic": 2, "cubic": 3, "concealed": -1,
    }
    hits = sum(
        int(res.loc[lon, "trend_type"] == expected[truth.loc[lon, "recipe"]])
        for lon in truth.index
    )
    assert hits >= len(truth) - 1  # one noise-driven miss tolerated


def test_polytrend_flow_point_selects_nearest(spark):
    obs = obs_frame(spark)
    res = engine.polytrend(obs, 1990, 2009, point=(13.001, 52.0)).toPandas()
    assert len(res) == 1
    assert abs(res["longitude"].iloc[0] - 13.0) < 1e-9


def test_polytrend_summary_counts_sum(spark):
    obs = obs_frame(spark)
    res = engine.polytrend(obs, 1990, 2009)
    s = polytrend_summary(res).toPandas().iloc[0]
    parts = (
        s["count_linear"] + s["count_no_trend"] + s["count_concealed"]
        + s["count_quadratic"] + s["count_cubic"]
    )
    assert parts == s["count_total"]
    assert s["count_negative"] + s["count_positive"] == s["count_total"]


def test_quality_gate_drops_whole_series(spark):
    obs = obs_frame(spark)
    # push one pixel's minimum below the threshold
    low = obs.withColumn(
        "value",
        F.when(
            (F.col("recipe") == "no_trend") & (F.year("time") == 1995), F.lit(0.05)
        ).otherwise(F.col("value")),
    )
    gated = quality_gate(low, ["longitude", "latitude"], threshold=0.1)
    kept = gated.select("recipe").distinct().toPandas()["recipe"].tolist()
    assert "no_trend" not in kept and len(kept) == 5


def test_polytrend_unqualified_rows_are_typed(spark):
    obs = obs_frame(spark)
    low = obs.withColumn(
        "value",
        F.when(F.col("recipe") == "cubic", F.lit(0.01)).otherwise(F.col("value")),
    )
    res = engine.polytrend(low, 1990, 2009, threshold=0.1).toPandas()
    bad = res[res["status"] != "ok"]
    assert len(bad) == 1 and bad["trend_type"].isna().all()


def test_filter_years_keeps_subsecond_tail(spark):
    pdf = pd.DataFrame(
        {
            "time": [pd.Timestamp("2009-12-31 23:59:59.500"), pd.Timestamp("2010-01-01")],
            "value": [1.0, 2.0],
        }
    )
    df = spark.createDataFrame(pdf)
    out = engine.filter_years(df, 1990, 2009).toPandas()
    assert len(out) == 1 and out["value"].iloc[0] == 1.0


def test_constant_series_composite_is_constant(spark):
    obs = obs_frame(spark, noise=0.0)
    const = obs.filter(F.col("recipe") == "no_trend")
    ann = annual_composite(const, ["longitude", "latitude"]).toPandas()
    assert np.allclose(ann["value"], 0.45)


def test_fill_missing_months_densifies(spark):
    obs = obs_frame(spark)
    monthly = monthly_composite(obs, ["longitude", "latitude"])
    # annual data at monthly grain: 1 real month per year → gaps
    dense = fill_missing_months(monthly, ["longitude", "latitude"])
    per_series = (
        dense.groupBy("longitude", "latitude").count().toPandas()["count"].unique()
    )
    # Jul 1990 .. Jul 2009 inclusive = 229 months
    assert list(per_series) == [229]


def test_dbest_generalization_routing(spark):
    obs = obs_frame(spark)
    res = engine.dbest(obs, 1990, 2009, algorithm="generalization")
    cols = set(res.columns)
    assert {"segment_no", "rmse", "mad", "fit", "f_local", "status"} <= cols
    pdf = res.toPandas()
    ok = pdf[pdf["status"] == "ok"]
    # annual series densified to 229 monthly points → qualifies
    assert len(ok) > 0 and (ok["rmse"] >= 0).all()


def test_dbest_changes_events_shape(spark):
    obs = obs_frame(spark)
    res = engine.dbest(obs, 1990, 2009, algorithm="changedetection").toPandas()
    assert {"change", "change_type", "significance", "p_value", "status"} <= set(
        res.columns
    )


def test_decode_trend_type_labels(spark):
    pdf = pd.DataFrame({"trend_type": [-1, 0, 1, 2, 3]})
    out = decode_trend_type(spark.createDataFrame(pdf)).toPandas()
    assert out["trend_type_label"].tolist() == [
        "concealed", "no trend", "linear", "cuadratic", "cubic",
    ]


def test_require_nonempty_guard(spark):
    import pytest as _pytest

    from trendengine_spark.engine import EmptySelectionError, require_nonempty

    obs = obs_frame(spark)
    assert require_nonempty(obs) is obs
    empty = obs.filter(F.col("longitude") > 999)
    with _pytest.raises(EmptySelectionError):
        require_nonempty(empty, context="bbox selection")


def test_point_flow_includes_series_array(spark):
    obs = obs_frame(spark)
    res = engine.polytrend(obs, 1990, 2009, point=(13.0, 52.0)).toPandas()
    assert "ts" in res.columns
    assert len(res["ts"].iloc[0]) == res["n_points"].iloc[0] == 20
    # polygon flow omits the array (reference polygon result shape)
    poly = engine.polytrend(obs, 1990, 2009)
    assert "ts" not in poly.columns


def test_interpolate_months_linear_fill(spark):
    import pandas as pd_

    from trendengine_spark.operators.composite import interpolate_months

    pdf = pd_.DataFrame(
        {
            "k": ["a"] * 5,
            "period_start": pd_.to_datetime(
                ["2020-01-01", "2020-02-01", "2020-03-01", "2020-04-01", "2020-05-01"]
            ),
            "value": [1.0, None, None, 4.0, None],
        }
    )
    out = (
        interpolate_months(spark.createDataFrame(pdf), ["k"])
        .toPandas()
        .sort_values("period_start")["value_filled"]
        .tolist()
    )
    # interior gaps: linear between 1.0@jan and 4.0@apr; trailing gap carries 4.0
    assert out == [1.0, 2.0, 3.0, 4.0, 4.0]


def test_trend_engine_facade_delegates(spark):
    """The facade must produce byte-identical results to the
    functional API it wraps."""
    from trendengine_spark.engine import TrendEngine, polytrend

    obs = obs_frame(spark)
    eng = TrendEngine(spark, obs)
    a = (
        eng.polytrend(1990, 2009)
        .toPandas()
        .sort_values(["longitude", "latitude"])
        .reset_index(drop=True)
    )
    b = (
        polytrend(obs, 1990, 2009)
        .toPandas()
        .sort_values(["longitude", "latitude"])
        .reset_index(drop=True)
    )
    assert a.equals(b)
    stats = eng.polytrend_stats(eng.polytrend(1990, 2009))
    assert stats.count() > 0


def test_expectations_report_and_quarantine_agree(spark):
    """Report fail counts must equal quarantine row membership, and
    _failed_rules must name exactly the violated rules."""
    import pandas as pd

    from trendengine_spark.operators.quality import expectations
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "id": [1, 2, 3, 4],
                "v": [5.0, -1.0, 7.0, -2.0],
                "cat": ["a", "a", "zz", "zz"],
            }
        )
    )
    report, quarantine = expectations(
        df,
        {
            "v_nonneg": F.col("v") >= 0,
            "cat_known": F.col("cat").isin("a", "b"),
        },
    )
    rep = {r["rule"]: (r["n_pass"], r["n_fail"]) for r in report.collect()}
    assert rep == {"v_nonneg": (2, 2), "cat_known": (2, 2)}
    q = {r["id"]: r["_failed_rules"] for r in quarantine.collect()}
    assert q == {2: "v_nonneg", 3: "cat_known", 4: "v_nonneg,cat_known"}


def test_mann_kendall_flow_detects_planted_trend(spark):
    """The MK flow over the engine's acquisition spine: a synthetic
    pixel with a clean upward annual trend must come back trend=+1
    with Sen's slope ~ the planted slope; a flat pixel must not."""
    import pandas as pd

    from trendengine_spark.engine import TrendEngine

    rows = []
    for yr in range(2000, 2020):
        for m in (3, 9):  # two obs per year -> annual composite
            rows.append((10.0, 50.0, pd.Timestamp(f"{yr}-{m:02d}-15"),
                         0.2 + 0.01 * (yr - 2000)))
            rows.append((11.0, 51.0, pd.Timestamp(f"{yr}-{m:02d}-15"),
                         0.5))
    obs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["longitude", "latitude", "time", "value"])
    )
    eng = TrendEngine(spark, obs)
    out = {
        (r["longitude"], r["latitude"]): r
        for r in eng.mann_kendall(2000, 2019).collect()
    }
    up = out[(10.0, 50.0)]
    assert up["trend"] == 1 and up["p_value"] < 0.001
    assert abs(up["sens_slope"] - 0.01) < 1e-9
    flat = out[(11.0, 51.0)]
    assert flat["trend"] == 0 and flat["s_stat"] == 0


def test_seasonal_mann_kendall_flow(spark):
    """Seasonal MK through the monthly-composite spine: a pixel with
    a pure annual cycle must test trend=0; cycle + drift trend=+1."""
    import math

    import pandas as pd

    from trendengine_spark.engine import TrendEngine

    rows = []
    for yr in range(2000, 2012):
        for m in range(1, 13):
            cyc = 0.3 * math.sin(2 * math.pi * m / 12)
            rows.append((10.0, 50.0, pd.Timestamp(f"{yr}-{m:02d}-15"),
                         0.5 + cyc))
            rows.append((11.0, 51.0, pd.Timestamp(f"{yr}-{m:02d}-15"),
                         0.5 + cyc + 0.02 * (yr - 2000)))
    obs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["longitude", "latitude", "time", "value"])
    )
    eng = TrendEngine(spark, obs)
    out = {
        (r["longitude"], r["latitude"]): r
        for r in eng.seasonal_mann_kendall(2000, 2011).collect()
    }
    assert out[(10.0, 50.0)]["trend"] == 0
    up = out[(11.0, 51.0)]
    assert up["trend"] == 1 and up["p_value"] < 1e-6
    assert abs(up["seasonal_sen"] - 0.02) < 1e-9


def test_engine_dbest_non_cyclical_flow(spark):
    """The data_type knob reaches the fit through the engine facade:
    non-cyclical runs change detection WITHOUT seasonal adjustment
    (the path the reference crashes on — SURVEY §4.4.6) and still
    returns the typed per-change rows."""
    from trendengine_spark.engine import dbest

    out = dbest(
        obs_frame(spark),
        1990,
        2005,
        algorithm="changedetection",  # reference form string, canonicalized
        data_type="non-cyclical",
        largest_only=True,
    ).collect()
    assert len(out) > 0
    ok = [r for r in out if r["status"] == "ok"]
    assert ok, "no qualified series"
    for r in ok:
        assert r["change"] is not None


def test_polytrend_flow_polygon_aoi(spark):
    """r8: the polygon AOI path (the reference parses polygons but
    its UI never emits one) — a triangle covering only part of the
    synthetic grid must classify exactly the pixels inside it, and
    results for those pixels must equal the bbox run's."""
    from trendengine_spark.engine import filter_polygon

    obs = obs_frame(spark)
    # the synthetic grid: find its extent, then a triangle over part
    ext = obs.select(
        F.min("longitude"), F.max("longitude"),
        F.min("latitude"), F.max("latitude"),
    ).collect()[0]
    lon0, lon1, lat0, lat1 = ext
    midlon = (lon0 + lon1) / 2
    tri = [
        (lon0 - 0.01, lat0 - 0.01),
        (midlon + 1e-6, lat0 - 0.01),
        (lon0 - 0.01, lat1 + 0.01),
    ]
    inside_pixels = {
        (r["longitude"], r["latitude"])
        for r in filter_polygon(obs, tri)
        .select("longitude", "latitude")
        .distinct()
        .collect()
    }
    all_pixels = {
        (r["longitude"], r["latitude"])
        for r in obs.select("longitude", "latitude").distinct().collect()
    }
    assert 0 < len(inside_pixels) < len(all_pixels)
    res = engine.polytrend(obs, 1990, 2009, polygon=tri).toPandas()
    assert {
        (r.longitude, r.latitude) for r in res.itertuples()
    } == inside_pixels
    # agreement with the full run on the shared pixels
    full = engine.polytrend(obs, 1990, 2009).toPandas()
    merged = res.merge(
        full, on=["longitude", "latitude"], suffixes=("_p", "_f")
    )
    assert (merged["trend_type_p"] == merged["trend_type_f"]).all()
