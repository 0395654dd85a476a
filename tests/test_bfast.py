"""Golden tests for the BFAST-monitor-lite MOSUM detector."""

from __future__ import annotations

import math

import numpy as np

from trendengine_spark.functions.bfast import bfast_monitor


def _seasonal(n, amp=0.3, freq=12.0, base=0.5, slope=0.0, noise=0.0, seed=0):
    t = np.arange(n, dtype=float)
    rng = np.random.RandomState(seed)
    return (
        base
        + slope * t
        + amp * np.sin(2 * math.pi * t / freq)
        + (rng.normal(0, noise, n) if noise else 0.0)
    )


def test_stable_seasonal_series_does_not_alarm():
    y = _seasonal(120, noise=0.01, seed=3)
    r = bfast_monitor(y, freq=12.0)
    assert not r["break_detected"]
    assert r["n_history"] == 72 and r["n_monitor"] == 48


def test_planted_shift_detected_near_true_date_with_magnitude():
    y = _seasonal(120, noise=0.01, seed=5)
    y[90:] -= 0.4  # disturbance 18 points into monitoring
    r = bfast_monitor(y, freq=12.0)
    assert r["break_detected"]
    # within one MOSUM window (h = ceil(0.25*72) = 18) of the truth
    assert 90 <= r["break_idx"] <= 90 + 18
    assert abs(r["magnitude"] + 0.4) < 0.05
    assert r["mosum_max"] > 4.0


def test_trend_in_history_is_modelled_not_alarmed():
    # a steady trend continuing through monitoring is part of the
    # fitted model, not a disturbance
    y = _seasonal(120, slope=0.002, noise=0.01, seed=7)
    r = bfast_monitor(y, freq=12.0)
    assert not r["break_detected"]


def test_short_series_degrades_cleanly():
    r = bfast_monitor(np.ones(3))
    assert not r["break_detected"] and r["break_idx"] == -1


def test_groups_wrapper_matches_direct(spark):
    import pandas as pd

    from trendengine_spark.functions.bfast import bfast_monitor_groups

    y1 = _seasonal(96, noise=0.01, seed=1)
    y2 = _seasonal(96, noise=0.01, seed=2)
    y2[80:] += 0.5
    rows = [("a", i, float(v)) for i, v in enumerate(y1)]
    rows += [("b", i, float(v)) for i, v in enumerate(y2)]
    df = spark.createDataFrame(rows, "g string, tix long, value double")
    out = {
        r["g"]: r
        for r in bfast_monitor_groups(
            df, ["g"], time_col="tix", value_col="value"
        ).collect()
    }
    assert not out["a"]["break_detected"]
    want = bfast_monitor(y2)
    assert out["b"]["break_detected"]
    assert out["b"]["break_idx"] == want["break_idx"]
    assert abs(out["b"]["magnitude"] - want["magnitude"]) < 1e-12


def test_bfast_engine_flow_flags_disturbed_pixel(spark):
    import math

    import pandas as pd

    from trendengine_spark.engine import TrendEngine

    rows = []
    for i, (yr, m) in enumerate(
        (y, m) for y in range(2000, 2012) for m in range(1, 13)
    ):
        cyc = 0.3 * math.sin(2 * math.pi * m / 12)
        stable = 0.5 + cyc
        disturbed = stable - (0.4 if i >= 120 else 0.0)  # break in monitor
        ts = pd.Timestamp(f"{yr}-{m:02d}-15")
        rows.append((10.0, 50.0, ts, stable))
        rows.append((11.0, 51.0, ts, disturbed))
    obs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["longitude", "latitude", "time", "value"])
    )
    eng = TrendEngine(spark, obs)
    out = {
        (r["longitude"], r["latitude"]): r
        for r in eng.bfast_monitor(2000, 2011).collect()
    }
    assert not out[(10.0, 50.0)]["break_detected"]
    hit = out[(11.0, 51.0)]
    assert hit["break_detected"] and hit["break_idx"] >= 120
    assert abs(hit["magnitude"] + 0.4) < 0.05


# ---------------------------------------------------------------- r12 twin
def _twin_over_pts(spark, rows):
    """Run the u7 relational twin's shared SQL over planted
    (event_type, x, y) integer frames."""
    import pandas as pd

    from trendengine_spark.queries.analytics import _u7_sql

    spark.createDataFrame(
        pd.DataFrame(rows, columns=["event_type", "x", "y"])
    ).createOrReplaceTempView("te_u7_pts")
    return {
        r["event_type"]: r
        for r in spark.sql(
            "WITH "
            + _u7_sql("SELECT event_type, x, y FROM te_u7_pts", " DIV ")
        ).collect()
    }


def test_u7_twin_matches_numpy_on_planted_series(spark):
    """Relational twin vs the numpy path on integer series covering
    both exits (alarm / no alarm): flags and indices equal, floats
    within the documented quantization tolerance (harmonics at 2^15,
    residuals at 2^12)."""
    rng = np.random.RandomState(7)
    stable = np.round(
        100 + 20 * np.sin(2 * math.pi * np.arange(40) / 7)
        + rng.normal(0, 2, 40)
    ).astype(int)
    shifted = stable.copy()
    shifted[30:] += 60  # level shift in the monitoring period
    rows = [("a", i, int(v)) for i, v in enumerate(stable)]
    rows += [("b", i, int(v)) for i, v in enumerate(shifted)]
    got = _twin_over_pts(spark, rows)
    for name, y in (("a", stable), ("b", shifted)):
        want = bfast_monitor(y.astype(float), freq=7.0)
        g = got[name]
        assert g["break_detected"] == want["break_detected"]
        assert g["break_idx"] == want["break_idx"]
        assert g["n_history"] == want["n_history"]
        assert g["n_monitor"] == want["n_monitor"]
        assert abs(g["mosum_max"] - want["mosum_max"]) < max(
            2e-3 * want["mosum_max"], 2e-3
        )
        assert abs(g["magnitude"] - want["magnitude"]) < 1e-6 + 1e-3 * abs(
            want["magnitude"]
        )
    assert got["b"]["break_detected"] and not got["a"]["break_detected"]


def test_u7_twin_declared_query_matches_numpy_events(spark):
    """The declared twin on the real sf0.001 events table agrees
    with the numpy monitor run on the same daily series."""
    import pandas as pd

    from trendengine_spark.queries import REGISTRY

    sf = "/root/testdata/sf0.001"
    got = {
        r["event_type"]: r
        for r in REGISTRY["u7_bfast_relational"].fn(spark, sf).collect()
    }
    from trendengine_spark.tables import load_table

    ev = load_table(spark, sf, "events")
    import pyspark.sql.functions as F

    daily = (
        ev.groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("y"))
        .orderBy("event_type", "d")
        .toPandas()
    )
    for name, grp in daily.groupby("event_type"):
        want = bfast_monitor(
            grp["y"].to_numpy(dtype=float), freq=7.0
        )
        g = got[name]
        assert g["break_detected"] == want["break_detected"]
        assert g["n_history"] == want["n_history"]
        assert abs(g["mosum_max"] - want["mosum_max"]) < max(
            2e-3 * want["mosum_max"], 2e-3
        )
