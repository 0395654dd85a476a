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
