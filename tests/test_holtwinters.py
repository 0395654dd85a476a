"""Additive Holt–Winters (`functions/holtwinters.py`)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from trendengine_spark.functions.holtwinters import (
    hw_backtest_groups,
    hw_fit_forecast,
    hw_vectorized,
)


def _seasonal_series(t_len=120, m=7, trend=0.5, seed=2, noise=0.3):
    rng = np.random.RandomState(seed)
    season = np.array([10, -4, 3, 0, -6, 8, -11])[:m] * 1.0
    t = np.arange(t_len)
    return 50 + trend * t + season[t % m] + noise * rng.normal(size=t_len)


def test_vectorized_equals_scalar_reference():
    m, horizon = 7, 14
    series = [
        _seasonal_series(seed=s, trend=tr, noise=nz)
        for s, tr, nz in [(1, 0.5, 0.3), (2, -0.2, 1.0), (3, 0.0, 0.0)]
    ]
    ym = np.vstack(series)
    fit_v, fc_v = hw_vectorized(ym, m, horizon)
    for i, y in enumerate(series):
        fit_s, fc_s = hw_fit_forecast(y, m, horizon)
        np.testing.assert_array_equal(fit_v[i], fit_s)
        np.testing.assert_array_equal(fc_v[i], fc_s)


def test_recovers_planted_trend_and_seasonality():
    y = _seasonal_series(t_len=150, noise=0.1)
    train, test = y[:-14], y[-14:]
    _, fc = hw_vectorized(train[None, :], 7, 14)
    mae_hw = np.abs(fc[0] - test).mean()
    naive = np.array([train[-7 + (h % 7)] for h in range(14)])
    mae_naive = np.abs(naive - test).mean()
    # trending series: naive misses the drift, HW tracks it
    assert mae_hw < mae_naive
    assert mae_hw < 1.0  # noise-level accuracy


def test_flat_series_forecasts_flat():
    y = np.full(60, 42.0)
    fitted, fc = hw_vectorized(y[None, :], 7, 14)
    np.testing.assert_allclose(fitted, 42.0, atol=1e-9)
    np.testing.assert_allclose(fc, 42.0, atol=1e-9)


def test_short_series_raises():
    with pytest.raises(ValueError):
        hw_fit_forecast(np.arange(10.0), 7, 7)


def test_grouped_backtest_and_declared_query(spark):
    # two planted series through the Spark surface
    days = pd.date_range("2024-01-01", periods=120, freq="D")
    rows = []
    for gid, (tr, seed) in enumerate([(0.5, 4), (-0.3, 5)]):
        y = _seasonal_series(t_len=120, trend=tr, seed=seed, noise=0.2)
        rows += [(f"s{gid}", d.date(), float(v)) for d, v in zip(days, y)]
    df = spark.createDataFrame(rows, "sid string, d date, n double")
    out = {
        r["sid"]: r
        for r in hw_backtest_groups(df, ["sid"], "d", "n").collect()
    }
    assert set(out) == {"s0", "s1"}
    for r in out.values():
        assert r["n_train"] == 106 and r["n_test"] == 14
        assert r["hw_beats_naive"]  # trending + seasonal: HW must win

    from trendengine_spark.queries import REGISTRY

    q = (
        REGISTRY["forecast_holt_winters_mae"]
        .fn(spark, "/root/testdata/sf0.001")
        .collect()
    )
    assert q  # events span ~30 days: 23-train/7-test per series
    for r in q:
        assert r["mae_hw"] >= 0 and r["mae_naive"] >= 0
        assert r["n_test"] == 7


def test_backtest_duplicate_days_sum(spark):
    """Duplicate (series, day) rows accumulate instead of last-write-
    wins (ADVICE r8): feeding each day twice at half value must give
    the same backtest as the clean series."""
    import datetime as dt

    y = _seasonal_series()
    d0 = dt.date(2023, 1, 1)
    clean = [("s", d0 + dt.timedelta(days=i), float(v))
             for i, v in enumerate(y)]
    halved = [(s, d, v / 2.0) for s, d, v in clean]
    dup = halved + halved  # two rows per day summing to the original
    schema = "sid string, d date, n double"
    a = hw_backtest_groups(
        spark.createDataFrame(clean, schema), ["sid"], "d", "n"
    ).collect()[0]
    b = hw_backtest_groups(
        spark.createDataFrame(dup, schema), ["sid"], "d", "n"
    ).collect()[0]
    assert a["mae_hw"] == b["mae_hw"]
    assert a["mae_naive"] == b["mae_naive"]
