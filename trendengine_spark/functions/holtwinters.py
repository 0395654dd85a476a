"""Additive Holt–Winters (triple exponential smoothing) — the classic
seasonal forecaster, re-derived from the textbook recursions
(Hyndman & Athanasopoulos, *Forecasting: Principles and Practice*,
§7.3 additive method; public method, own implementation).

Reference-domain extension: the reference's flows end at trend
classification/segmentation (PolyTrend / DBEST,
``/root/reference/TrendEngine/calculations/polytrend.py``); a trend
engine users can switch to also needs the forward half — forecasting
the series those flows analyze. This pairs with the registry's
seasonal-naive baseline (``forecast_seasonal_naive_mae``), which is
the yardstick any smoothing model must beat.

Recursions (period m, parameters α, β, γ ∈ (0,1)):

    ℓ_t = α (y_t − s_{t−m}) + (1−α)(ℓ_{t−1} + b_{t−1})
    b_t = β (ℓ_t − ℓ_{t−1}) + (1−β) b_{t−1}
    s_t = γ (y_t − ℓ_t)     + (1−γ) s_{t−m}
    ŷ_{t+h} = ℓ_t + h·b_t + s_{t+h−m⌈h/m⌉}

Initialization is the standard first-two-seasons scheme: ℓ₀ = mean of
season 1, b₀ = (mean of season 2 − mean of season 1)/m, s₀ = season-1
deviations from ℓ₀.

Execution shape: the recursion is sequential in TIME but embarrassingly
parallel across SERIES — :func:`hw_vectorized` runs the time loop once
over an (S, T) matrix with numpy row-vector ops (the DBEST/LOESS
vectorization playbook), so per-step cost is a handful of BLAS-level
axpy's regardless of series count. The Spark surface groups by series
and processes each Arrow batch as one matrix.
"""

from __future__ import annotations

import numpy as np

__all__ = ["hw_fit_forecast", "hw_vectorized", "hw_backtest_groups"]


def hw_fit_forecast(
    y: np.ndarray,
    m: int,
    horizon: int,
    alpha: float = 0.3,
    beta: float = 0.1,
    gamma: float = 0.2,
) -> tuple[np.ndarray, np.ndarray]:
    """Scalar reference implementation (one series): returns
    (fitted one-step-ahead predictions aligned to y[m:], forecasts of
    length ``horizon``). Requires len(y) ≥ 2m."""
    y = np.asarray(y, dtype=np.float64)
    t_len = len(y)
    if t_len < 2 * m:
        raise ValueError(f"need >= {2 * m} points, got {t_len}")
    level = y[:m].mean()
    trend = (y[m : 2 * m].mean() - y[:m].mean()) / m
    season = y[:m] - level
    s = list(season)
    fitted = []
    for t in range(m, t_len):
        pred = level + trend + s[t - m]
        fitted.append(pred)
        prev_level = level
        level = alpha * (y[t] - s[t - m]) + (1 - alpha) * (level + trend)
        trend = beta * (level - prev_level) + (1 - beta) * trend
        s.append(gamma * (y[t] - level) + (1 - gamma) * s[t - m])
    fc = np.array(
        [
            level + (h + 1) * trend + s[t_len - m + ((h) % m)]
            for h in range(horizon)
        ]
    )
    return np.asarray(fitted), fc


def hw_vectorized(
    ym: np.ndarray,
    m: int,
    horizon: int,
    alpha: float = 0.3,
    beta: float = 0.1,
    gamma: float = 0.2,
) -> tuple[np.ndarray, np.ndarray]:
    """All-series-at-once rendering: ``ym`` is (S, T); the time loop
    runs T−m steps of vectorized row ops. Returns (fitted (S, T−m),
    forecasts (S, horizon)) — bit-compatible with the scalar
    reference (same operation order per step, asserted in tests)."""
    ym = np.asarray(ym, dtype=np.float64)
    n_s, t_len = ym.shape
    if t_len < 2 * m:
        raise ValueError(f"need >= {2 * m} points, got {t_len}")
    level = ym[:, :m].mean(axis=1)
    trend = (ym[:, m : 2 * m].mean(axis=1) - ym[:, :m].mean(axis=1)) / m
    seasons = np.empty((n_s, t_len + 1), dtype=np.float64)  # ring of s_t
    seasons[:, :m] = ym[:, :m] - level[:, None]
    fitted = np.empty((n_s, t_len - m), dtype=np.float64)
    for t in range(m, t_len):
        s_lag = seasons[:, t - m]
        fitted[:, t - m] = level + trend + s_lag
        prev_level = level
        level = alpha * (ym[:, t] - s_lag) + (1 - alpha) * (level + trend)
        trend = beta * (level - prev_level) + (1 - beta) * trend
        seasons[:, t] = gamma * (ym[:, t] - level) + (1 - gamma) * s_lag
    fc = np.empty((n_s, horizon), dtype=np.float64)
    for h in range(horizon):
        fc[:, h] = level + (h + 1) * trend + seasons[:, t_len - m + (h % m)]
    return fitted, fc


def hw_backtest_groups(
    df,
    series_cols: list[str],
    time_col: str,
    value_col: str,
    m: int = 7,
    horizon: int = 14,
    alpha: float = 0.3,
    beta: float = 0.1,
    gamma: float = 0.2,
):
    """Per-series Holt–Winters backtest as a grouped Arrow pass:
    for each series, fill the calendar (a missing day is 0 events),
    hold out the last ``horizon`` days, fit on the rest, and score
    the h-step forecasts against the holdout — alongside the
    multi-step seasonal-naive forecast (repeat the last observed
    season) as the baseline. Series shorter than 2m + horizon are
    skipped (the guard every per-series operator here applies).

    One shuffle keyed by the series, bounded state per group; the
    recursion cost is O(T) vector ops per Arrow batch regardless of
    how many series it carries.
    """
    import pandas as pd
    from pyspark.sql import types as T

    out_fields = [df.schema[c] for c in series_cols] + [
        T.StructField("n_train", T.IntegerType()),
        T.StructField("n_test", T.IntegerType()),
        T.StructField("mae_hw", T.DoubleType()),
        T.StructField("mae_naive", T.DoubleType()),
        T.StructField("hw_beats_naive", T.BooleanType()),
    ]
    schema = T.StructType(out_fields)

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(time_col)
        idx = pd.date_range(
            pdf[time_col].min(), pdf[time_col].max(), freq="D"
        )
        y = (
            pdf.set_index(pd.to_datetime(pdf[time_col]))[value_col]
            .reindex(idx, fill_value=0)
            .to_numpy(dtype=np.float64)
        )
        if len(y) < 2 * m + horizon:
            return pd.DataFrame(columns=[f.name for f in out_fields])
        train, test = y[:-horizon], y[-horizon:]
        _, fc = hw_vectorized(
            train[None, :], m, horizon, alpha, beta, gamma
        )
        naive = np.array(
            [train[len(train) - m + (h % m)] for h in range(horizon)]
        )
        mae_hw = float(np.abs(fc[0] - test).mean())
        mae_naive = float(np.abs(naive - test).mean())
        row = {c: pdf[c].iloc[0] for c in series_cols}
        row.update(
            n_train=len(train), n_test=len(test),
            mae_hw=round(mae_hw, 6), mae_naive=round(mae_naive, 6),
            hw_beats_naive=bool(mae_hw < mae_naive),
        )
        return pd.DataFrame([row])

    return df.groupBy(*series_cols).applyInPandas(fit, schema)
