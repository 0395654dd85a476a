"""Pure-numpy statistical primitives.

scipy/statsmodels are not available in the runtime, so the few
classical routines the fitting algorithms need are implemented here
from their textbook definitions (regularized incomplete beta via
Lentz's continued-fraction method; OLS inference from the normal
equations; classical moving-average seasonal decomposition).
"""

from __future__ import annotations

import numpy as np


def _betacf(a: float, b: float, x: float, max_iter: int = 200, eps: float = 3e-12) -> float:
    """Continued fraction for the incomplete beta function (Lentz)."""
    tiny = 1e-300
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < tiny:
        d = tiny
    d = 1.0 / d
    h = d
    for m in range(1, max_iter + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < tiny:
            d = tiny
        c = 1.0 + aa / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < tiny:
            d = tiny
        c = 1.0 + aa / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < eps:
            break
    return h


def betainc_reg(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b)."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_beta = (
        _gammaln(a + b) - _gammaln(a) - _gammaln(b) + a * np.log(x) + b * np.log1p(-x)
    )
    front = np.exp(ln_beta)
    if x < (a + 1.0) / (a + b + 2.0):
        return front * _betacf(a, b, x) / a
    return 1.0 - front * _betacf(b, a, 1.0 - x) / b


def _gammaln(z: float) -> float:
    """Log-gamma (Lanczos approximation, g=7)."""
    coeffs = (
        0.99999999999980993,
        676.5203681218851,
        -1259.1392167224028,
        771.32342877765313,
        -176.61502916214059,
        12.507343278686905,
        -0.13857109526572012,
        9.9843695780195716e-6,
        1.5056327351493116e-7,
    )
    if z < 0.5:
        # reflection
        return np.log(np.pi / np.sin(np.pi * z)) - _gammaln(1.0 - z)
    z -= 1.0
    x = coeffs[0]
    for i, c in enumerate(coeffs[1:], start=1):
        x += c / (z + i)
    t = z + 7.5
    return 0.5 * np.log(2.0 * np.pi) + (z + 0.5) * np.log(t) - t + np.log(x)


def t_pvalue_two_sided(t_stat: float, dof: float) -> float:
    """Two-sided p-value of a Student-t statistic:
    P(|T| >= |t|) = I_{dof/(dof+t^2)}(dof/2, 1/2)."""
    if not np.isfinite(t_stat):
        return 0.0 if abs(t_stat) == np.inf else 1.0
    if dof <= 0:
        return 1.0
    x = dof / (dof + t_stat * t_stat)
    return float(betainc_reg(dof / 2.0, 0.5, x))


def ols_poly(y: np.ndarray, degree: int, x: np.ndarray | None = None):
    """OLS polynomial fit with coefficient inference.

    Returns (coeffs ascending order, std_errs, t_stats, p_values,
    fitted). p_values[k] is the two-sided t-test p for coefficient of
    x**k with dof = n - (degree+1).
    """
    y = np.asarray(y, dtype=np.float64)
    n = y.size
    if x is None:
        x = np.arange(n, dtype=np.float64)
    p = degree + 1
    X = np.vander(x, p, increasing=True)
    coef, *_ = np.linalg.lstsq(X, y, rcond=None)
    fitted = X @ coef
    resid = y - fitted
    dof = n - p
    if dof <= 0:
        se = np.full(p, np.nan)
        tstat = np.full(p, np.nan)
        pval = np.ones(p)
        return coef, se, tstat, pval, fitted
    s2 = float(resid @ resid) / dof
    xtx_inv = np.linalg.pinv(X.T @ X)
    se = np.sqrt(np.maximum(np.diag(xtx_inv) * s2, 0.0))
    with np.errstate(divide="ignore", invalid="ignore"):
        tstat = np.where(se > 0, coef / se, np.inf * np.sign(coef))
    pval = np.array([t_pvalue_two_sided(t, dof) for t in tstat])
    return coef, se, tstat, pval, fitted


def linear_slope_test(y: np.ndarray, x: np.ndarray | None = None):
    """Degree-1 OLS: returns (slope, intercept, p_value_of_slope)."""
    coef, _, _, pval, _ = ols_poly(y, 1, x)
    return float(coef[1]), float(coef[0]), float(pval[1])


def classical_decompose(y: np.ndarray, period: int):
    """Classical additive seasonal decomposition (moving averages).

    trend: centered moving average of window ``period`` (2x(period)
    MA for even periods); seasonal: per-phase mean of the detrended
    series, normalized to zero mean, tiled; remainder: the rest.
    Ends of the trend are extended by linear extrapolation from the
    valid center so downstream segmentation sees a full-length trend.
    """
    y = np.asarray(y, dtype=np.float64)
    n = y.size
    if period < 2 or n < 2 * period:
        # degenerate: no seasonal structure resolvable
        return y.copy(), np.zeros(n), np.zeros(n)
    if period % 2 == 0:
        kernel = np.ones(period + 1)
        kernel[0] = kernel[-1] = 0.5
        kernel /= period
    else:
        kernel = np.ones(period) / period
    half = kernel.size // 2
    trend_core = np.convolve(y, kernel, mode="valid")  # length n - 2*half
    trend = np.full(n, np.nan)
    trend[half : n - half] = trend_core
    # extend ends linearly from the first/last `period` valid points
    idx = np.arange(n, dtype=np.float64)
    head = slice(half, half + period)
    tail = slice(n - half - period, n - half)
    hs, hi, _ = _quick_line(idx[head], trend[head])
    ts_, ti, _ = _quick_line(idx[tail], trend[tail])
    trend[:half] = hi + hs * idx[:half]
    trend[n - half :] = ti + ts_ * idx[n - half :]
    detrended = y - trend
    seasonal_means = np.array(
        [np.nanmean(detrended[p::period]) for p in range(period)]
    )
    seasonal_means -= seasonal_means.mean()
    seasonal = np.tile(seasonal_means, n // period + 1)[:n]
    remainder = y - trend - seasonal
    return trend, seasonal, remainder


def _quick_line(x: np.ndarray, y: np.ndarray):
    """slope, intercept, mean for a short segment (no inference)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    xm, ym = x.mean(), y.mean()
    denom = ((x - xm) ** 2).sum()
    slope = 0.0 if denom == 0 else float(((x - xm) * (y - ym)).sum() / denom)
    return slope, float(ym - slope * xm), float(ym)
