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


def _loess(
    x: np.ndarray,
    y: np.ndarray,
    q: int,
    rho: np.ndarray | None = None,
    xeval: np.ndarray | None = None,
) -> np.ndarray:
    """Degree-1 LOESS smoother (Cleveland 1979, as used inside STL).

    At each evaluation point: take the ``q`` nearest x-neighbours,
    weight them by the tricube of scaled distance (times the
    robustness weights ``rho`` if given), and evaluate the weighted
    least-squares line there. For ``q > n`` the bandwidth inflates by
    ``q/n`` as in the reference STL implementation.
    """
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n = x.size
    if xeval is None:
        xeval = x
    xeval = np.asarray(xeval, dtype=np.float64)
    r = np.ones(n) if rho is None else np.asarray(rho, dtype=np.float64)
    q_eff = min(q, n)
    # vectorized across evaluation points (r7: the per-point Python
    # loop dominated DBEST at ~85 ms/series — 98% of the fit). All
    # reductions are elementwise-multiply + sum(axis=1), the same
    # pairwise summation over the same operand order as the scalar
    # loop's 1-D sums, so results are bit-identical; memory is the
    # (E, n) weight matrix — E, n ≤ series length, trivial for
    # composited series.
    d = np.abs(x[None, :] - xeval[:, None])  # (E, n)
    lam = np.partition(d, q_eff - 1, axis=1)[:, q_eff - 1]
    if q > n:
        lam = lam + (q - n) / 2.0
    lam = np.where(lam <= 0.0, 1.0, lam)
    w = np.clip(1.0 - (d / lam[:, None]) ** 3, 0.0, None) ** 3 * r[None, :]
    sw = w.sum(axis=1)
    safe_sw = np.where(sw <= 0.0, 1.0, sw)
    xm = (w * x[None, :]).sum(axis=1) / safe_sw
    ym = (w * y[None, :]).sum(axis=1) / safe_sw
    dx = x[None, :] - xm[:, None]
    denom = (w * dx**2).sum(axis=1)
    num = (w * dx * (y[None, :] - ym[:, None])).sum(axis=1)
    slope = np.where(denom <= 0.0, 0.0, num / np.where(denom <= 0.0, 1.0, denom))
    out = ym + slope * (xeval - xm)
    return np.where(sw <= 0.0, y.mean() if n else 0.0, out)


def _ma(a: np.ndarray, m: int) -> np.ndarray:
    """Simple moving average of window m ('valid': len(a) - m + 1)."""
    return np.convolve(a, np.ones(m) / m, mode="valid")


def _next_odd(v: float) -> int:
    k = int(np.ceil(v))
    return k if k % 2 == 1 else k + 1


def stl_decompose(
    y: np.ndarray,
    period: int,
    seasonal_smoother: int = 7,
    inner_iter: int = 2,
    outer_iter: int = 1,
):
    """STL: Seasonal-Trend decomposition using LOESS (Cleveland,
    Cleveland, McRae & Terpenning 1990), additive, pure numpy.

    The reference pipes its series through R's ``stl`` inside DBEST
    (reference ``TrendEngine/calculations/dbest.py:83-92``; components
    consumed at ``dbest.py:326-329``); scipy/statsmodels are absent
    here so the published algorithm is implemented directly:

    inner loop — (1) detrend, (2) LOESS-smooth each cycle-subseries
    (span ``n_s``), extended one period each side, (3) low-pass the
    extended seasonal (MA period ×2, MA 3, LOESS span ``n_l``),
    (4) seasonal = subseries-smooth − low-pass, (5) trend =
    LOESS(deseasonalized, span ``n_t``). outer loop — bisquare
    robustness weights from the remainder, fixed ``outer_iter``
    passes (R's default is 0 extra for ``robust=FALSE``; 1 pass gives
    bounded protection at deterministic cost).

    Returns (trend, seasonal, remainder), each length ``len(y)``.
    """
    y = np.asarray(y, dtype=np.float64)
    n = y.size
    if period < 2 or n < 2 * period:
        return y.copy(), np.zeros(n), np.zeros(n)
    n_s = _next_odd(max(seasonal_smoother, 7))
    n_l = _next_odd(period)
    n_t = _next_odd(1.5 * period / (1.0 - 1.5 / n_s))
    t_idx = np.arange(n, dtype=np.float64)
    trend = np.zeros(n)
    seasonal = np.zeros(n)
    rho = np.ones(n)
    for outer in range(max(outer_iter, 0) + 1):
        for _ in range(inner_iter):
            detrended = y - trend
            # cycle-subseries smoothing, extended one period both ways
            c = np.empty(n + 2 * period)
            for p in range(period):
                sub = detrended[p::period]
                m = sub.size
                pos = np.arange(1.0, m + 1.0)
                sm = _loess(
                    pos,
                    sub,
                    n_s,
                    rho=rho[p::period],
                    xeval=np.arange(0.0, m + 2.0),
                )
                # extended axis is shifted one period right, so phase-p
                # slots are exactly c[p::period] — m + 2 of them, matching
                # sm evaluated at cycle positions 0 .. m+1
                c[p::period] = sm
            # low-pass: MA(period) x2 then MA(3) -> length n, then LOESS
            lp = _ma(_ma(_ma(c, period), period), 3)
            low = _loess(t_idx, lp, n_l)
            seasonal = c[period : period + n] - low
            trend = _loess(t_idx, y - seasonal, n_t, rho=rho)
        if outer < max(outer_iter, 0):
            resid = y - seasonal - trend
            h = 6.0 * np.median(np.abs(resid))
            if h <= 0:
                rho = np.ones(n)
            else:
                u = np.clip(np.abs(resid) / h, 0.0, 1.0)
                rho = (1.0 - u**2) ** 2
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
