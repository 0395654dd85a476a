"""FIXTURES.md §2 golden tests for the PolyTrend classifier (U1) +
§5.2.3 property invariants."""

from __future__ import annotations

import numpy as np
import pytest

from tests.conftest import RECIPES, make_series
from trendengine_spark.functions.polytrend import polytrend_classify


@pytest.mark.parametrize("name", sorted(RECIPES))
def test_recipe_classification(name):
    """Each FIXTURES recipe classifies to its constructed-in truth in
    the vast majority of noise draws (recipes calibrated per
    FIXTURES.md §2 monte-carlo notes)."""
    f, expected = RECIPES[name]
    hits = 0
    trials = 30
    for seed in range(trials):
        y = make_series(f, seed=seed)
        r = polytrend_classify(y, alpha=0.05)
        hits += int(r["trend_type"] == expected)
    assert hits >= int(0.8 * trials), f"{name}: {hits}/{trials} correct"


def test_direction_equals_sign_of_slope():
    for seed in range(10):
        for f, _ in RECIPES.values():
            y = make_series(f, seed=seed)
            r = polytrend_classify(y)
            assert r["direction"] == (1 if r["slope"] >= 0 else -1)


def test_time_translation_invariance():
    """Classification depends only on the series values, not the
    epoch of the x axis (x is always 0..n-1 in-classifier)."""
    f, expected = RECIPES["quadratic"]
    y = make_series(f, seed=3)
    r1 = polytrend_classify(y)
    r2 = polytrend_classify(y.copy())
    assert r1 == r2


def test_noiseless_recipes_classify_exactly():
    for name, (f, expected) in RECIPES.items():
        y = f(np.arange(20.0))
        if name == "no_trend":
            # perfectly constant series has zero variance; slope p=1
            r = polytrend_classify(y)
            assert r["trend_type"] == 0
            continue
        r = polytrend_classify(y)
        assert r["trend_type"] == expected, (name, r)


def test_short_series_is_no_trend():
    r = polytrend_classify(np.array([1.0, 2.0, 3.0]))
    assert r["trend_type"] == 0 and r["degree"] == 0


def test_slope_recovers_generating_coefficient():
    f, _ = RECIPES["linear_up"]
    slopes = [polytrend_classify(make_series(f, seed=s))["slope"] for s in range(20)]
    assert abs(float(np.mean(slopes)) - 0.008) < 0.002


def test_polyfit_relational_twin_matches_ols_poly(spark):
    """trend_polyfit_coeffs (exact-integer Cramer, oracle-checked)
    must agree with stattools.ols_poly — the production U1/U4 numpy
    fitting path — to float precision on the same daily series: the
    oracle hash therefore transitively checks the UDF math (VERDICT
    r7 task 2)."""
    import duckdb
    import numpy as np

    from trendengine_spark.functions.stattools import ols_poly
    from trendengine_spark.queries.base import REGISTRY

    sf = "/root/testdata/sf0.001"
    got = {
        r["event_type"]: r
        for r in REGISTRY["trend_polyfit_coeffs"].fn(spark, sf).collect()
    }
    con = duckdb.connect()
    series = con.sql(
        f"""SELECT event_type, list(y ORDER BY d) FROM (
              SELECT event_type, CAST(ts AS DATE) d, count(*) y
              FROM '{sf}/events.parquet' GROUP BY 1, 2) GROUP BY 1"""
    ).fetchall()
    assert len(series) == len(got) > 0
    for etype, ys in series:
        y = np.asarray(ys, dtype=np.float64)
        c2, *_ = ols_poly(y, 2)
        c1, *_ = ols_poly(y, 1)
        r = got[etype]
        assert abs(r["b0"] - c2[0]) < 1e-8 * max(1, abs(c2[0]))
        assert abs(r["b1"] - c2[1]) < 1e-8 * max(1, abs(c2[1]))
        assert abs(r["b2"] - c2[2]) < 1e-8 * max(1, abs(c2[2]))
        assert abs(r["slope_lin"] - c1[1]) < 1e-8 * max(1, abs(c1[1]))
        assert abs(r["intercept_lin"] - c1[0]) < 1e-8 * max(1, abs(c1[0]))
        assert r["n"] == len(y)


def _planted_event_rows():
    """Synthetic 30-day event tables whose daily-count series exercise
    EVERY branch of the classification cascade (the driver's events
    data is trendless, so its oracle rows only ever take the no-trend
    exit): linear, quadratic, concealed-quadratic (symmetric vertex,
    insignificant net slope), cubic, concealed-cubic, flat-noise and
    exactly-constant (degenerate). Counts are deterministic integers
    (jitter = modular residues, no RNG)."""
    import datetime as dt

    def series(name):
        x = np.arange(30, dtype=np.float64)
        if name == "linear":
            return 10 + 3 * x + (x.astype(int) * 7) % 5
        if name == "quad":
            return (x - 5) ** 2 + (x.astype(int) * 13) % 7 + 1
        if name == "quad_concealed":
            return (x - 14.5) ** 2 + (x.astype(int) * 11) % 5 + 1
        if name == "cubic":
            return np.maximum(
                np.round((x - 5) * (x - 15) * (x - 25) / 10.0 + 12 * x + 200),
                1,
            )
        if name == "cubic_concealed":
            return np.maximum(
                np.round((x - 5) * (x - 15) * (x - 25) / 8.0 + 300
                         + (x.astype(int) * 3) % 4),
                1,
            )
        if name == "flat":
            return 50 + (x.astype(int) * 13) % 7
        if name == "constant":
            return np.full(30, 7.0)
        raise KeyError(name)

    rows, wanted = [], {}
    base = dt.datetime(2024, 1, 1)
    for name in ("linear", "quad", "quad_concealed", "cubic",
                 "cubic_concealed", "flat", "constant"):
        y = series(name).astype(int)
        wanted[name] = y
        for day, cnt in enumerate(y):
            assert cnt >= 1
            for k in range(int(cnt)):
                rows.append(
                    (name, base + dt.timedelta(days=day, seconds=k))
                )
    return rows, wanted


def test_u1_relational_cascade_matches_numpy_and_duckdb(spark):
    """u1_polytrend_relational's cascade must agree with
    polytrend_classify AND with the DuckDB rendering of the same SQL
    on planted series covering every branch (the driver's own events
    data only exercises the no-trend exit). Pins (a) semantic parity
    of the critical-value re-anchoring with the betainc p-value path
    and (b) cross-engine hash identity on the branchy paths."""
    import duckdb
    import pandas as pd

    from trendengine_spark.queries.analytics import (
        _U1_SQL_DUCK,
        _U1_SQL_SPARK,
    )

    rows, wanted = _planted_event_rows()
    pdf = pd.DataFrame(rows, columns=["event_type", "ts"])

    spark.createDataFrame(pdf).createOrReplaceTempView("events")
    try:
        got_spark = {
            r["event_type"]: r for r in spark.sql(_U1_SQL_SPARK).collect()
        }
    finally:
        spark.catalog.dropTempView("events")

    con = duckdb.connect()
    con.register("events", pdf)
    got_duck = {
        r[0]: dict(zip([d[0] for d in con.description], r))
        for r in con.execute(_U1_SQL_DUCK).fetchall()
    }

    seen_types = set()
    for name, y in wanted.items():
        ref = polytrend_classify(y.astype(np.float64), alpha=0.05)
        s = got_spark[name]
        assert (
            s["trend_type"], s["degree"], s["significance"], s["direction"]
        ) == (
            ref["trend_type"], ref["degree"],
            ref["significance"], ref["direction"],
        ), (name, dict(s.asDict()), ref)
        assert abs(s["slope"] - ref["slope"]) < 1e-8 * max(1, abs(ref["slope"]))
        d = got_duck[name]
        for c in ("n", "trend_type", "slope", "direction",
                  "significance", "degree"):
            assert d[c] == s[c], (name, c, d[c], s[c])
        seen_types.add(ref["trend_type"])
    # the planted set must actually cover the cascade's exits
    assert {3, 2, 1, 0, -1} <= seen_types, seen_types


def test_tcrit_table_inverts_betainc_pvalue():
    """TCRIT_975[df-1] is the exact α=0.05 boundary of the engine's
    own t_pvalue_two_sided: p is > α just below and < α just above."""
    from trendengine_spark.functions.stattools import (
        TCRIT_975,
        t_pvalue_two_sided,
    )

    for df in (1, 2, 5, 10, 28, 60, 120):
        tc = TCRIT_975[df - 1]
        assert t_pvalue_two_sided(tc * (1 - 1e-9), df) > 0.05
        assert t_pvalue_two_sided(tc * (1 + 1e-9), df) < 0.05
    # published-table spot checks (4 printed digits)
    assert round(TCRIT_975[0], 3) == 12.706
    assert round(TCRIT_975[9], 3) == 2.228
    assert round(TCRIT_975[27], 4) == 2.0484
