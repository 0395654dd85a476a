"""FIXTURES.md §2 golden tests for DBEST (U2/U3): injected break
recovery, the sustained-step abrupt rule, generalization contract,
and gap interpolation."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from trendengine_spark.functions.dbest import (
    _has_sustained_step,
    dbest_change_detection,
    dbest_generalization,
    interpolate_gaps,
)


def monthly_series(n=240, break_index=120, step=0.15, amp=0.05, noise=0.01, seed=7):
    """FIXTURES `abrupt_break`: flat 0.45 + seasonal + step at
    break_index, persisting to the end."""
    rng = np.random.RandomState(seed)
    t = np.arange(n)
    y = 0.45 + amp * np.sin(2 * np.pi * t / 12.0) + rng.normal(0, noise, n)
    if break_index is not None:
        y[break_index:] += step
    return y


def test_abrupt_break_detected_near_truth():
    y = monthly_series()
    res = dbest_change_detection(y, seasonality=12, breakpoints_no=3)
    # largest |change| segment boundary should bracket the true break
    start, end = res["start"][0], res["end"][0]
    assert res["segment_no"] >= 2
    assert any(
        abs(b - 120) <= 12 for b in (start - 1, end - 1)
    ), f"no boundary near 120: start={start}, end={end}"


def test_abrupt_classified_type1_gradual_type0():
    y_ab = monthly_series(step=0.3, noise=0.005)
    res_ab = dbest_change_detection(
        y_ab, seasonality=12, first_level_shift=0.1, second_level_shift=0.2, duration=24
    )
    assert 1 in res_ab["change_type"]

    # gradual: slope change, no step — FIXTURES `gradual_break`
    t = np.arange(240)
    y_gr = 0.45 + np.where(t > 120, (t - 120) * 0.01 / 12.0, 0.0) + 0.05 * np.sin(
        2 * np.pi * t / 12.0
    )
    res_gr = dbest_change_detection(
        y_gr, seasonality=12, first_level_shift=0.1, second_level_shift=0.2, duration=24
    )
    assert all(ct == 0 for ct in res_gr["change_type"])


def test_single_spike_is_not_abrupt():
    """ADVICE r1: one noisy month must not mark a segment abrupt —
    the step has to be *sustained* over `duration`."""
    y = np.full(100, 0.5)
    y[50] = 1.0  # isolated spike: big up-step then big down-step
    assert not _has_sustained_step(
        y, 0, 99, first_level_shift=0.1, second_level_shift=0.2, duration=24
    )
    # a genuine sustained step IS abrupt
    y2 = np.concatenate([np.full(50, 0.5), np.full(50, 1.0)])
    assert _has_sustained_step(
        y2, 0, 99, first_level_shift=0.1, second_level_shift=0.2, duration=24
    )


def test_breakpoint_no_capped_and_significance_coded():
    y = monthly_series()
    res = dbest_change_detection(y, seasonality=12, breakpoints_no=2, alpha=0.05)
    assert res["breakpoint_no"] <= 2
    assert set(res["significance"]) <= {0, 1}
    assert all(0.0 <= p <= 1.0 for p in res["p_value"])


def test_generalization_contract():
    """U3 consumed contract per reference dbest.py:385-395."""
    y = monthly_series(step=0.2)
    res = dbest_generalization(y, seasonality=12)
    assert set(res) == {"segment_no", "rmse", "mad", "fit", "data", "f_local"}
    assert res["segment_no"] >= 1
    assert res["rmse"] >= 0 and res["mad"] >= res["rmse"] * 0  # both finite
    assert len(res["fit"]) == y.size == len(res["f_local"])


def test_interpolate_gaps_recovers_break_with_missing_month():
    """VERDICT r1 'done' criterion: a fixture with a deleted month
    still recovers the injected break (densify + interpolate keeps
    the seasonal phase aligned)."""
    y = monthly_series(step=0.25, noise=0.005)
    y_gap = y.copy()
    y_gap[60] = np.nan  # a missing month before the break
    y_filled = interpolate_gaps(y_gap)
    assert not np.isnan(y_filled).any()
    res = dbest_change_detection(y_filled, seasonality=12)
    start, end = res["start"][0], res["end"][0]
    assert any(abs(b - 120) <= 12 for b in (start - 1, end - 1))


def test_stl_golden_sinusoid():
    """VERDICT r2 item 5 'done' criterion: STL components on the
    FIXTURES sinusoid (A·sin(2π·month/12) over a linear trend,
    noiseless) against pinned expectations. LOESS degree-1 smoothing
    is exact on lines, so away from the boundary rows STL must
    recover the generating trend and seasonal to machine precision —
    a far sharper pin than any tolerance band."""
    from trendengine_spark.functions.stattools import stl_decompose

    t = np.arange(240)
    true_trend = 0.45 + 0.002 * t
    true_seas = 0.05 * np.sin(2 * np.pi * t / 12.0)
    trend, seasonal, remainder = stl_decompose(true_trend + true_seas, 12)
    mid = slice(24, -24)  # two periods in from each boundary
    assert np.allclose(trend[mid], true_trend[mid], atol=1e-12)
    assert np.allclose(seasonal[mid], true_seas[mid], atol=1e-12)
    assert np.max(np.abs(remainder[mid])) < 1e-12
    # pinned spot values (regression guard for the smoother internals)
    assert abs(trend[120] - 0.69) < 1e-12
    assert abs(seasonal[63] - 0.05) < 1e-12
    # exact additive reconstruction everywhere, boundaries included
    y = true_trend + true_seas
    assert np.allclose(trend + seasonal + remainder, y, atol=1e-9)


def test_stl_robustness_downweights_outlier():
    """The bisquare outer pass must keep one corrupted month from
    dragging the trend: compare trend error at the spike with and
    without robustness iterations."""
    from trendengine_spark.functions.stattools import stl_decompose

    t = np.arange(240)
    y = 0.45 + 0.05 * np.sin(2 * np.pi * t / 12.0)
    y_spiked = y.copy()
    y_spiked[100] += 5.0
    tr_rob, _, _ = stl_decompose(y_spiked, 12, outer_iter=2)
    tr_naive, _, _ = stl_decompose(y_spiked, 12, outer_iter=0)
    err_rob = abs(tr_rob[100] - 0.45)
    err_naive = abs(tr_naive[100] - 0.45)
    assert err_rob < err_naive * 0.5


def test_decomposition_components_reconstruct():
    y = monthly_series()
    res = dbest_change_detection(y, seasonality=12)
    recon = (
        np.asarray(res["trend"]) + np.asarray(res["seasonal"]) + np.asarray(res["remainder"])
    )
    assert np.allclose(recon, np.asarray(res["data"]), atol=1e-9)


def test_u5_relational_twin_matches_classical_decompose(spark):
    """u5_decomposition_relational (oracle-checked) must reproduce
    classical_decompose's interior trend exactly and satisfy the
    additive identity; its per-phase seasonal, re-normalized to zero
    mean, must track the production seasonal on the interior (the UDF
    computes phase means over ALL points incl. the extrapolated ends,
    so only the normalized interior structure is comparable)."""
    import duckdb
    import numpy as np

    from trendengine_spark.functions.stattools import classical_decompose
    from trendengine_spark.queries.base import REGISTRY

    sf = "/root/testdata/sf0.001"
    rows = REGISTRY["u5_decomposition_relational"].fn(spark, sf).collect()
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    con = duckdb.connect()
    series = dict(
        con.sql(
            f"""SELECT event_type, list(y ORDER BY d) FROM (
                  SELECT event_type, CAST(ts AS DATE) d, count(*) y
                  FROM '{sf}/events.parquet' GROUP BY 1, 2) GROUP BY 1"""
        ).fetchall()
    )
    assert set(by_type) == set(series)
    for etype, rs in by_type.items():
        rs.sort(key=lambda r: r["i"])
        y = np.asarray(series[etype], dtype=np.float64)
        n = len(y)
        trend_ref, seas_ref, _ = classical_decompose(y, 7)
        assert [r["i"] for r in rs] == list(range(3, n - 3))
        for r in rs:
            assert r["y"] == y[r["i"]]
            # additive identity (up to reassociation ulps)
            assert (
                abs(r["trend"] + r["seasonal"] + r["remainder"] - r["y"])
                < 1e-9
            )
            # interior MA trend equals the production kernel trend
            assert abs(r["trend"] - trend_ref[r["i"]]) < 1e-9
        # exact check of the interior-only spec: phase means of the
        # interior detrended series (numpy float reference)
        ii = np.arange(3, n - 3)
        detr = y[ii] - trend_ref[ii]
        phase = ii % 7
        want_seas = np.array(
            [detr[phase == p].mean() for p in range(7)]
        )[phase]
        got_seas = np.array([r["seasonal"] for r in rs])
        assert np.abs(got_seas - want_seas).max() < 1e-9
        # structural agreement with the production all-points seasonal:
        # 4 of ~30 points differ (extrapolated ends) and sf0.001 daily
        # counts are ~6±2, so on this noise floor only positive shape
        # agreement is meaningful — the exact gate is the spec check
        # above plus the DuckDB hash in CORRECTNESS
        ref_seas = seas_ref[3 : n - 3] - seas_ref[3 : n - 3].mean()
        assert (
            np.corrcoef(got_seas - got_seas.mean(), ref_seas)[0, 1] > 0.3
        )


def test_dbest_non_cyclical_detects_planted_step():
    """The reference's non-cyclical path is broken (unbound `df`
    NameError at /root/reference/TrendEngine/calculations/
    dbest.py:94-95,148-149 — SURVEY §4.4.6); the engine implements it
    properly: no seasonal adjustment, change detection directly on
    the series. A planted level shift on a trend-free noisy series
    must be found with seasonal/remainder exactly zero."""
    import numpy as np

    from trendengine_spark.functions.dbest import dbest_change_detection

    rng = np.random.default_rng(5)
    n = 120
    y = 0.4 + rng.normal(0, 0.004, n)
    y[60:] += 0.25  # sustained step at index 60
    r = dbest_change_detection(
        y, data_type="non-cyclical", breakpoints_no=3, duration=24
    )
    assert r["seasonal"] == [0.0] * n
    assert r["remainder"] == [0.0] * n
    assert r["trend"] == y.tolist()  # series passes through untouched
    # the largest change's segment boundary lands at the step (1-based
    # starts/ends; the break should be within a couple of samples)
    top_start, top_end = r["start"][0], r["end"][0]
    assert any(abs(b - 61) <= 3 for b in (top_start, top_end)), r
    assert abs(r["change"][0]) > 0.2
    assert r["change_type"][0] == 1  # sustained level shift
    # same series through the CYCLICAL path: the decomposition MA
    # smears the step into a ramp split across segments, so assert
    # the TOTAL reported change, not the single largest segment's
    rc = dbest_change_detection(y, data_type="cyclical", duration=24)
    assert sum(abs(c) for c in rc["change"]) > 0.2


def _numpy_u2(y):
    """Reference rows for the u2_dbest_relational knob set: scale-free
    shifts (5%/10% of range), duration 5, breakpoints_no 3, default
    distance threshold, non-cyclical."""
    y = np.asarray(y, dtype=np.float64)
    rng = float(y.max() - y.min())
    r = dbest_change_detection(
        y,
        data_type="non-cyclical",
        breakpoints_no=3,
        first_level_shift=0.05 * rng,
        second_level_shift=0.1 * rng,
        duration=5,
    )
    rows = [
        (
            r["start"][i], r["duration"][i], r["end"][i],
            r["change"][i], r["change_type"][i], r["significance"][i],
        )
        for i in range(len(r["start"]))
    ]
    return r["breakpoint_no"], r["segment_no"], rows


def _spark_u2(spark, series):
    """Run the relational twin over planted integer series (dict
    name -> list[int]) through the same entry the registry query
    uses, returning rows per series name."""
    from trendengine_spark.queries.analytics import u2_relational_changes

    data = [
        (name, x, int(v))
        for name, ys in series.items()
        for x, v in enumerate(ys)
    ]
    pts = spark.createDataFrame(
        data, "event_type string, x bigint, y bigint"
    )
    out = {}
    for row in u2_relational_changes(spark, pts).collect():
        out.setdefault(row["event_type"], []).append(row)
    return out


def _assert_u2_parity(got_rows, bp_no, seg_no, want_rows, name=""):
    """Tie-tolerant parity: numpy's lstsq gives exactly-flat segments
    ulp-noise changes (~1e-14) where the SQL's exact-integer slope is
    exactly 0.0, so rows whose |change| TIES another reported row may
    permute in rank (and across the top-k cut). Per rank the |change|
    magnitudes must agree; position fields and codes are compared
    exactly only for ranks whose magnitude is unambiguous (separated
    from every other reported magnitude by more than the tolerance)."""
    assert got_rows, f"{name}: no rows"
    assert got_rows[0]["breakpoint_no"] == bp_no, name
    assert got_rows[0]["segment_no"] == seg_no, name
    got = sorted(got_rows, key=lambda r: r["chg_rank"])
    assert len(got) == len(want_rows), (name, got, want_rows)
    tol = 1e-6
    wmag = [abs(w[3]) for w in want_rows]
    for i, (g, w) in enumerate(zip(got, want_rows)):
        scale = max(1.0, wmag[i])
        assert abs(abs(g["change"]) - wmag[i]) <= tol * scale, (name, i, g, w)
        ambiguous = any(
            abs(wmag[i] - wmag[j]) <= tol * scale
            for j in range(len(wmag))
            if j != i
        )
        if not ambiguous:
            assert (
                g["seg_start"], g["seg_duration"], g["seg_end"],
            ) == w[:3], (name, i, g, w)
            assert (g["change_type"], g["significance"]) == w[4:], (
                name, i, g, w,
            )
            assert abs(g["change"] - w[3]) <= tol * scale, (name, i, g, w)


def test_u2_relational_matches_numpy_planted_branches(spark):
    """Every exit of the relational U2 twin against the numpy kernel
    on planted integer series (the oracle hash at three scales covers
    Spark vs DuckDB; this pins both against functions/dbest.py):

    - perfect_line: zero deviations -> no split; exact RSS = 0 with
      slope != 0 -> the perfect-fit significance exit (sig 1).
    - constant: zero range -> threshold floor 1e-12, no split; N = 0
      and RSS = 0 -> sig 0; degenerate fls = sls = 0 makes every
      zero-jump 'sustained' (numpy >= semantics) -> ctype 1 on both.
    - step: sustained level shift -> boundary lands AT the step, the
      m = 2 bridge segment takes the dof <= 0 exit (sig 0) and is the
      only abrupt (ctype 1) segment; |change| ties rank the two flat
      segments by start.
    - trend_noisy: in-window wiggle below threshold -> single segment
      through the t^2 > t_crit^2 branch (sig 1, ctype 0).
    - alternating: range 1 -> threshold floor keeps EVERY interior
      deviation above it -> full split cascade, candidate cap 6,
      deep-level exercise of the lockstep loop.
    """
    series = {
        "perfect_line": [3 * x + 7 for x in range(30)],
        "constant": [42] * 30,
        "step": [100] * 15 + [200] * 15,
        "trend_noisy": [10 * x + (x % 3) for x in range(30)],
        "alternating": [100 + (x % 2) for x in range(30)],
    }
    got = _spark_u2(spark, series)
    assert set(got) == set(series)
    for name, ys in series.items():
        bp_no, seg_no, want = _numpy_u2(ys)
        _assert_u2_parity(got[name], bp_no, seg_no, want, name)
    # spot-pin the branch facts the docstring claims
    pl = got["perfect_line"][0]
    assert (pl["segment_no"], pl["significance"], pl["change_type"]) == (1, 1, 0)
    ct = got["constant"][0]
    assert (ct["significance"], ct["change_type"]) == (0, 1)
    st = {r["seg_duration"]: r for r in got["step"]}
    assert st[2]["change_type"] == 1 and st[2]["significance"] == 0
    assert abs(st[2]["change"] - 100.0) < 1e-9
    tn = got["trend_noisy"][0]
    assert (tn["segment_no"], tn["significance"], tn["change_type"]) == (1, 1, 0)
    assert got["alternating"][0]["breakpoint_no"] == 3


def test_u3_relational_matches_numpy(spark):
    """The U3 generalization twin (r12 conversion) vs the numpy
    kernel on planted + real series: segment counts exact, rmse
    within the 2^-20 quantization + line-fit ulp band, mad within
    fit ulps. Covers the zero-split exit (perfect line: one segment,
    rmse = mad = 0) and the deep-split exit (alternating series)."""
    from trendengine_spark.functions.dbest import dbest_generalization
    from trendengine_spark.queries.analytics import (
        u3_relational_generalize,
    )
    from trendengine_spark.queries.base import REGISTRY

    series = {
        "perfect_line": [3 * x + 7 for x in range(30)],
        "step": [100] * 15 + [200] * 15,
        "alternating": [100 + (x % 2) for x in range(30)],
        "trend_noisy": [10 * x + (x % 3) for x in range(30)],
    }
    data = [
        (name, x, int(v))
        for name, ys in series.items()
        for x, v in enumerate(ys)
    ]
    pts = spark.createDataFrame(
        data, "event_type string, x bigint, y bigint"
    )
    got = {
        r["event_type"]: r
        for r in u3_relational_generalize(spark, pts).collect()
    }
    # real-data leg through the registry query itself
    rows = REGISTRY["u3_generalize_events"].fn(spark, SF_SMOKE).collect()
    real_pts = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .groupBy("event_type", F.expr("CAST(ts AS DATE)").alias("d"))
        .count()
        .collect()
    )
    real = {}
    for r in sorted(real_pts, key=lambda r: (r["event_type"], r["d"])):
        real.setdefault(r["event_type"], []).append(r["count"])
    for r in rows:
        got[r["event_type"]] = r
        series[r["event_type"]] = real[r["event_type"]][:30]

    for name, ys in series.items():
        w = dbest_generalization(
            np.asarray(ys, dtype=np.float64), data_type="non-cyclical"
        )
        g = got[name]
        assert g["segment_no"] == w["segment_no"], name
        assert abs(g["rmse"] - w["rmse"]) <= 1e-4 + 1e-4 * w["rmse"], (
            name, g["rmse"], w["rmse"],
        )
        assert abs(g["mad"] - w["mad"]) <= 1e-6 + 1e-6 * w["mad"], (
            name, g["mad"], w["mad"],
        )
    assert got["perfect_line"]["segment_no"] == 1
    assert got["perfect_line"]["rmse"] == 0.0
    assert got["perfect_line"]["mad"] == 0.0


def test_u2_relational_matches_numpy_real_series(spark):
    """The registry query itself (daily event counts at sf0.001) vs
    the numpy kernel, per event_type — the end-to-end parity the
    VERDICT r11 task asked for ('covering every exit' is the planted
    test above; this is the real-data leg)."""
    from trendengine_spark.queries.base import REGISTRY

    rows = REGISTRY["u2_dbest_relational"].fn(spark, SF_SMOKE).collect()
    got = {}
    for r in rows:
        got.setdefault(r["event_type"], []).append(r)
    pts = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .groupBy("event_type", F.expr("CAST(ts AS DATE)").alias("d"))
        .count()
        .collect()
    )
    series = {}
    for r in sorted(pts, key=lambda r: (r["event_type"], r["d"])):
        series.setdefault(r["event_type"], []).append(r["count"])
    assert set(got) == set(series)
    for name, ys in series.items():
        bp_no, seg_no, want = _numpy_u2(ys[:30])
        _assert_u2_parity(got[name], bp_no, seg_no, want, name)


def test_dbest_non_cyclical_generalization():
    import numpy as np

    from trendengine_spark.functions.dbest import dbest_generalization

    n = 100
    xs = np.arange(n, dtype=float)
    # piecewise-linear: up then down — 2 segments, tiny noise
    y = np.where(xs < 50, 0.2 + 0.01 * xs, 0.7 - 0.008 * (xs - 50))
    r = dbest_generalization(
        y, data_type="non-cyclical", distance_threshold=0.05
    )
    assert 2 <= r["segment_no"] <= 3
    assert r["rmse"] < 0.02
    assert r["f_local"] == y.tolist()
