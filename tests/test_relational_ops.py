"""Unit tests for the relational helper operators (as-of join, top-k)
against hand-computed expectations."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from trendengine_spark.operators.relational import asof_join, topk_per_group


def test_asof_join_backward(spark):
    left = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [1, 1, 1, 2, 3],
                "t": pd.to_datetime(
                    ["2024-01-01 10:00", "2024-01-01 11:00", "2024-01-01 09:00",
                     "2024-01-01 10:00", "2024-01-01 10:00"]
                ),
            }
        )
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [1, 1, 2],
                "rt": pd.to_datetime(
                    ["2024-01-01 09:30", "2024-01-01 10:30", "2024-01-01 10:00"]
                ),
                "payload": ["a", "b", "c"],
            }
        )
    )
    out = (
        asof_join(left, right, on="k", left_ts="t", right_ts="rt")
        .toPandas()
        .sort_values(["k", "t"])
        .reset_index(drop=True)
    )
    # k=1 @09:00 → no prior; @10:00 → a (09:30); @11:00 → b (10:30)
    assert out.loc[0, "payload"] is None or pd.isna(out.loc[0, "payload"])
    assert out.loc[1, "payload"] == "a"
    assert out.loc[2, "payload"] == "b"
    # k=2 @10:00 → exact-equality match (inclusive)
    assert out.loc[3, "payload"] == "c"
    # k=3 → no right rows at all
    assert pd.isna(out.loc[4, "payload"])


def test_asof_join_inner_drops_unmatched(spark):
    left = spark.createDataFrame(
        pd.DataFrame({"k": [1, 2], "t": pd.to_datetime(["2024-01-02", "2024-01-02"])})
    )
    right = spark.createDataFrame(
        pd.DataFrame({"k": [1], "rt": pd.to_datetime(["2024-01-01"]), "v": [9.0]})
    )
    out = asof_join(left, right, on="k", left_ts="t", right_ts="rt", how="inner")
    assert out.count() == 1


def test_topk_per_group(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"g": ["a"] * 5 + ["b"] * 2, "v": [5, 3, 9, 1, 7, 2, 8]})
    )
    out = (
        topk_per_group(df, ["g"], [F.desc("v")], k=2)
        .toPandas()
        .sort_values(["g", "rn"])
    )
    assert out[out["g"] == "a"]["v"].tolist() == [9, 7]
    assert out[out["g"] == "b"]["v"].tolist() == [8, 2]


def test_asof_join_rejects_payload_collision(spark):
    import pytest

    left = spark.createDataFrame(
        pd.DataFrame({"k": [1], "t": pd.to_datetime(["2024-01-02"]), "v": [1.0]})
    )
    right = spark.createDataFrame(
        pd.DataFrame({"k": [1], "rt": pd.to_datetime(["2024-01-01"]), "v": [9.0]})
    )
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, on="k", left_ts="t", right_ts="rt")


def test_trailing_range_aggs_equals_global_window(spark):
    """Halo-partitioned trailing RANGE aggregates must equal the naive
    single-partition global window on dense/ties/boundary-straddling
    values — including rows exactly lookback before a bucket edge."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from trendengine_spark.operators.relational import trailing_range_aggs

    # values clustered around multiples of the bucket width to force
    # halo traffic, plus ties and gaps
    vals = (
        list(range(0, 30))
        + [60, 61, 61, 63]
        + list(range(120, 135))
        + [127, 127]
        + [191, 250, 251]
        # negative values straddling the -64 bucket edge: Spark's %
        # keeps the dividend sign, so a %-based halo test misses these
        + [-1, -2, -63, -64, -65, -70, -127, -130]
    )
    df = spark.createDataFrame(
        [(i, v, float(v % 11)) for i, v in enumerate(vals)],
        schema="id int, v int, x double",
    )
    got = {
        r["id"]: (r["n"], round(r["s"], 6))
        for r in trailing_range_aggs(
            df,
            "v",
            {"n": F.count(F.lit(1)), "s": F.sum("x")},
            lookback=7,
            bucket_width=64,
        ).collect()
    }
    w = Window.orderBy("v").rangeBetween(-7, 0)
    want = {
        r["id"]: (r["n"], r["s"])
        for r in df.select(
            "id",
            F.count(F.lit(1)).over(w).alias("n"),
            F.round(F.sum("x").over(w), 6).alias("s"),
        ).collect()
    }
    assert got == want


def test_ntile_global_matches_naive_window(spark):
    """Arithmetic global ntile must equal Window.orderBy ntile for
    several n, including non-dividing N and n > N."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from trendengine_spark.operators.relational import ntile_global

    df = spark.createDataFrame(
        [(i, float((i * 37) % 101)) for i in range(97)],
        schema="id int, v double",
    )
    for n in (2, 4, 7, 100):
        got = {
            r["id"]: r["b"]
            for r in ntile_global(
                df, ["v", "id"], n, out_col="b", num_partitions=5
            ).collect()
        }
        w = Window.orderBy("v", "id")
        want = {
            r["id"]: r["b"]
            for r in df.select("id", F.ntile(n).over(w).alias("b")).collect()
        }
        assert got == want, f"n={n}"


def test_asof_join_forward_nearest_tolerance(spark):
    """Forward picks the earliest right row at-or-after; nearest picks
    the closer side (tie -> backward, pandas convention); tolerance
    nulls out-of-horizon matches without dropping left rows."""
    left = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [1, 1, 1, 2],
                "t": pd.to_datetime(
                    ["2024-01-01 10:00", "2024-01-01 11:00",
                     "2024-01-01 09:00", "2024-01-01 10:00"]
                ),
            }
        )
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [1, 1, 1, 2],
                "rt": pd.to_datetime(
                    ["2024-01-01 09:30", "2024-01-01 10:30",
                     "2024-01-01 12:00", "2024-01-01 09:00"]
                ),
                "payload": ["a", "b", "c", "d"],
            }
        )
    )
    from trendengine_spark.operators.relational import asof_join

    fwd = (
        asof_join(left, right, on="k", left_ts="t", right_ts="rt",
                  direction="forward")
        .toPandas().sort_values(["k", "t"]).reset_index(drop=True)
    )
    # k=1: 09:00->a(09:30), 10:00->b(10:30), 11:00->c(12:00); k=2@10:00->none
    assert fwd["payload"].tolist()[:3] == ["a", "b", "c"]
    assert pd.isna(fwd.loc[3, "payload"])

    near = (
        asof_join(left, right, on="k", left_ts="t", right_ts="rt",
                  direction="nearest")
        .toPandas().sort_values(["k", "t"]).reset_index(drop=True)
    )
    # k=1@09:00: only forward a(09:30); @10:00: a(-30m) vs b(+30m) tie->backward a
    # @11:00: b(-30m) vs c(+60m) -> b; k=2@10:00 -> d (backward only)
    assert near["payload"].tolist() == ["a", "a", "b", "d"]

    tol = (
        asof_join(left, right, on="k", left_ts="t", right_ts="rt",
                  direction="backward", tolerance=1800.0)
        .toPandas().sort_values(["k", "t"]).reset_index(drop=True)
    )
    # backward matches: 09:00->none, 10:00->a(30m ok), 11:00->b(30m ok),
    # k=2@10:00->d(60m > 30m tol -> null)
    assert pd.isna(tol.loc[0, "payload"])
    assert tol["payload"].tolist()[1:3] == ["a", "b"]
    assert pd.isna(tol.loc[3, "payload"])


def test_native_recursive_join_class_matches_khop(spark):
    """Dialect parity for the JOIN-DRIVEN recursion class: Spark 4's
    native WITH RECURSIVE over an edge table must agree with the
    iterative khop_frontiers operator (now the plan behind
    recursive_cte_reachability — VERDICT r7 task 4 moved the declared
    query to the loop; this pins the native SQL feature itself)."""
    from pyspark.sql import functions as F

    from trendengine_spark.operators.graph import khop_frontiers

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (2, 1), (1, 6), (6, 7), (7, 1)],
        "a int, b int",
    )
    seeds = spark.createDataFrame([(1,)], "k int")
    edges.createOrReplaceTempView("t_edges")
    native = {
        (r["k"], r["hop"])
        for r in spark.sql(
            """
            WITH RECURSIVE reach(k, hop) AS (
              SELECT 1, 0
              UNION ALL
              SELECT DISTINCT e.b, r.hop + 1
              FROM reach r JOIN t_edges e ON e.a = r.k
              WHERE r.hop < 3
            )
            SELECT k, CAST(min(hop) AS INT) AS hop FROM reach GROUP BY k
            """
        ).collect()
    }
    loop = {
        (r["k"], r["hop"])
        for r in khop_frontiers(edges, seeds, 3).collect()
    } | {(1, 0)}
    assert native == loop
    assert (2, 1) in native and (4, 3) in native and (7, 2) in native


def test_hll_overlap_estimates_track_exact(spark):
    """approx_user_overlap_pairs: inclusion-exclusion on HLL sketches
    must track the exact pairwise intersection within compounded
    sketch error on the driver data, and the union estimate must be
    >= each side's estimate (monotonicity of register-max merge)."""
    import duckdb

    from trendengine_spark.queries.analytics import (
        approx_user_overlap_pairs,
    )

    sf = "/root/testdata/sf0.01"
    got = {
        (r["type_a"], r["type_b"]): r
        for r in approx_user_overlap_pairs(spark, sf).collect()
    }
    con = duckdb.connect()
    exact = {
        (a, b): n
        for a, b, n in con.sql(
            f"""
            WITH u AS (SELECT DISTINCT event_type, user_id
                       FROM '{sf}/events.parquet')
            SELECT a.event_type, b.event_type, count(*)
            FROM u a JOIN u b ON a.user_id = b.user_id
                 AND a.event_type < b.event_type
            GROUP BY 1, 2
            """
        ).fetchall()
    }
    assert set(got) == set(exact)
    for k, r in got.items():
        assert r["est_union"] >= max(r["est_a"], r["est_b"])
        # three compounded ~2% estimates on |overlap| ~ |A| scale:
        # allow 10% of the union as the error budget
        assert abs(r["est_overlap"] - exact[k]) <= max(
            0.1 * r["est_union"], 50
        ), (k, r["est_overlap"], exact[k])


def test_spearman_matches_pearson_of_average_ranks(spark):
    """ADVICE r8: under ties, spearman_rho must equal the
    conventional Pearson-of-average-ranks (scipy's definition), not
    the difference formula. Recompute independently with numpy over
    the same parquet."""
    import numpy as np

    from trendengine_spark.queries import REGISTRY

    sf = "/root/testdata/sf0.001"
    got = {
        (r["type_a"], r["type_b"]): r
        for r in REGISTRY["stats_spearman_pairs"].fn(spark, sf).collect()
    }
    ev = pd.read_parquet(f"{sf}/events.parquet")[["event_type", "ts"]]
    ev["d"] = pd.to_datetime(ev["ts"]).dt.date
    daily = (
        ev.groupby(["event_type", "d"]).size().rename("y").reset_index()
    )
    types = sorted(daily["event_type"].unique())
    n_ties = 0
    for i, ta in enumerate(types):
        for tb in types[i + 1:]:
            a = daily[daily.event_type == ta].set_index("d")["y"]
            b = daily[daily.event_type == tb].set_index("d")["y"]
            common = a.index.intersection(b.index)
            ya, yb = a[common], b[common]
            ra = ya.rank(method="average").to_numpy()
            rb = yb.rank(method="average").to_numpy()
            n_ties += int(len(np.unique(ra)) < len(ra))
            want = float(np.corrcoef(ra, rb)[0, 1])
            assert got[(ta, tb)]["spearman_rho"] == pytest.approx(
                want, abs=1e-12
            ), (ta, tb)
    assert n_ties > 0  # daily counts tie — the case the fix is about


def test_approx_percentiles_gate_paths_equal(spark, monkeypatch):
    """The r12 cardinality gate: the GK-lossless path and the exact
    sort path return IDENTICAL rows (both are exact ceil(p*n)-rank
    elements), so the sf10 memory fix cannot move any checked value."""
    import trendengine_spark.operators.util as util
    from trendengine_spark.queries import REGISTRY

    sf = "/root/testdata/sf0.01"
    fn = REGISTRY["approx_percentiles"].fn
    a = {tuple(r) for r in fn(spark, sf).collect()}
    monkeypatch.setattr(util, "GK_LOSSLESS_GATE", 1)  # force exact path
    b = {tuple(r) for r in fn(spark, sf).collect()}
    assert a == b and len(a) == 3


def test_exact_rank_element_ignores_nulls(spark):
    """ADVICE r12: NULLs must not occupy the lowest ranks — the exact
    path matches percentile_approx/quantile_disc NULL semantics, so
    crossing GK_LOSSLESS_GATE cannot change results on nullable
    columns."""
    from trendengine_spark.operators.util import exact_rank_element

    df = spark.createDataFrame(
        [(None,), (None,), (1.0,), (2.0,), (3.0,), (4.0,)], "v double"
    )
    # ceil(0.5·4) = 2nd smallest non-null = 2.0
    assert exact_rank_element(df, "v", 0.5) == 2.0
    # and n, when supplied, is the NON-NULL count by contract
    assert exact_rank_element(df, "v", 0.5, n=4) == 2.0
    got = df.agg(F.percentile_approx("v", 0.5, 10).alias("p")).collect()
    assert got[0]["p"] == 2.0


def test_exact_rank_element_bracket_path_exact(spark):
    """r14 (sf30 probe finding): the r12 `orderBy().offset(k-1)`
    shape physically planned as a TOP-K with a 2·k per-task buffer —
    at rank ~90M it OOM'd a 48g heap. The re-planned path (GK
    bracket → exact counts → tie-collapsed running-count window)
    must return the identical ⌈q·n⌉-rank element. 50k rows exercises
    the bracket branch (n > 4·acc); the value set is 90% one heavy
    tie + a spread tail, the clique regime that produced the OOM."""
    from trendengine_spark.operators.util import exact_rank_element

    vals = [float(i % 500) if i % 10 == 0 else 250.0 for i in range(50_000)]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    srt = sorted(vals)
    import math

    for q in (0.001, 0.25, 0.5, 0.9, 0.999, 1.0):
        k = max(int(math.ceil(q * len(vals))), 1)
        assert exact_rank_element(df, "v", q) == srt[k - 1], q


def test_exact_rank_element_guard_path_bucketed(spark):
    """r15 (VERDICT r14 #5): the bracket-miss guard path must return
    the same exact-rank element as a sorted list, through the new
    range-bucketed two-pass selection (per-bucket totals + in-bucket
    running-count window) instead of the r14 single-task global
    window. The guard is forced by violating the ``n`` contract
    (n = 2x the true count): the GK bracket quantiles are then
    computed against the inflated n, the bracket slice misses the
    true rank, and the fallback runs — on the REAL data, where
    rank k is still well-defined."""
    import math

    from trendengine_spark.operators.util import exact_rank_element

    vals = [float(i % 997) if i % 7 else 450.0 for i in range(50_000)]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    srt = sorted(vals)
    fake_n = 2 * len(vals)  # > 4*acc, and shifts k past the bracket
    q = 0.4
    k = max(int(math.ceil(q * fake_n)), 1)  # rank 40k of 50k real rows
    assert k <= len(vals)
    assert exact_rank_element(df, "v", q, n=fake_n) == srt[k - 1]
    # rank beyond every real row: the guard must return None, not hang
    assert exact_rank_element(df, "v", 0.9, n=fake_n) is None


def test_approx_distinct_tracks_exact(spark):
    """approx_vs_exact_distinct (registry-retired r13, API surface
    kept): native HLL approx_count_distinct at rsd=0.01 tracks the
    exact per-group distincts within a few percent."""
    from trendengine_spark.queries.relational import (
        approx_vs_exact_distinct,
    )

    rows = approx_vs_exact_distinct(spark, "/root/testdata/sf0.01").collect()
    assert rows
    for r in rows:
        assert r["exact_users"] > 0
        err = abs(r["approx_users"] - r["exact_users"]) / r["exact_users"]
        assert err < 0.05, r


def test_join_time_window_counts_null_user_matches_oracle(spark, tmp_path):
    """ADVICE r13: the n_total − n_own decomposition must match the
    oracle's NULL semantics — `e.u2 <> p.user_id` is NULL-false, so
    NULL-user EVENTS count toward nobody's window and a NULL-user
    PURCHASE gets n_nearby = 0. Synthetic nullable input; oracle
    recomputed by DuckDB on the same parquet."""
    import duckdb

    from trendengine_spark.queries import REGISTRY

    rows = [
        # (event_id, ts_ms, user_id, event_type)
        (1, 0, 10, "purchase"),      # u10 buys at t=0
        (2, 30_000, 11, "view"),     # other user inside window
        (3, 30_000, 10, "view"),     # own event inside window
        (4, 45_000, None, "view"),   # NULL-user event inside window
        (5, 90_000, 12, "purchase"), # u12 buys at t=90s
        (6, 200_000, None, "purchase"),  # NULL-user purchase
        (7, 210_000, 13, "view"),    # inside NULL purchase's window
    ]
    sdf = spark.createDataFrame(
        [
            (eid, ms, uid, et, 1.0, "{}")
            for eid, ms, uid, et in rows
        ],
        "event_id long, ms long, user_id long, event_type string, "
        "value double, props string",
    ).selectExpr(
        "event_id", "timestamp_millis(ms) AS ts", "user_id",
        "event_type", "value", "props",
    )
    d = str(tmp_path / "sf")
    sdf.coalesce(1).write.parquet(d + "/events.parquet")

    q = REGISTRY["join_time_window_counts"]
    got = {
        r["event_id"]: r["n_nearby"]
        for r in q.fn(spark, d).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet/*.parquet'"
    )
    want = dict(con.execute(q.sql).fetchall())
    assert got == want
    assert want[6] == 0          # NULL-user purchase → 0, not 1
    assert want[1] == 1          # NULL-user event never counted
