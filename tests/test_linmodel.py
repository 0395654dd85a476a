"""One-pass exact-Gram linear fitting (`operators/linmodel.py`).

The distributed part (moment sums) is oracle-checked by
`quality_gram_matrix`; these tests pin the driver-side solve and the
exactness claims: planted integer data recovers planted weights,
the Gram is bit-equal to numpy's and invariant to partitioning, and
the codegen scorer equals the numpy dot product.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from trendengine_spark.operators.linmodel import (
    cv_linear,
    fit_linear,
    fit_logistic,
    gram_moments,
    score_linear,
    solve_normal,
)


def _planted(spark, n=500, parts=7):
    """Integer features; y = 3*x1 - 2*x2 + 7 exactly."""
    rng = np.random.RandomState(42)
    x1 = rng.randint(0, 200, n)
    x2 = rng.randint(0, 50, n)
    y = 3 * x1 - 2 * x2 + 7
    pdf = pd.DataFrame(
        {"x1": x1, "x2": x2, "y": y, "grp": (x1 % 2).astype(int)}
    )
    return spark.createDataFrame(pdf).repartition(parts), pdf


def test_exact_planted_recovery(spark):
    df, _ = _planted(spark)
    fit = fit_linear(df, ["x1", "x2"], "y")[()]
    assert fit["weights"]["x1"] == pytest.approx(3.0, abs=1e-8)
    assert fit["weights"]["x2"] == pytest.approx(-2.0, abs=1e-8)
    assert fit["intercept"] == pytest.approx(7.0, abs=1e-6)
    assert fit["sse"] == pytest.approx(0.0, abs=1e-4)
    assert fit["r2"] == pytest.approx(1.0, abs=1e-10)
    assert fit["n"] == 500


def test_gram_equals_numpy_and_partition_invariant(spark):
    df, pdf = _planted(spark, parts=13)
    row = gram_moments(df, ["x1", "x2", "y"]).collect()[0].asDict()
    z = pdf[["x1", "x2", "y"]].to_numpy(dtype=np.int64)
    assert row["n_rows"] == len(pdf)
    for i, a in enumerate(["x1", "x2", "y"]):
        assert row[f"s_{a}"] == int(z[:, i].sum())
        for j, b in enumerate(["x1", "x2", "y"]):
            if i <= j:
                assert row[f"g_{a}_{b}"] == int((z[:, i] * z[:, j]).sum())
    # integer sums are associative: any partitioning, same bits
    row1 = (
        gram_moments(df.repartition(1), ["x1", "x2", "y"])
        .collect()[0]
        .asDict()
    )
    assert row1 == row


def test_grouped_fit_and_scoring(spark):
    # two groups with different planted models
    rng = np.random.RandomState(7)
    x = rng.randint(0, 100, 400)
    g = np.arange(400) % 2
    y = np.where(g == 0, 5 * x + 1, -4 * x + 9)
    df = spark.createDataFrame(
        pd.DataFrame({"x": x, "g": g.astype(int), "y": y})
    )
    fits = fit_linear(df, ["x"], "y", group_cols=["g"])
    assert fits[(0,)]["weights"]["x"] == pytest.approx(5.0, abs=1e-8)
    assert fits[(1,)]["weights"]["x"] == pytest.approx(-4.0, abs=1e-8)
    assert fits[(0,)]["intercept"] == pytest.approx(1.0, abs=1e-6)
    assert fits[(1,)]["intercept"] == pytest.approx(9.0, abs=1e-6)
    # codegen scorer == numpy dot
    scored = (
        score_linear(
            df.filter("g = 0"),
            fits[(0,)]["weights"],
            fits[(0,)]["intercept"],
            "pred",
        )
        .orderBy("x")
        .toPandas()
    )
    np.testing.assert_allclose(
        scored["pred"], 5.0 * scored["x"] + 1.0, atol=1e-9
    )


def test_ridge_and_collinear_degrade_gracefully(spark):
    # x2 = 2*x1 exactly: λ=0 must not raise (lstsq minimum-norm);
    # λ>0 solves and shrinks toward zero.
    x1 = np.arange(1, 201)
    df = spark.createDataFrame(
        pd.DataFrame({"x1": x1, "x2": 2 * x1, "y": 10 * x1 + 3})
    )
    fit0 = fit_linear(df, ["x1", "x2"], "y")[()]
    # any (w1 + 2*w2 = 10) solution predicts exactly
    assert fit0["weights"]["x1"] + 2 * fit0["weights"]["x2"] == pytest.approx(
        10.0, abs=1e-6
    )
    assert fit0["sse"] == pytest.approx(0.0, abs=1e-3)
    fit_l = fit_linear(df, ["x1", "x2"], "y", ridge=1e3)[()]
    assert fit_l["sse"] >= fit0["sse"] - 1e-6  # ridge trades fit for norm
    n0 = np.hypot(*fit0["weights"].values())
    nl = np.hypot(*fit_l["weights"].values())
    assert nl <= n0 + 1e-9


def test_solve_normal_noise_matches_numpy_lstsq(spark):
    rng = np.random.RandomState(3)
    x1 = rng.randint(0, 100, 300)
    x2 = rng.randint(0, 100, 300)
    y = 2 * x1 + x2 + rng.randint(-5, 6, 300)  # integer noise
    df = spark.createDataFrame(pd.DataFrame({"x1": x1, "x2": x2, "y": y}))
    row = gram_moments(df, ["x1", "x2", "y"]).collect()[0].asDict()
    fit = solve_normal(row, ["x1", "x2"], "y")
    X = np.column_stack([x1, x2, np.ones_like(x1)]).astype(float)
    w_np, *_ = np.linalg.lstsq(X, y.astype(float), rcond=None)
    assert fit["weights"]["x1"] == pytest.approx(w_np[0], abs=1e-7)
    assert fit["weights"]["x2"] == pytest.approx(w_np[1], abs=1e-7)
    assert fit["intercept"] == pytest.approx(w_np[2], abs=1e-5)
    sse_np = float(((X @ w_np - y) ** 2).sum())
    assert fit["sse"] == pytest.approx(sse_np, rel=1e-6)


def test_declared_queries_smoke(spark):
    from trendengine_spark.queries import REGISTRY

    g = REGISTRY["quality_gram_matrix"].fn(spark, "/root/testdata/sf0.001")
    rows = {r["lang"]: r for r in g.collect()}
    assert rows and all(r["n_rows"] > 0 for r in rows.values())
    for r in rows.values():  # Cauchy-Schwarz sanity on real moments
        assert (
            r["g_n_tok_n_uniq"] ** 2
            <= r["g_n_tok_n_tok"] * r["g_n_uniq_n_uniq"]
        )
        assert r["s_repeats"] == r["s_n_tok"] - r["s_n_uniq"]
    topk = REGISTRY["quality_linear_residual_topk"].fn(
        spark, "/root/testdata/sf0.001"
    )
    pdf = topk.toPandas()
    assert len(pdf) == 20
    # sorted by |residual| desc
    absr = pdf["residual"].abs().to_numpy()
    assert (absr[:-1] >= absr[1:] - 1e-9).all()


def test_online_fit_stream_equals_batch(spark, tmp_path):
    """Streaming Gram accumulation must be BIT-EQUAL to the batch fit
    over the same rows (integer moments are exactly mergeable), with
    one model per group and at least two microbatches observed."""
    import numpy as np
    import pandas as pd

    from trendengine_spark.streaming.online_model import online_fit

    rng = np.random.RandomState(11)
    x1 = rng.randint(0, 100, 600)
    x2 = rng.randint(0, 40, 600)
    g = (np.arange(600) % 2).astype(int)
    y = np.where(g == 0, 4 * x1 + x2 + 2, -x1 + 3 * x2 - 5)
    df = spark.createDataFrame(
        pd.DataFrame({"x1": x1, "x2": x2, "g": g, "y": y})
    )
    src = str(tmp_path / "rows")
    df.repartition(3).write.parquet(src)  # 3 files → 3 microbatches

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    seen: list[tuple[int, dict]] = []
    q = online_fit(
        stream,
        ["x1", "x2"],
        "y",
        group_cols=["g"],
        on_update=lambda bid, models: seen.append((bid, models)),
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(180)

    assert len(seen) >= 2  # incremental, not one big batch
    final = seen[-1][1]
    batch = fit_linear(df, ["x1", "x2"], "y", group_cols=["g"])
    for key in [(0,), (1,)]:
        assert final[key]["n"] == batch[key]["n"]
        for f in ["x1", "x2"]:
            assert final[key]["weights"][f] == pytest.approx(
                batch[key]["weights"][f], abs=1e-12
            )
        assert final[key]["intercept"] == pytest.approx(
            batch[key]["intercept"], abs=1e-12
        )
    # planted models recovered through the stream
    assert final[(0,)]["weights"]["x1"] == pytest.approx(4.0, abs=1e-8)
    assert final[(1,)]["weights"]["x2"] == pytest.approx(3.0, abs=1e-8)


def test_cv_linear_one_pass_matches_manual(spark):
    """One-pass k-fold CV (Gram additivity) must equal the manual
    fit-on-k-1/score-on-1 loop done in numpy on the same folds."""
    rng = np.random.RandomState(21)
    x1 = rng.randint(0, 100, 500)
    x2 = rng.randint(0, 60, 500)
    y = 2 * x1 - x2 + 5 + rng.randint(-4, 5, 500)
    fold = np.arange(500) % 5
    df = spark.createDataFrame(
        pd.DataFrame({"x1": x1, "x2": x2, "y": y, "f": fold})
    )
    cv = cv_linear(df, ["x1", "x2"], "y", fold_col="f")
    assert len(cv["folds"]) == 5
    X = np.column_stack([x1, x2, np.ones(500)]).astype(float)
    for rec in cv["folds"]:
        fmask = fold == rec["fold"]
        w, *_ = np.linalg.lstsq(X[~fmask], y[~fmask].astype(float),
                                rcond=None)
        rmse = np.sqrt(((X[fmask] @ w - y[fmask]) ** 2).mean())
        assert rec["rmse"] == pytest.approx(rmse, rel=1e-9)
        assert rec["n_train"] == int((~fmask).sum())
        assert rec["n_test"] == int(fmask.sum())
    # noise is U{-4..4} (std ~2.58); CV rmse must sit at noise level
    assert 2.0 < cv["rmse_mean"] < 3.2
    # hash-fold path runs end-to-end too
    cv2 = cv_linear(df, ["x1", "x2"], "y", k=4, id_cols=["x1", "x2"])
    assert len(cv2["folds"]) == 4


def test_huber_resists_planted_outliers(spark):
    """10% of rows corrupted by +500: OLS is dragged far off the
    planted weights; Huber recovers them. Each IRLS iteration is one
    weighted aggregate (codegen omega), no scoring pass."""
    from trendengine_spark.operators.linmodel import fit_huber

    rng = np.random.RandomState(33)
    x1 = rng.randint(0, 100, 1000)
    x2 = rng.randint(0, 50, 1000)
    y = (3 * x1 - 2 * x2 + 7).astype(float)
    y += rng.normal(0, 1.0, 1000)
    bad = rng.rand(1000) < 0.10
    y[bad] += 500.0
    df = spark.createDataFrame(pd.DataFrame({"x1": x1, "x2": x2, "y": y}))

    ols = fit_linear(df, ["x1", "x2"], "y")[()]
    hub = fit_huber(df, ["x1", "x2"], "y", iters=5)[()]
    # OLS intercept absorbs ~50 of bias (10% x 500); Huber must not
    assert abs(ols["intercept"] - 7.0) > 20.0
    assert hub["weights"]["x1"] == pytest.approx(3.0, abs=0.05)
    assert hub["weights"]["x2"] == pytest.approx(-2.0, abs=0.05)
    assert hub["intercept"] == pytest.approx(7.0, abs=2.0)
    assert hub["delta"] > 0


def test_huber_equals_ols_on_clean_data(spark):
    """No outliers: Huber converges to (approximately) the OLS fit."""
    from trendengine_spark.operators.linmodel import fit_huber

    rng = np.random.RandomState(8)
    x = rng.randint(0, 100, 400)
    g = (np.arange(400) % 2).astype(int)
    y = np.where(g == 0, 5 * x + 1, -2 * x + 9).astype(float)
    y += rng.normal(0, 0.5, 400)
    df = spark.createDataFrame(pd.DataFrame({"x": x, "g": g, "y": y}))
    ols = fit_linear(df, ["x"], "y", group_cols=["g"])
    hub = fit_huber(df, ["x"], "y", group_cols=["g"], iters=4)
    for key in [(0,), (1,)]:
        assert hub[key]["weights"]["x"] == pytest.approx(
            ols[key]["weights"]["x"], abs=0.02
        )
        assert hub[key]["intercept"] == pytest.approx(
            ols[key]["intercept"], abs=1.0
        )


def test_flagship_model_curation_conserves_counts(spark):
    from trendengine_spark.queries import REGISTRY

    rows = (
        REGISTRY["flagship_model_curation"]
        .fn(spark, "/root/testdata/sf0.001")
        .collect()
    )
    assert rows
    for r in rows:
        assert r["n_docs"] == r["n_gated"] + r["n_dup_dropped"] + r["n_kept"]
        assert r["n_kept"] > 0  # a 3-sigma gate keeps the bulk


def test_huber_constant_target_degenerate_scale(spark):
    """All-identical target: MAD = 0 (guarded to 1e-9); the fit must
    return the exact constant model without dividing by zero."""
    from trendengine_spark.operators.linmodel import fit_huber

    df = spark.createDataFrame(
        pd.DataFrame({"x": np.arange(50), "y": np.full(50, 7.0)})
    )
    fit = fit_huber(df, ["x"], "y", iters=3)[()]
    assert fit["weights"]["x"] == pytest.approx(0.0, abs=1e-9)
    assert fit["intercept"] == pytest.approx(7.0, abs=1e-9)


def test_fit_linear_group_cardinality_guard(spark):
    """High-cardinality group_cols must raise, not collect O(groups)
    rows onto the driver (VERDICT r8 finding 3)."""
    df, _ = _planted(spark)
    wide = df.withColumn("gid", df.x1 * 1000 + df.x2)  # ~unique per row
    with pytest.raises(ValueError, match="fit_linear"):
        fit_linear(wide, ["x1", "x2"], "y", ["gid"], max_groups=10)
    # the same shape through the distributed solve works and matches
    # the driver-side solve group-for-group
    from trendengine_spark.operators.linmodel import fit_linear_df

    got = {
        r["grp"]: r
        for r in fit_linear_df(df, ["x1", "x2"], "y", ["grp"]).collect()
    }
    want = fit_linear(df, ["x1", "x2"], "y", ["grp"])
    assert set(got) == {k for (k,) in want}
    for (k,), fit in want.items():
        assert got[k]["weights"][0] == pytest.approx(
            fit["weights"]["x1"], abs=1e-9
        )
        assert got[k]["weights"][1] == pytest.approx(
            fit["weights"]["x2"], abs=1e-9
        )
        assert got[k]["intercept"] == pytest.approx(
            fit["intercept"], abs=1e-9
        )
        assert got[k]["n_rows"] == fit["n"]


def test_cv_linear_fold_col_cardinality_guard(spark):
    df, _ = _planted(spark, n=3000)
    wide = df.withColumn(
        "f", df.x1 * 1_000_000 + df.x2 * 10_000 + df.y
    )  # ~unique per row: far beyond any sane fold count
    with pytest.raises(ValueError, match="cv_linear"):
        cv_linear(wide, ["x1", "x2"], "y", fold_col="f")


def test_residual_topk_cramer_equals_lstsq(spark):
    """The exact-Cramer weights behind quality_linear_residual_topk
    (r9 oracle conversion) must agree with the production lstsq
    solve to 1e-8 — same cross-check trend_polyfit_coeffs carries."""
    from trendengine_spark.queries import REGISTRY
    from trendengine_spark.queries.ml import _doc_features

    sf = "/root/testdata/sf0.001"
    feats = _doc_features(spark, sf)
    fits = fit_linear(feats, ["n_tok", "n_uniq"], "n_chars", ["lang"])
    rows = REGISTRY["quality_linear_residual_topk"].fn(spark, sf).collect()
    assert len(rows) == 20
    for r in rows:
        fit = fits[(r["lang"],)]
        pred = (
            fit["weights"]["n_tok"] * r["n_tok"]
            + fit["weights"]["n_uniq"] * r["n_uniq"]
            + fit["intercept"]
        )
        assert r["pred"] == pytest.approx(pred, abs=1e-6)
        assert r["residual"] == pytest.approx(
            r["n_chars"] - pred, abs=1e-6
        )


def test_cv_query_matches_cv_linear_production_path(spark):
    """quality_linear_cv's exact-Cramer/fixed-association evaluation
    (the r9 oracle twin) must agree with the production cv_linear
    numpy path to 1e-9 on the same fold assignment — same cross-check
    discipline as trend_polyfit_coeffs / residual_topk."""
    from pyspark.sql import functions as F

    from trendengine_spark.queries import REGISTRY
    from trendengine_spark.queries.ml import _doc_features

    sf = "/root/testdata/sf0.001"
    rows = {
        r["fold"]: r
        for r in REGISTRY["quality_linear_cv"].fn(spark, sf).collect()
    }
    feats = _doc_features(spark, sf).withColumn(
        "_fold", (F.col("doc_id") % 5).cast("int")
    )
    cv = cv_linear(feats, ["n_tok", "n_uniq"], "n_chars", fold_col="_fold")
    for f in cv["folds"]:
        q = rows[f["fold"]]
        assert q["n_train"] == f["n_train"]
        assert q["n_test"] == f["n_test"]
        assert q["rmse"] == pytest.approx(f["rmse"], abs=1e-6)
    mean = sum(f["rmse"] for f in cv["folds"]) / len(cv["folds"])
    assert rows[-1]["rmse"] == pytest.approx(mean, abs=1e-5)


def test_pava_blocks_textbook_cases():
    """Hand-checked PAVA: violators pool, pooled mean is the weighted
    mean, already-monotone input is untouched."""
    from trendengine_spark.operators.isotonic import pava_blocks

    # y means: 1, 3, 2 with equal weights -> last two pool to 2.5
    assert pava_blocks([(1, 1), (1, 3), (1, 2)]) == [1.0, 2.5, 2.5]
    # strictly increasing stays put
    assert pava_blocks([(2, 2), (2, 4), (2, 8)]) == [1.0, 2.0, 4.0]
    # global violator pools everything: means 5, 1 (weights 1, 3)
    assert pava_blocks([(1, 5), (3, 3)]) == [2.0, 2.0]
    # weighted pooling: (n=1,y=4),(n=3,mean=2) -> (4+6)/4=2.5
    assert pava_blocks([(1, 4), (3, 6)]) == [2.5, 2.5]


def test_isotonic_query_monotone_and_mean_preserving(spark):
    """Per-language fitted values must be non-decreasing in n_tok and
    preserve the weighted mean (PAVA is a projection: sum of n*fitted
    equals sum of y exactly, up to the one division per block)."""
    from trendengine_spark.queries import REGISTRY

    rows = (
        REGISTRY["quality_isotonic_calibration"]
        .fn(spark, "/root/testdata/sf0.001")
        .collect()
    )
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    assert len(by_lang) == 5
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: r["n_tok"])
        fits = [r["fitted"] for r in rs]
        assert all(a <= b for a, b in zip(fits, fits[1:])), lang
        total_fit = sum(r["n"] * r["fitted"] for r in rs)
        total_y = sum(r["sum_y"] for r in rs)
        assert total_fit == pytest.approx(total_y, rel=1e-9)


def _irls_reference(X, y, iters=8, ridge=1e-9):
    """Textbook numpy IRLS (the independent reference fit_logistic is
    checked against): Newton steps on the augmented design."""
    import numpy as np

    Xa = np.hstack([X, np.ones((len(X), 1))])
    beta = np.zeros(Xa.shape[1])
    for _ in range(iters):
        eta = Xa @ beta
        mu = 1.0 / (1.0 + np.exp(-eta))
        w = np.maximum(mu * (1 - mu), 1e-6)
        z = eta + (y - mu) / w
        A = Xa.T @ (w[:, None] * Xa)
        A[:-1, :-1] += ridge * np.eye(Xa.shape[1] - 1)
        beta = np.linalg.solve(A, Xa.T @ (w * z))
    return beta


def test_fit_logistic_planted_recovery_and_reference_parity(spark):
    """fit_logistic must recover planted coefficients on a
    deterministic Bernoulli draw and agree with the textbook numpy
    IRLS on the identical rows to 1e-6 (same algorithm, distributed
    vs local)."""
    import numpy as np

    from pyspark.sql import functions as F

    n = 40_000
    df = (
        spark.range(n)
        .withColumn("x1", (F.pmod(F.col("id") * 7919, F.lit(1000)) / 500.0) - 1.0)
        .withColumn("x2", (F.pmod(F.col("id") * 104729, F.lit(1000)) / 500.0) - 1.0)
        # deterministic uniform draw from md5 (engine-portable spirit)
        .withColumn(
            "u",
            F.expr(
                "CAST(conv(substr(md5(CAST(id AS STRING)), 1, 12), 16, 10)"
                " AS DOUBLE) / 281474976710656.0"
            ),
        )
        .withColumn(
            "y",
            (
                F.col("u")
                < F.lit(1.0)
                / (F.lit(1.0) + F.exp(-(2.0 * F.col("x1") - 1.0 * F.col("x2") + 0.5)))
            ).cast("int"),
        )
    )
    fit = fit_logistic(df, ["x1", "x2"], "y")[()]
    assert fit["weights"]["x1"] == pytest.approx(2.0, abs=0.15)
    assert fit["weights"]["x2"] == pytest.approx(-1.0, abs=0.15)
    assert fit["intercept"] == pytest.approx(0.5, abs=0.15)
    assert fit["n"] == n

    pdf = df.select("x1", "x2", "y").toPandas()
    beta = _irls_reference(
        pdf[["x1", "x2"]].to_numpy(), pdf["y"].to_numpy(dtype=float)
    )
    assert fit["weights"]["x1"] == pytest.approx(beta[0], abs=1e-6)
    assert fit["weights"]["x2"] == pytest.approx(beta[1], abs=1e-6)
    assert fit["intercept"] == pytest.approx(beta[2], abs=1e-6)


def test_fit_logistic_grouped_and_saturated_guard(spark):
    """Per-group fits are independent, and a perfectly-separated
    (all-one-label) group degrades gracefully: the floored IRLS
    weight keeps the solve finite and the fitted probability
    saturates toward the label."""
    import math

    from pyspark.sql import functions as F

    df = (
        spark.range(4_000)
        .withColumn("g", (F.col("id") % 2 == 0).cast("string"))
        .withColumn("x1", (F.pmod(F.col("id") * 37, F.lit(100)) / 50.0) - 1.0)
        .withColumn(
            "y",
            F.when(F.col("g") == "true", F.lit(1))  # saturated group
            .otherwise((F.col("x1") > 0).cast("int")),
        )
    )
    fits = fit_logistic(df, ["x1"], "y", ["g"], iters=8)
    sat = fits[("true",)]
    p = 1.0 / (1.0 + math.exp(-(sat["intercept"])))
    assert p > 0.99 and math.isfinite(sat["intercept"])
    sep = fits[("false",)]
    assert sep["weights"]["x1"] > 1.0  # steep positive boundary


def test_logistic_gate_query_conservation_and_accuracy(spark):
    """The declared gate query's confusion counts must partition n
    exactly, labels are near-balanced by construction (threshold at
    the corpus median), and the fitted gate separates the
    near-linear n_chars ~ tokens relationship almost perfectly."""
    from trendengine_spark.queries import REGISTRY

    rows = (
        REGISTRY["quality_logistic_gate"]
        .fn(spark, "/root/testdata/sf0.001")
        .collect()
    )
    assert len(rows) == 5
    for r in rows:
        assert r["tp"] + r["fp"] + r["fn"] + r["tn"] == r["n"]
        assert 0 < r["n_pos"] < r["n"]  # non-degenerate labels
        assert (r["tp"] + r["tn"]) / r["n"] >= 0.9, r["lang"]


def test_logistic_gate_twin_matches_production_fit(spark):
    """The r12 oracle twin (quantized-Gram IRLS, queries/ml.py) must
    agree with the production `fit_logistic` path it replaced in the
    declared query: same 8 Newton steps, the twin's only deviations
    being the 2^-16 per-row Gram quantization and the algebraic
    w*eta + (y - mu) accumulation. On the sf0.001 corpus those
    perturbations must not move a single gate decision — the
    confusion counts are compared EXACTLY (a coefficient regression
    in either path, or a quantization scale mistake, breaks this)."""
    from pyspark.sql import functions as F

    from trendengine_spark.operators.linmodel import fit_logistic, score_expr
    from trendengine_spark.queries import REGISTRY
    from trendengine_spark.queries.ml import _doc_features

    sf = "/root/testdata/sf0.001"
    twin = {
        r["lang"]: r
        for r in REGISTRY["quality_logistic_gate"].fn(spark, sf).collect()
    }
    feats = _doc_features(spark, sf).withColumn(
        "is_long", (F.col("n_chars") > 300).cast("int")
    )
    fits = fit_logistic(
        feats, ["n_tok", "n_uniq"], "is_long", ["lang"], iters=8
    )
    eta = None
    for (lang,), f in sorted(fits.items()):
        e = score_expr(f["weights"], f["intercept"])
        eta = (
            F.when(F.col("lang") == lang, e)
            if eta is None
            else eta.when(F.col("lang") == lang, e)
        )
    y, p = F.col("is_long"), (eta >= 0).cast("int")
    prod = {
        r["lang"]: r
        for r in feats.withColumn("_p", p)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(y).cast("long").alias("n_pos"),
            F.sum(((y == 1) & (F.col("_p") == 1)).cast("long")).alias("tp"),
            F.sum(((y == 0) & (F.col("_p") == 1)).cast("long")).alias("fp"),
            F.sum(((y == 1) & (F.col("_p") == 0)).cast("long")).alias("fn"),
            F.sum(((y == 0) & (F.col("_p") == 0)).cast("long")).alias("tn"),
        )
        .collect()
    }
    assert set(twin) == set(prod)
    for lang in twin:
        for c in ("n", "n_pos", "tp", "fp", "fn", "tn"):
            assert twin[lang][c] == prod[lang][c], (lang, c)
