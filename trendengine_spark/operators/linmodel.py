"""One-pass distributed linear-model fitting via exact Gram-matrix
aggregation (normal equations) — the quality-model / heuristic-filter
primitive of a training-data curation pipeline.

The reference delegates all model fitting to per-series R routines
(``/root/reference/TrendEngine/calculations/polytrend.py:291-312``
fits per-pixel polynomials); a corpus-level quality model is the same
math at the opposite grain — ONE regression over billions of rows.
The classic scale-out formulation: for the design matrix X (n×d, plus
intercept) and target y, the least-squares solution
``w = (XᵀX)⁻¹ Xᵀy`` depends on the data only through the moment sums
``Σ xᵢxⱼ``, ``Σ xᵢy``, ``Σ xᵢ``, ``Σ y``, ``n`` — each a plain
``SUM(a*b)`` aggregate with a map-side partial combine. Fitting
therefore costs ONE corpus pass that shuffles O(groups · d²) numbers
regardless of row count, and the (d+1)×(d+1) solve happens
driver-side on a bounded matrix. Nothing iterative, nothing
collected but the Gram rows.

With integer-valued features (token counts, char counts, flag sums)
the moments are exact BIGINT sums: partition-order-invariant,
hash-stable, and oracle-checkable against any engine — the property
the repo's exact-arithmetic oracle discipline is built on
(cf. ``trend_polyfit_coeffs``). Float features work too; the sums
then carry the usual accumulation-order noise.

Scoring is a pure-codegen projection: the fitted weights are folded
into one literal dot-product expression — no UDF, no join, no
broadcast; a whole-stage-codegen map over the scan.

100 TB posture: the fit is a single partial+final aggregate (the
cheapest distributed shape there is); Gram width grows as d², so keep
d ≤ ~100 (a 100-feature model ships 5 k numbers per group — still
nothing). Feature hashing into a fixed-d space composes upstream when
the raw feature space is unbounded.
"""

from __future__ import annotations

from functools import reduce
from typing import Mapping, Sequence

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "gram_moments",
    "solve_normal",
    "fit_linear",
    "fit_linear_df",
    "score_expr",
    "score_linear",
    "cv_linear",
    "fit_huber",
    "fit_logistic",
]


def gram_moments(
    df: DataFrame,
    cols: Sequence[str],
    group_cols: Sequence[str] = (),
    weight: Column | None = None,
) -> DataFrame:
    """All second-order moments of ``cols`` in one aggregate pass.

    Output columns: ``n_rows`` (count — or Σω when ``weight`` is
    given), ``s_<c>`` (``SUM(c)``) for every column, and ``g_<a>_<b>``
    (``SUM(a*b)``) for every ordered pair a ≤ b in ``cols`` order —
    the sufficient statistics for any least-squares fit over subsets
    of ``cols``. With ``weight`` every sum is ω-weighted (the IRLS /
    weighted-least-squares building block; ω is any codegen
    expression, so a robustness reweight costs NO extra pass over the
    data — the weight folds into the same whole-stage-codegen
    aggregate). One row per group (one row total when ``group_cols``
    is empty), so the result is always bounded and safe to collect.
    """
    if weight is None:
        aggs: list[Column] = [F.count(F.lit(1)).alias("n_rows")]
        aggs += [F.sum(F.col(c)).alias(f"s_{c}") for c in cols]
        for i, a in enumerate(cols):
            for b in cols[i:]:
                aggs.append(F.sum(F.col(a) * F.col(b)).alias(f"g_{a}_{b}"))
    else:
        aggs = [F.sum(weight).alias("n_rows")]
        aggs += [F.sum(weight * F.col(c)).alias(f"s_{c}") for c in cols]
        for i, a in enumerate(cols):
            for b in cols[i:]:
                aggs.append(
                    F.sum(weight * F.col(a) * F.col(b)).alias(f"g_{a}_{b}")
                )
    if group_cols:
        return df.groupBy(*group_cols).agg(*aggs)
    return df.agg(*aggs)


def _g(m: Mapping, a: str, b: str):
    """Moment lookup tolerant of pair order (only a ≤ b is stored)."""
    key = f"g_{a}_{b}"
    return m[key] if key in m else m[f"g_{b}_{a}"]


def solve_normal(
    moments: Mapping,
    features: Sequence[str],
    target: str,
    ridge: float = 0.0,
) -> dict:
    """Solve the normal equations from one :func:`gram_moments` row.

    Returns ``{"weights": {feature: w}, "intercept": w0, "n": n,
    "sse": ..., "r2": ...}``. ``ridge`` adds λI to the feature block
    (never the intercept). Uses ``lstsq`` when λ=0 so exactly
    collinear features degrade to the minimum-norm solution instead
    of raising.
    """
    d = len(features)
    n = float(moments["n_rows"])
    A = np.zeros((d + 1, d + 1))
    b = np.zeros(d + 1)
    for i, fi in enumerate(features):
        for j, fj in enumerate(features):
            A[i, j] = float(_g(moments, fi, fj))
        A[i, d] = A[d, i] = float(moments[f"s_{fi}"])
        b[i] = float(_g(moments, fi, target))
    A[d, d] = n
    b[d] = float(moments[f"s_{target}"])
    if ridge:
        A[:d, :d] += ridge * np.eye(d)
        w = np.linalg.solve(A, b)
    else:
        w = np.linalg.lstsq(A, b, rcond=None)[0]
    # SSE from moments alone: yᵀy − 2wᵀb + wᵀAw (exact identity;
    # the ridge term is excluded so sse is the true data residual).
    if ridge:
        A[:d, :d] -= ridge * np.eye(d)
    yty = float(_g(moments, target, target))
    sse = yty - 2.0 * w @ b + w @ A @ w
    sy = float(moments[f"s_{target}"])
    sst = yty - sy * sy / n if n else 0.0
    return {
        "weights": dict(zip(features, w[:d].tolist())),
        "intercept": float(w[d]),
        "n": int(moments["n_rows"]),
        "sse": float(sse),
        "r2": float(1.0 - sse / sst) if sst > 0 else float("nan"),
    }


def fit_linear(
    df: DataFrame,
    features: Sequence[str],
    target: str,
    group_cols: Sequence[str] = (),
    ridge: float = 0.0,
    max_groups: int = 4096,
) -> dict:
    """Fit one model per group in a single distributed pass.

    Returns ``{group_value_tuple: solve_normal(...)}`` (key ``()``
    when ungrouped). The only driver-side data is the Gram rows —
    one per group, and that bound is now ENFORCED (r9): the collect
    is capped at ``max_groups`` rows via a pushed LIMIT, so a
    high-cardinality ``group_cols`` raises instead of silently
    pulling O(groups·d²) onto the driver. For genuinely unbounded
    group counts use :func:`fit_linear_df` — the same moments, solved
    executor-side, one result ROW per group.
    """
    gm = gram_moments(df, [*features, target], group_cols)
    if group_cols:
        rows = gm.limit(max_groups + 1).collect()
        if len(rows) > max_groups:
            raise ValueError(
                f"fit_linear: > {max_groups} groups on {list(group_cols)};"
                " the per-group dict contract is driver-bounded — use"
                " fit_linear_df (distributed per-group solve) or raise"
                " max_groups explicitly"
            )
    else:
        rows = gm.collect()
    out = {}
    for r in rows:
        m = r.asDict()
        key = tuple(m[c] for c in group_cols)
        out[key] = solve_normal(m, features, target, ridge)
    return out


def fit_linear_df(
    df: DataFrame,
    features: Sequence[str],
    target: str,
    group_cols: Sequence[str],
    ridge: float = 0.0,
) -> DataFrame:
    """Per-group least squares with UNBOUNDED group cardinality — the
    distributed companion to :func:`fit_linear` (which returns a
    driver-side dict and therefore caps groups).

    Same single Gram pass; the (d+1)×(d+1) solves then run
    executor-side over the moment rows (an Arrow-batched map — each
    row is one independent solve, so the work is embarrassingly
    parallel and the result is one row per group:
    ``group_cols…, weights array<double> (features order), intercept,
    n_rows, sse, r2``). Nothing is collected anywhere; millions of
    groups cost a shuffle of O(groups·d²) numbers and nothing else.
    """
    mom = gram_moments(df, [*features, target], group_cols)
    feats = list(features)
    gtypes = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in mom.schema.fields
        if f.name in group_cols
    )
    schema = (
        f"{gtypes}, weights array<double>, intercept double,"
        " n_rows long, sse double, r2 double"
    )

    def _solve(batches):
        import pandas as pd

        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                fit = solve_normal(r, feats, target, ridge)
                out.append(
                    tuple(r[c] for c in group_cols)
                    + (
                        [fit["weights"][f] for f in feats],
                        fit["intercept"],
                        fit["n"],
                        fit["sse"],
                        fit["r2"],
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[*group_cols, "weights", "intercept",
                         "n_rows", "sse", "r2"],
            )

    return mom.mapInPandas(_solve, schema)


def score_expr(weights: Mapping[str, float], intercept: float) -> Column:
    """The fitted model as one codegen expression (literal weights)."""
    terms = [F.col(c) * float(w) for c, w in weights.items()]
    return reduce(lambda a, b: a + b, terms, F.lit(float(intercept)))


def score_linear(
    df: DataFrame,
    weights: Mapping[str, float],
    intercept: float,
    output_col: str = "score",
) -> DataFrame:
    """Append the model prediction as a column (pure projection)."""
    return df.withColumn(output_col, score_expr(weights, intercept))


def cv_linear(
    df: DataFrame,
    features: Sequence[str],
    target: str,
    k: int = 5,
    fold_col: str | None = None,
    id_cols: Sequence[str] = (),
    ridge: float = 0.0,
) -> dict:
    """k-fold cross-validation in ONE corpus pass.

    The Gram moments are additive over disjoint row sets, so the
    entire CV needs only the per-fold moment rows: the leave-fold-out
    model is solved from (total − fold) moments, and the held-out
    error is evaluated from the SAME fold moments via the exact
    identity ``SSE_f = yᵀy_f − 2 wᵀb_f + wᵀA_f w`` — no second pass,
    no per-fold scans, no scoring job. Folds are assigned by a
    deterministic hash of ``id_cols`` (reproducible across runs and
    partitionings) unless ``fold_col`` names an existing column.

    Returns ``{"folds": [{fold, n_train, n_test, rmse}...],
    "rmse_mean": ..., "rmse_std": ...}``. Driver-side data: k moment
    rows.
    """
    if fold_col is None:
        if not id_cols:
            raise ValueError("pass fold_col or id_cols for hashing")
        df = df.withColumn(
            "_fold", F.pmod(F.xxhash64(*id_cols), F.lit(k)).cast("int")
        )
        fold_col = "_fold"
    cols = [*features, target]
    # the per-fold moment collect is bounded by construction when we
    # hash the folds ourselves; a caller-provided fold_col is capped
    # the same way fit_linear caps groups (pushed LIMIT, then raise)
    rows = [
        r.asDict()
        for r in gram_moments(df, cols, [fold_col]).limit(1025).collect()
    ]
    if len(rows) > 1024:
        raise ValueError(
            f"cv_linear: fold column {fold_col!r} has > 1024 distinct"
            " values — not a fold assignment; pass k/id_cols instead"
        )
    if len(rows) < 2:
        raise ValueError(f"need >= 2 non-empty folds, got {len(rows)}")
    num_keys = [m for m in rows[0] if m != fold_col]
    total = {m: sum(r[m] for r in rows) for m in num_keys}
    d = len(features)
    out = []
    for r in sorted(rows, key=lambda r: r[fold_col]):
        train = {m: total[m] - r[m] for m in num_keys}
        fit = solve_normal(train, features, target, ridge)
        w = np.array([fit["weights"][f] for f in features] + [fit["intercept"]])
        # held-out SSE from the fold's own moments
        A = np.zeros((d + 1, d + 1))
        b = np.zeros(d + 1)
        for i, fi in enumerate(features):
            for j, fj in enumerate(features):
                A[i, j] = float(_g(r, fi, fj))
            A[i, d] = A[d, i] = float(r[f"s_{fi}"])
            b[i] = float(_g(r, fi, target))
        A[d, d] = float(r["n_rows"])
        b[d] = float(r[f"s_{target}"])
        sse = float(_g(r, target, target)) - 2.0 * w @ b + w @ A @ w
        n_test = int(r["n_rows"])
        out.append(
            {
                "fold": r[fold_col],
                "n_train": fit["n"],
                "n_test": n_test,
                "rmse": float(np.sqrt(max(sse, 0.0) / n_test)),
            }
        )
    rmses = np.array([f["rmse"] for f in out])
    return {
        "folds": out,
        "rmse_mean": float(rmses.mean()),
        "rmse_std": float(rmses.std()),
    }


def fit_huber(
    df: DataFrame,
    features: Sequence[str],
    target: str,
    group_cols: Sequence[str] = (),
    delta: float | None = None,
    iters: int = 5,
) -> dict:
    """Huber-robust regression via IRLS — the quality model that the
    garbage it exists to find cannot skew.

    OLS minimizes squared error, so a 0.1% tail of corrupted rows
    (spam docs, parser explosions) drags the fit arbitrarily far.
    Huber's loss is quadratic near zero and linear beyond ``delta``,
    which IRLS renders as iteratively-reweighted least squares with
    ω = min(1, δ/|r|). Each iteration here is ONE weighted
    :func:`gram_moments` aggregate where ω is a pure codegen
    expression of the previous iteration's weights (the prediction is
    a literal dot product, the residual and clamp are arithmetic) —
    no UDF, no scoring job, no cached intermediate; ``iters`` passes
    over the data total, each the same partial+final shape as the
    plain fit.

    ``delta=None`` re-estimates δ per group each iteration as
    1.345 · 1.4826 · MAD of the current residuals — the classical
    robust scale (a δ estimated from the contaminated fit's SSE stays
    too loose: Huber-weighted SSE still carries δ·|r| per outlier, so
    its fixpoint sits far above the clean σ — measured before
    switching). Auto-scale mode costs one extra tiny aggregate
    (grouped percentile sketch of |r|) per iteration. Returns the
    same structure as :func:`fit_linear` plus ``"delta"`` (final).
    """
    from trendengine_spark.operators.util import owned_cache

    # the IRLS loop scans df iters (+iters MAD) times — materialize
    # once (pool-bounded; a key collision merely evicts, never
    # returns another plan's data)
    df = owned_cache(
        df, f"linmodel.huber.{'-'.join(features)}.{target}"
    )
    fits = fit_linear(df, features, target, group_cols)
    deltas = {key: delta for key in fits}

    def _resid_expr(cur):
        resid = None
        for key, f in cur.items():
            pred = score_expr(f["weights"], f["intercept"])
            r = F.col(target) - pred
            if not group_cols:
                return r
            cond = reduce(
                lambda a, b: a & b,
                [F.col(c) == v for c, v in zip(group_cols, key)],
            )
            resid = F.when(cond, r) if resid is None else resid.when(cond, r)
        return resid

    for _ in range(iters):
        resid = _resid_expr(fits)
        if delta is None:  # classical robust scale: 1.345 * 1.4826 * MAD
            mad_agg = F.percentile_approx(
                F.abs(resid), F.lit(0.5), F.lit(10_000)
            ).alias("_mad")
            if group_cols:
                for r_ in df.groupBy(*group_cols).agg(mad_agg).collect():
                    key = tuple(r_[c] for c in group_cols)
                    deltas[key] = 1.345 * 1.4826 * max(r_["_mad"], 1e-9)
            else:
                mad = df.agg(mad_agg).collect()[0]["_mad"]
                deltas[()] = 1.345 * 1.4826 * max(mad, 1e-9)
        dlt = None
        for key in fits:
            d_k = F.lit(deltas[key])
            if not group_cols:
                dlt = d_k
                break
            cond = reduce(
                lambda a, b: a & b,
                [F.col(c) == v for c, v in zip(group_cols, key)],
            )
            dlt = F.when(cond, d_k) if dlt is None else dlt.when(cond, d_k)
        omega = F.when(
            F.abs(resid) <= dlt, F.lit(1.0)
        ).otherwise(dlt / F.abs(resid))
        rows = gram_moments(
            df, [*features, target], group_cols, weight=omega
        ).collect()
        fits = {}
        for r_ in rows:
            m = r_.asDict()
            key = tuple(m[c] for c in group_cols)
            fits[key] = solve_normal(m, features, target)
    for key in fits:
        fits[key]["delta"] = deltas[key]
    return fits


def fit_logistic(
    df: DataFrame,
    features: Sequence[str],
    target: str,
    group_cols: Sequence[str] = (),
    iters: int = 8,
    ridge: float = 1e-9,
) -> dict:
    """Distributed logistic regression via IRLS — the classifier half
    of the model toolbox (OLS/ridge `fit_linear`, robust `fit_huber`,
    monotone `fit_isotonic` are the regression half): P(y=1 | x) =
    σ(wᵀx + b) fitted by Newton's method, which IRLS renders as a
    weighted least-squares solve per iteration with w = μ(1−μ) and
    working response z = η + (y − μ)/w.

    The same discipline as `fit_huber`: μ, w and z are pure CODEGEN
    expressions of the previous iteration's literal weights (η is a
    literal dot product, σ one `exp`), so every Newton step is ONE
    ω-weighted :func:`gram_moments` aggregate — no UDF, no scoring
    job, state is the (d+1)² moment row per group, `iters` passes
    over the data total. ``target`` must be 0/1 (cast upstream).
    w is floored at 1e-6 so a saturated group (all-0/all-1 labels —
    perfect separation) degrades to slow coefficient growth instead
    of a division blow-up; 8 Newton iterations put μ within 1e-3 of
    the separation plateau (tested). Returns the `fit_linear`
    structure per group key.

    Scale: identical to the Gram fit — shuffle O(groups·d²)
    regardless of rows, partial+final aggregation, and the streaming
    trainers' moments-not-rows argument carries over unchanged."""
    from functools import reduce as _reduce

    from trendengine_spark.operators.util import owned_cache

    df = owned_cache(
        df, f"linmodel.logit.{'-'.join(features)}.{target}"
    )
    # Iteration 0 runs OUTSIDE the chained-expression machinery (r10):
    # with beta = 0 for every group, eta ≡ 0, mu ≡ 0.5 and w ≡ 0.25
    # exactly, so the first Newton step needs no per-group expression
    # — and its gram rows already carry (a) the group keys (replacing
    # the old distinct-collect job) and (b) the exact row counts
    # (sum(w) = n/4 with w constant, replacing the old final count
    # job). Two whole scan jobs saved, identical math.
    z0 = (F.col(target).cast("double") - F.lit(0.5)) / F.lit(0.25)
    # limit(1025) bounds the driver collect BEFORE the cardinality
    # check (r11, ADVICE): ≤1024 groups means ≤1024 rows come back —
    # the complete set needed for Newton step 1 — while a pathological
    # grouping returns exactly 1025 and raises instead of OOMing the
    # driver with an unbounded collect.
    rows0 = (
        gram_moments(
            df.withColumn("_z", z0),
            [*features, "_z"],
            group_cols,
            weight=F.lit(0.25),
        )
        .limit(1025)
        .collect()
    )
    if len(rows0) > 1024:
        raise ValueError(
            "fit_logistic: group_cols cardinality exceeds 1024 — "
            "use a coarser grouping"
        )
    fits = {}
    true_n = {}
    for r_ in rows0:
        m = r_.asDict()
        key = tuple(m[c] for c in group_cols)
        fits[key] = solve_normal(m, features, "_z", ridge)
        true_n[key] = int(round(float(m["n_rows"]) * 4))

    def _chained(build):
        expr = None
        for key, f in fits.items():
            e = build(f)
            if not group_cols:
                return e
            cond = _reduce(
                lambda a, b: a & b,
                [F.col(c) == v for c, v in zip(group_cols, key)],
            )
            expr = F.when(cond, e) if expr is None else expr.when(cond, e)
        return expr

    for _ in range(iters - 1):  # Newton step 1 of `iters` ran above
        eta = _chained(lambda f: score_expr(f["weights"], f["intercept"]))
        mu = F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))
        w = F.greatest(mu * (F.lit(1.0) - mu), F.lit(1e-6))
        z = eta + (F.col(target).cast("double") - mu) / w
        rows = gram_moments(
            df.withColumn("_z", z), [*features, "_z"], group_cols, weight=w
        ).collect()
        new_fits = {}
        for r_ in rows:
            m = r_.asDict()
            key = tuple(m[c] for c in group_cols)
            new_fits[key] = solve_normal(m, features, "_z", ridge)
        # Newton convergence check is FREE (the coefficients are
        # already driver-side per iteration, r10): stop when every
        # group's largest coefficient step is below tol — each saved
        # iteration is one whole scan+aggregate job. Saturated groups
        # (perfect separation) never converge by this test and run
        # the full iteration budget, as before.
        delta = 0.0
        for key, nf in new_fits.items():
            of = fits.get(
                key, {"weights": {f: 0.0 for f in features}, "intercept": 0.0}
            )
            delta = max(
                delta,
                abs(nf["intercept"] - of["intercept"]),
                *[
                    abs(nf["weights"][f] - of["weights"][f])
                    for f in features
                ],
            )
        fits = new_fits
        if delta < 1e-9:
            break
    # true row counts came free from iteration 0 (w ≡ 0.25 exactly,
    # so Σw = n/4 — no extra count job)
    for key in fits:
        fits[key]["n"] = true_n.get(key, 0)
    return fits
