"""Distributed PCA (`operators/pca.py`): one-pass covariance, fit,
projection — pinned against numpy on planted low-rank structure."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from trendengine_spark.operators.pca import (
    JACOBI_SWEEPS,
    embedding_moments,
    exact_embedding_moments,
    jacobi_eigvals,
    jacobi_schedule,
    pca_fit,
    pca_project,
)


def _lowrank(n=400, dim=12, rank=3, noise=1e-3, seed=9):
    rng = np.random.RandomState(seed)
    w = rng.normal(size=(rank, dim))
    z = rng.normal(size=(n, rank))
    x = z @ w + noise * rng.normal(size=(n, dim)) + rng.normal(size=dim)
    return x


def _df(spark, x, parts=6):
    return spark.createDataFrame(
        pd.DataFrame(
            {"vec_id": np.arange(len(x)), "embedding": list(map(list, x))}
        )
    ).repartition(parts)


def test_moments_match_numpy(spark):
    x = _lowrank()
    rows = embedding_moments(_df(spark, x), x.shape[1]).collect()
    got = {(r["i"], r["j"]): r["s"] for r in rows}
    assert got[(-1, -1)] == len(x)
    for i in range(x.shape[1]):
        assert got[(i, -1)] == pytest.approx(x[:, i].sum(), rel=1e-12)
        for j in range(i, x.shape[1]):
            assert got[(i, j)] == pytest.approx(
                (x[:, i] * x[:, j]).sum(), rel=1e-12
            )


def test_fit_recovers_planted_rank(spark):
    x = _lowrank(noise=1e-4)
    fit = pca_fit(_df(spark, x), x.shape[1])
    assert fit["n"] == len(x)
    # top-3 components carry essentially all variance
    assert fit["explained"][:3].sum() > 0.999
    # covariance eigendecomposition matches numpy on the same data
    cov = np.cov(x, rowvar=False, bias=True)
    w_np = np.linalg.eigh(cov)[0][::-1]
    np.testing.assert_allclose(fit["eigvals"], np.maximum(w_np, 0),
                               rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(fit["mean"], x.mean(axis=0), rtol=1e-10)


def test_projection_matches_numpy_and_preserves_geometry(spark):
    x = _lowrank(noise=1e-4)
    df = _df(spark, x)
    fit = pca_fit(df, x.shape[1])
    k = 3
    proj = (
        pca_project(df, fit["mean"], fit["components"], k)
        .orderBy("vec_id")
        .toPandas()
    )
    p = np.asarray([list(v) for v in proj["proj"]])
    want = (x - fit["mean"]) @ fit["components"][:, :k]
    np.testing.assert_allclose(p, want, rtol=1e-8, atol=1e-10)
    # rank-3 data: pairwise distances survive the 12 -> 3 truncation
    d_full = np.linalg.norm(x[:50, None] - x[None, :50], axis=2)
    d_proj = np.linalg.norm(p[:50, None] - p[None, :50], axis=2)
    np.testing.assert_allclose(d_proj, d_full, rtol=1e-2, atol=1e-2)


def test_jacobi_schedule_is_a_proper_round_robin():
    """Every unordered pair exactly once per dim-1 rounds; pairs
    within a round are disjoint (the parallel-rotation precondition)."""
    d = 64
    seen = set()
    for r in range(d - 1):
        pairs = jacobi_schedule(r, d)
        flat = [i for pq in pairs for i in pq]
        assert len(flat) == len(set(flat)) == d  # disjoint, all indices
        for pq in pairs:
            assert pq not in seen
            seen.add(pq)
    assert len(seen) == d * (d - 1) // 2


def test_jacobi_eigvals_match_lapack():
    """Fixed-schedule parallel Jacobi reaches eigh parity — on a
    FLAT spectrum (the regime that rejects power iteration) and on a
    gapped one."""
    rng = np.random.RandomState(3)
    for scale in (1.0, 1e7):
        m = rng.normal(size=(64, 64))
        a = np.floor((m + m.T) * scale)  # symmetric, integer-valued
        got = np.sort(jacobi_eigvals(a, JACOBI_SWEEPS * 63))[::-1]
        want = np.sort(np.linalg.eigvalsh(a))[::-1]
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-9 * scale)


def test_exact_moments_match_bruteforce_ints(spark):
    """exact_embedding_moments = the same integers a single-threaded
    brute-force quantization computes, at any partitioning. Input
    normalized to |v| ≤ 1 — the checked precondition of the int64
    overflow bound (ADVICE r12)."""
    x = _lowrank(n=97, dim=5)
    x = x / np.abs(x).max()
    scale = 1 << 21
    q = np.floor(x * scale + 0.5).astype(np.int64)
    for parts in (1, 7):
        rows = exact_embedding_moments(
            _df(spark, x, parts=parts), x.shape[1], scale
        ).collect()
        got = {(r["i"], r["j"]): r["s"] for r in rows}
        assert got[(-1, -1)] == len(x)
        for i in range(x.shape[1]):
            assert got[(i, -1)] == int(q[:, i].sum())
            for j in range(i, x.shape[1]):
                assert got[(i, j)] == int(
                    (q[:, i].astype(object) * q[:, j].astype(object)).sum()
                )


def test_pca_quantization_honesty(spark):
    """The declared query's quantized-Jacobi eigenvalues track the
    float-precision eigh of the TRUE covariance: quantization at
    2²¹/2³⁰ costs ≲1e-4 relative on the top-8 spectrum."""
    from trendengine_spark.queries import REGISTRY

    sf = "/root/testdata/sf0.001"
    ev = (
        REGISTRY["sim_pca_explained_variance"].fn(spark, sf).collect()
    )
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    x = np.asarray(
        [list(v) for v in emb.toPandas()["embedding"]], dtype=np.float64
    )
    cov = np.cov(x, rowvar=False, bias=True)
    want = np.sort(np.linalg.eigvalsh(cov))[::-1][:8]
    got = np.array([r["eigval"] for r in ev])
    np.testing.assert_allclose(got, want, rtol=1e-4)
    tot = float(np.trace(cov))
    np.testing.assert_allclose(
        [r["explained"] for r in ev], want / tot, rtol=1e-3
    )


def test_declared_pca_queries(spark):
    from trendengine_spark.queries import REGISTRY

    cov = (
        REGISTRY["sim_embedding_covariance"]
        .fn(spark, "/root/testdata/sf0.001")
        .collect()
    )
    assert len(cov) == 64 * 65 // 2
    diag = {r["i"]: r["cov"] for r in cov if r["i"] == r["j"]}
    assert all(v >= 0 for v in diag.values())  # variances
    ev = (
        REGISTRY["sim_pca_explained_variance"]
        .fn(spark, "/root/testdata/sf0.001")
        .collect()
    )
    assert len(ev) == 8
    assert all(
        ev[k]["eigval"] >= ev[k + 1]["eigval"] for k in range(7)
    )
    assert 0 < ev[-1]["cum_explained"] <= 1.0


def test_online_pca_stream_matches_batch(spark, tmp_path):
    """Streaming moment accumulation + per-batch eigh equals the
    batch fit over the same rows (multi-microbatch)."""
    from trendengine_spark.streaming.online_model import online_pca

    x = _lowrank(n=300, noise=1e-3)
    df = _df(spark, x, parts=3)
    src = str(tmp_path / "emb")
    df.write.parquet(src)

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    seen = []
    q = online_pca(
        stream,
        x.shape[1],
        on_update=lambda bid, fit: seen.append((bid, fit)),
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(180)

    assert len(seen) >= 2
    final = seen[-1][1]
    batch = pca_fit(df, x.shape[1])
    assert final["n"] == batch["n"] == len(x)
    np.testing.assert_allclose(final["mean"], batch["mean"],
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(final["eigvals"], batch["eigvals"],
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(
        np.abs(final["components"][:, :3]),
        np.abs(batch["components"][:, :3]),
        atol=1e-7,
    )


def test_whitened_projection_unit_variance(spark):
    x = _lowrank(n=500, rank=3, noise=0.05)
    df = _df(spark, x)
    fit = pca_fit(df, x.shape[1])
    k = 3
    proj = (
        pca_project(
            df, fit["mean"], fit["components"], k, eigvals=fit["eigvals"]
        )
        .orderBy("vec_id")
        .toPandas()
    )
    p = np.asarray([list(v) for v in proj["proj"]])
    # whitened components have unit variance and are decorrelated
    cov = np.cov(p, rowvar=False, bias=True)
    np.testing.assert_allclose(cov, np.eye(k), atol=1e-6)


def test_jacobi_schedule_rejects_odd_dim():
    """ADVICE r12: inv2 = (m+1)//2 inverts 2 mod m only for odd m =
    dim-1 — odd dim must raise, not silently mis-pair."""
    with pytest.raises(ValueError, match="even dim"):
        jacobi_schedule(0, 63)
    jacobi_schedule(0, 64)  # even dim fine


def test_exact_moments_guard_rails(spark):
    """ADVICE r12: the overflow preconditions are real exceptions —
    |v| ≤ 1 is checked per batch, n·scale² < 2⁶² per partition, and
    check_moment_headroom covers the cross-partition sum."""
    from trendengine_spark.operators.pca import check_moment_headroom

    x = np.full((4, 4), 3.0)  # |v| > 1: breaks the n·scale² bound
    with pytest.raises(Exception, match="overflow bound"):
        exact_embedding_moments(_df(spark, x, parts=1), 4, 1 << 21).collect()
    x2 = np.full((8, 2), 0.5)  # 8 · (2³⁰)² = 2⁶³ ≥ 2⁶²
    with pytest.raises(Exception, match="split-accumulate"):
        exact_embedding_moments(_df(spark, x2, parts=1), 2, 1 << 30).collect()
    with pytest.raises(ValueError, match="wrap int64"):
        check_moment_headroom(1 << 21, 1 << 21)
    check_moment_headroom(1 << 19, 1 << 21)  # inside the ceiling


def test_pca_oracle_round_parity_low_rounds():
    """ADVICE r12 (the off-by-one): the DuckDB twin at rounds=R must
    bit-match jacobi_eigvals at R rounds AWAY from the converged
    regime — the old guard ran R-1 rotations and was masked only
    because round 630 was a numerical no-op after convergence."""
    import duckdb

    from trendengine_spark.queries.ml import (
        _PCA_P,
        _pca_duck_sql,
        _pca_matrix,
        _pca_top8,
    )

    pq = "/root/testdata/sf0.001/embeddings.parquet"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{pq}')"
    )
    # python twin from the same parquet: pure-numpy exact-int moments
    emb = con.execute("SELECT embedding FROM embeddings").fetchall()
    x = np.asarray([list(r[0]) for r in emb], dtype=np.float64)
    q = np.floor(x * _PCA_P + 0.5).astype(np.int64)
    n, d = q.shape
    sg = q.T @ q  # exact at this corpus size
    sv = q.sum(axis=0)
    rows = [{"i": -1, "j": -1, "s": n}]
    rows += [{"i": i, "j": -1, "s": int(sv[i])} for i in range(d)]
    rows += [
        {"i": i, "j": j, "s": int(sg[i, j])}
        for i in range(d)
        for j in range(i, d)
    ]
    a0, trace_int, _ = _pca_matrix(rows)
    for rounds in (1, 5):
        want = _pca_top8(a0, trace_int, rounds)
        got = sorted(con.execute(_pca_duck_sql(rounds=rounds)).fetchall())
        assert len(got) == 8
        for w, g in zip(want, got):
            assert int(g[0]) == w[0]
            assert g[1] == w[1], (rounds, g, w)  # bit-for-bit
            assert g[2] == w[2]
            assert g[3] == w[3]


def test_pca_rounds_certified():
    """_PCA_ROUNDS (8 sweeps, r13) is certified: the top-8 readout is
    bit-identical to the 10-sweep JACOBI_SWEEPS reference on the
    driver corpus — the round cut changes oracle COST only."""
    import duckdb

    from trendengine_spark.queries.ml import (
        _PCA_P,
        _PCA_ROUNDS,
        _pca_matrix,
        _pca_top8,
    )

    pq = "/root/testdata/sf0.001/embeddings.parquet"
    emb = duckdb.sql(
        f"SELECT embedding FROM read_parquet('{pq}')"
    ).fetchall()
    x = np.asarray([list(r[0]) for r in emb], dtype=np.float64)
    q = np.floor(x * _PCA_P + 0.5).astype(np.int64)
    n, d = q.shape
    sg = q.T @ q
    sv = q.sum(axis=0)
    rows = [{"i": -1, "j": -1, "s": n}]
    rows += [{"i": i, "j": -1, "s": int(sv[i])} for i in range(d)]
    rows += [
        {"i": i, "j": j, "s": int(sg[i, j])}
        for i in range(d)
        for j in range(i, d)
    ]
    a0, tr, _ = _pca_matrix(rows)
    assert _pca_top8(a0, tr, _PCA_ROUNDS) == _pca_top8(
        a0, tr, 63 * JACOBI_SWEEPS
    )
