"""Distributed PCA over embedding columns — the dimensionality
half of the similarity toolbox (whitening / truncation before ANN,
the rotation step of OPQ-style quantization).

Same architecture as the exact-Gram linear fit
(:mod:`.linmodel`), transposed to array columns: the covariance of a
d-dim embedding corpus is determined by the d(d+1)/2 + d + 1 moment
sums, and those are computed in ONE corpus pass — each partition
folds its Arrow batches into a local d×d matrix with BLAS
(``X.T @ X``), emits the matrix as (i, j, partial) rows, and a single
partial+final aggregate reduces across partitions. Data crossing the
shuffle: O(partitions · d²) numbers, independent of row count. The
d×d eigendecomposition runs driver-side (`numpy.linalg.eigh` on the
symmetric covariance); projection is one BLAS matmul per Arrow batch
(`mapInPandas`) with the (mean, components) broadcast.

At 100 TB nothing changes: the moment pass is the same shape as any
partial-aggregated SUM, the driver state is d², and the projection is
a map. d is bounded by embedding width (10²-10⁴) — for d where d²
no longer fits a driver (10⁵+), you'd switch to randomized sketching,
out of scope here.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["embedding_moments", "pca_fit", "fit_from_moment_rows", "pca_project"]


def embedding_moments(
    df: DataFrame, dim: int, vec_col: str = "embedding"
) -> DataFrame:
    """Second-moment sums of an array column in one pass.

    Output rows: ``(i, j, s)`` with ``i ≤ j`` → ``Σ v[i]·v[j]``;
    ``(i, -1, s)`` → ``Σ v[i]``; ``(-1, -1, n)`` → row count. One
    partial d×d matrix per partition crosses the shuffle — never the
    vectors.
    """
    schema = T.StructType(
        [
            T.StructField("i", T.IntegerType()),
            T.StructField("j", T.IntegerType()),
            T.StructField("s", T.DoubleType()),
        ]
    )
    iu = np.triu_indices(dim)

    def gen(batches):
        import pandas as pd

        g = np.zeros((dim, dim))
        m = np.zeros(dim)
        n = 0
        for pdf in batches:
            if pdf.empty:
                continue
            x = np.asarray([list(v) for v in pdf[vec_col]], dtype=np.float64)
            g += x.T @ x
            m += x.sum(axis=0)
            n += len(x)
        if n == 0:
            return
        yield pd.DataFrame(
            {
                "i": np.concatenate(
                    [iu[0], np.arange(dim), [-1]]
                ).astype("int32"),
                "j": np.concatenate(
                    [iu[1], np.full(dim, -1), [-1]]
                ).astype("int32"),
                "s": np.concatenate([g[iu], m, [float(n)]]),
            }
        )

    return (
        df.select(vec_col)
        .mapInPandas(gen, schema)
        .groupBy("i", "j")
        .agg(F.sum("s").alias("s"))
    )


def pca_fit(
    df: DataFrame, dim: int, vec_col: str = "embedding"
) -> dict:
    """Fit PCA from one distributed moment pass.

    Returns ``{"mean": (d,), "components": (d, d) columns =
    eigenvectors in DESCENDING eigenvalue order, "eigvals": (d,),
    "explained": (d,) variance ratios, "n": int}``. Driver state and
    compute: d² — the corpus is touched exactly once.
    """
    rows = embedding_moments(df, dim, vec_col).collect()
    return fit_from_moment_rows(rows, dim)


def fit_from_moment_rows(rows, dim: int) -> dict:
    """Driver-side PCA solve from collected moment rows — shared by
    the batch fit and the streaming accumulator (the moments are
    algebraic, so a streaming group-by maintains them and this solve
    turns any snapshot into a model)."""
    g = np.zeros((dim, dim))
    m = np.zeros(dim)
    n = 0.0
    for r in rows:
        i, j, s = r["i"], r["j"], r["s"]
        if i == -1:
            n = s
        elif j == -1:
            m[i] = s
        else:
            g[i, j] = s
            g[j, i] = s
    if n < 2:
        raise ValueError("PCA needs at least 2 rows")
    mean = m / n
    cov = g / n - np.outer(mean, mean)
    w, v = np.linalg.eigh(cov)  # ascending
    order = np.argsort(w)[::-1]
    w = np.maximum(w[order], 0.0)
    v = v[:, order]
    # deterministic sign: largest-|component| entry of each vector > 0
    for k in range(dim):
        a = np.argmax(np.abs(v[:, k]))
        if v[a, k] < 0:
            v[:, k] = -v[:, k]
    tot = float(w.sum()) or 1.0
    return {
        "mean": mean,
        "components": v,
        "eigvals": w,
        "explained": w / tot,
        "n": int(n),
    }


def pca_project(
    df: DataFrame,
    mean: np.ndarray,
    components: np.ndarray,
    k: int,
    vec_col: str = "embedding",
    out_col: str = "proj",
    eigvals: np.ndarray | None = None,
) -> DataFrame:
    """Append the k-dim PCA projection (centered, rotated, truncated)
    as an ``array<double>`` column — one broadcast BLAS matmul per
    Arrow batch, schema otherwise preserved. Pass ``eigvals`` to
    WHITEN (scale each component to unit variance — the
    decorrelate-and-equalize preprocessing for Euclidean ANN and
    Mahalanobis-style outlier scores); components with ~zero variance
    are left unscaled rather than exploded."""
    comp = np.asarray(components)[:, :k]
    if eigvals is not None:
        ev = np.asarray(eigvals)[:k].copy()
        ev[ev < 1e-12] = 1.0  # degenerate directions: no rescale
        comp = comp / np.sqrt(ev)[None, :]
    sc = df.sparkSession.sparkContext
    bc = sc.broadcast((np.asarray(mean), comp))
    fields = [f for f in df.schema.fields]
    schema = T.StructType(
        fields + [T.StructField(out_col, T.ArrayType(T.DoubleType()))]
    )

    def gen(batches):
        mu, comp = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            x = np.asarray([list(v) for v in pdf[vec_col]], dtype=np.float64)
            p = (x - mu) @ comp
            pdf = pdf.copy()
            pdf[out_col] = list(p)
            yield pdf

    return df.mapInPandas(gen, schema)
