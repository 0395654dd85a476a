"""PCA truncation vs naive truncation on an anisotropic corpus.

The controlled experiment the synthetic (isotropic) embeddings table
cannot express: 50k 64-d vectors with a planted rank-8 latent
structure (plus 2% noise). Ground truth = exact cosine top-10 in the
full 64-d space. Compare recall@10 of searching in (a) the 8-dim PCA
projection (fit + project fully distributed — one moment pass, one
broadcast-matmul map) and (b) the first 8 raw coordinates (what
truncation without rotation gives you). Expected: PCA ≈ 1.0, naive
well below — the measured case for running the rotation before any
dimensionality-reduced ANN.

Usage: python tools/stress_pca.py [n_thousands]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession

from trendengine_spark.operators.pca import pca_fit, pca_project


def topk(mat: np.ndarray, queries: np.ndarray, k: int) -> np.ndarray:
    m = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    q = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    s = q @ m.T
    return np.argsort(-s, axis=1)[:, :k]


def main() -> None:
    n = int(sys.argv[1]) * 1000 if len(sys.argv) > 1 else 50_000
    dim, rank, k, n_q = 64, 8, 10, 20
    rng = np.random.RandomState(17)
    w = rng.normal(size=(rank, dim))
    z = rng.normal(size=(n, rank))
    x = z @ w + 0.02 * rng.normal(size=(n, dim))

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .appName("stress-pca")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.createDataFrame(
        pd.DataFrame(
            {"vec_id": np.arange(n), "embedding": x.tolist()}
        ),
        schema="vec_id long, embedding array<double>",
    ).repartition(32)

    t0 = time.time()
    fit = pca_fit(df, dim)
    t_fit = time.time() - t0
    t0 = time.time()
    proj = (
        pca_project(df, fit["mean"], fit["components"], rank)
        .orderBy("vec_id")
        .toPandas()
    )
    t_proj = time.time() - t0
    p = np.asarray([list(v) for v in proj["proj"]])

    q_idx = np.arange(0, n, n // n_q)[:n_q]
    truth = topk(x, x[q_idx], k)
    got_pca = topk(p, p[q_idx], k)
    got_naive = topk(x[:, :rank], x[q_idx, :rank], k)
    r_pca = np.mean(
        [len(set(a) & set(b)) / k for a, b in zip(truth, got_pca)]
    )
    r_naive = np.mean(
        [len(set(a) & set(b)) / k for a, b in zip(truth, got_naive)]
    )
    print(
        f"n={n:,} dim={dim} rank={rank}  fit={t_fit:.1f}s "
        f"project={t_proj:.1f}s  explained(top8)="
        f"{fit['explained'][:rank].sum():.4f}  "
        f"recall@10: pca-{rank}d={r_pca:.3f}  "
        f"naive-first-{rank}-coords={r_naive:.3f}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
