"""Semantic decontamination (`operators/similarity.semantic_decontaminate`)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from trendengine_spark.operators.similarity import semantic_decontaminate


def _dfs(spark, n_train=80, n_eval=10, n_leak=6, dim=16):
    rng = np.random.RandomState(13)
    ev = rng.normal(size=(n_eval, dim))
    tr = rng.normal(size=(n_train, dim))
    # plant leaked eval items into train (paraphrase = tiny noise)
    for i in range(n_leak):
        tr[i] = ev[i] + 1e-4 * rng.normal(size=dim)
    mk = lambda x, off: spark.createDataFrame(
        pd.DataFrame(
            {"vec_id": np.arange(len(x)) + off,
             "embedding": [list(v) for v in x]}
        )
    )
    return mk(tr, 0), mk(ev, 10_000), n_leak


def test_planted_leaks_removed_clean_kept(spark):
    train, eval_df, n_leak = _dfs(spark)
    matches, survivors = semantic_decontaminate(
        train, eval_df, threshold=0.99, dim=16
    )
    m = matches.toPandas()
    surv = {r["vec_id"] for r in survivors.collect()}
    # every planted leak matched its eval source and was dropped
    for i in range(n_leak):
        assert ((m.train_id == i) & (m.eval_id == 10_000 + i)).any()
        assert i not in surv
    # random gaussians are not near-dups: no clean row dropped
    assert surv == set(range(n_leak, 80))


def test_adaptive_cut_drops_most_similar_first(spark):
    train, eval_df, n_leak = _dfs(spark)
    _, survivors = semantic_decontaminate(
        train, eval_df, threshold=None, dim=16, drop_quantile=0.95
    )
    surv = {r["vec_id"] for r in survivors.collect()}
    # the adaptive cut lands inside the leak-similarity cluster
    # (quantile interpolation): what it guarantees is PRECISION —
    # everything dropped is a planted leak, and some leak is dropped
    dropped = set(range(80)) - surv
    assert dropped and dropped <= set(range(n_leak))


def test_declared_query_conserves_counts(spark):
    from trendengine_spark.queries import REGISTRY

    rows = (
        REGISTRY["pipeline_semantic_decontaminate"]
        .fn(spark, "/root/testdata/sf0.001")
        .collect()
    )
    assert rows and all(r["label"] != 0 for r in rows)
    for r in rows:
        assert r["n_train"] == r["n_contaminated"] + r["n_survivors"]
    assert sum(r["n_contaminated"] for r in rows) > 0  # adaptive bites


def test_streaming_decon_admits_only_clean_and_replays_safely(
    spark, tmp_path
):
    """Microbatches of train vectors stream past a static eval set:
    planted leaks never reach the admitted corpus, clean rows all do,
    and restarting the drained stream admits nothing twice."""
    import numpy as np
    import pandas as pd

    from trendengine_spark.streaming.decon_pipeline import decon_stream
    from trendengine_spark.tablelog import read_versioned

    rng = np.random.RandomState(44)
    dim, n_eval, n_clean, n_leak = 16, 8, 40, 5
    ev = rng.normal(size=(n_eval, dim))
    tr = rng.normal(size=(n_clean + n_leak, dim))
    for i in range(n_leak):
        tr[i] = ev[i] + 1e-4 * rng.normal(size=dim)
    eval_df = spark.createDataFrame(
        pd.DataFrame(
            {"vec_id": np.arange(n_eval) + 10_000,
             "embedding": [list(v) for v in ev]}
        )
    )
    src = str(tmp_path / "train_stream")
    spark.createDataFrame(
        pd.DataFrame(
            {"vec_id": np.arange(len(tr)),
             "embedding": [list(v) for v in tr]}
        )
    ).repartition(3).write.parquet(src)

    corpus = str(tmp_path / "admitted")
    ckpt = str(tmp_path / "ckpt")

    def run():
        stream = (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = decon_stream(
            stream, eval_df, corpus, threshold=0.99, checkpoint=ckpt,
            dim=16,
        )
        q.awaitTermination(180)

    run()
    admitted = {r["vec_id"] for r in read_versioned(spark, corpus).collect()}
    assert admitted == set(range(n_leak, n_clean + n_leak))
    # restart: checkpoint drained — nothing new admitted, no dup rows
    run()
    again = [r["vec_id"] for r in read_versioned(spark, corpus).collect()]
    assert sorted(again) == sorted(admitted)


def test_md5_family_planted_leaks_removed(spark):
    """The r12 oracle family (md5 planes + quantized verify +
    exact-rank cut) keeps the detection contract: planted leaks
    matched and dropped, clean rows kept."""
    train, eval_df, n_leak = _dfs(spark)
    matches, survivors = semantic_decontaminate(
        train, eval_df, threshold=0.99, dim=16, family="md5"
    )
    m = matches.toPandas()
    surv = {r["vec_id"] for r in survivors.collect()}
    for i in range(n_leak):
        assert ((m.train_id == i) & (m.eval_id == 10_000 + i)).any()
        assert i not in surv
    assert surv == set(range(n_leak, 80))


def test_md5_exact_rank_gate_paths_equal(spark, monkeypatch):
    """Forcing the above-gate exact sort path yields the same matches
    and survivors as the lossless GK path (both exact rank cuts)."""
    import trendengine_spark.operators.util as util

    train, eval_df, _ = _dfs(spark)
    m1, s1 = semantic_decontaminate(
        train, eval_df, threshold=None, dim=16, family="md5"
    )
    a = ({tuple(r) for r in m1.collect()}, {r["vec_id"] for r in s1.collect()})
    monkeypatch.setattr(util, "GK_LOSSLESS_GATE", 1)
    m2, s2 = semantic_decontaminate(
        train, eval_df, threshold=None, dim=16, family="md5"
    )
    b = ({tuple(r) for r in m2.collect()}, {r["vec_id"] for r in s2.collect()})
    assert a == b


def test_adaptive_planes_per_band_derivation():
    """r13 (VERDICT r12 #1): the LSH selectivity knob scales with
    log2(corpus) — smallest p with 2^p >= n, clamped to [8, 24] —
    exactly the integer shift-compare the DuckDB oracles transcribe."""
    from trendengine_spark.operators.similarity import (
        adaptive_planes_per_band as appb,
    )

    assert appb(0) == appb(1) == appb(256) == 8  # lo clamp
    assert appb(500) == 9  # the sf0.01 embeddings corpus
    assert appb(512) == 9  # exact power: 2^9 >= 512
    assert appb(513) == 10
    assert appb(2_000) == 11  # sf0.1
    assert appb(200_000) == 18  # the sf10 design point
    assert appb(1 << 24) == 24
    assert appb(10**9) == 24  # hi clamp
