"""SemDeDup-style semantic dedup (`operators/dedup.semantic_dedup`)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from trendengine_spark.operators.dedup import semantic_dedup


def _corpus(spark, n_base=60, n_copies=12, dim=16, parts=5):
    """Deterministic base vectors + near-identical copies of the
    first n_copies bases (copy ids = 1000 + base id)."""
    rng = np.random.RandomState(5)
    base = rng.normal(size=(n_base, dim))
    rows = [(i, base[i].tolist()) for i in range(n_base)]
    for i in range(n_copies):
        v = base[i] + 1e-4 * rng.normal(size=dim)  # cos ~ 0.9999
        rows.append((1000 + i, v.tolist()))
    df = spark.createDataFrame(
        pd.DataFrame(
            {"vec_id": [r[0] for r in rows],
             "embedding": [r[1] for r in rows]}
        )
    )
    return df.repartition(parts), n_base, n_copies


def test_planted_copies_dropped_bases_survive(spark):
    df, n_base, n_copies = _corpus(spark)
    pairs, survivors = semantic_dedup(
        df, threshold=0.99, n_cells=6, iters=2
    )
    p = pairs.toPandas()
    surv = set(r["vec_id"] for r in survivors.collect())
    # every planted copy pairs with its base and is the dropped side
    for i in range(n_copies):
        hit = p[(p.id_a == i) & (p.id_b == 1000 + i)]
        assert len(hit) == 1, f"copy {i} not paired with its base"
        assert hit.cos_sim.iloc[0] > 0.999
        assert 1000 + i not in surv
        assert i in surv
    # conservation: survivors + dropped = corpus
    dropped = set(p.id_b.unique())
    assert len(surv) + len(dropped) == n_base + n_copies
    # random gaussian bases are not near-duplicates of each other
    assert not ((p.id_a < 1000) & (p.id_b < 1000)).any()


def test_block_path_equals_unblocked(spark):
    """Tiny block_rows forces the row-block matmul loop; pairs must
    be identical to the single-block run."""
    df, _, _ = _corpus(spark, parts=3)
    kw = dict(threshold=0.99, n_cells=4, iters=1)
    a = semantic_dedup(df, block_rows=4, **kw)[0].toPandas()
    b = semantic_dedup(df, block_rows=4096, **kw)[0].toPandas()
    key = ["id_a", "id_b"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_adaptive_cut_bounds_drop_fraction(spark):
    """threshold=None drops at most ~(1-q) of vectors (plus cell
    granularity slack) and never drops a vector with no neighbor."""
    df, n_base, n_copies = _corpus(spark)
    n = n_base + n_copies
    pairs, survivors = semantic_dedup(
        df, threshold=None, n_cells=6, drop_quantile=0.9
    )
    n_surv = survivors.count()
    dropped = n - n_surv
    assert 0 < dropped <= int(0.15 * n) + n_copies
    # the cut lands inside the copy-similarity cluster (the corpus's
    # most redundant vectors): everything dropped IS a planted copy,
    # and at least some copies are dropped — never a base
    surv = set(r["vec_id"] for r in survivors.collect())
    all_ids = set(range(n_base)) | {1000 + i for i in range(n_copies)}
    dropped_ids = all_ids - surv
    assert dropped_ids and all(d >= 1000 for d in dropped_ids)


def test_declared_query_shape(spark):
    from trendengine_spark.queries import REGISTRY

    rows = (
        REGISTRY["dedup_semantic_survivors"]
        .fn(spark, "/root/testdata/sf0.001")
        .collect()
    )
    assert rows
    for r in rows:
        assert r["n_vectors"] == r["n_dropped"] + r["n_survivors"]
        assert r["n_dropped"] >= 0
    assert sum(r["n_dropped"] for r in rows) > 0  # adaptive cut bites


def test_multiprobe_superset_and_boundary_recovery(spark):
    """assign_cells=2 finds at least every single-assignment pair and
    emits each pair once (deduped across shared cells)."""
    df, _, n_copies = _corpus(spark)
    kw = dict(threshold=0.99, n_cells=6, iters=2)
    p1 = semantic_dedup(df, **kw)[0].toPandas()
    p2 = semantic_dedup(df, assign_cells=2, **kw)[0].toPandas()
    k1 = set(zip(p1.id_a, p1.id_b))
    k2 = set(zip(p2.id_a, p2.id_b))
    assert k1 <= k2
    assert len(k2) == len(p2)  # no duplicate pair rows
    # all planted pairs present under multi-probe
    assert all((i, 1000 + i) in k2 for i in range(n_copies))


def test_tiny_corpus_no_crash(spark):
    """3 vectors, more cells than points, no pairs above threshold:
    every path (seeding, percentile-over-empty, survivors) stays
    total."""
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame(
            {"vec_id": [1, 2, 3],
             "embedding": [[1.0, 0.0], [0.0, 1.0], [-1.0, 0.0]]}
        )
    )
    pairs, surv = semantic_dedup(df, threshold=0.99, n_cells=8, iters=1)
    assert pairs.count() == 0
    assert surv.count() == 3
    pairs2, surv2 = semantic_dedup(df, threshold=None, n_cells=8, iters=1)
    assert surv2.count() >= 2  # adaptive on no-pair corpus drops nothing fatal
