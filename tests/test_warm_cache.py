"""Warm-cache (buffer pool) semantics: caching must never change results.

`tables.warm_cache` swaps the memoized scan plans for repartitioned,
cached ones; every query built afterwards reads the cache. These tests
pin the only property that matters: result sets are identical with and
without the cache, and the ctx_memo expression reuse underneath
produces stable plans across repeated builds in one session.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE as SF_DIR
from trendengine_spark.operators.util import ctx_memo
from trendengine_spark.queries import all_queries
from trendengine_spark.tables import clear_warm_cache, load_table, warm_cache

# a slice across plan shapes: scan+agg, join, window, session window,
# and the ctx_memo-backed minhash path
REPRESENTATIVE = [
    "tpch_q1_pricing_summary",
    "join_inner_3way",
    "window_topk_per_group",
    "stream_session_window",
    "dedup_minhash_lsh",
]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def cold_results(spark):
    qs = all_queries()
    return {n: _rows(qs[n](spark, SF_DIR)) for n in REPRESENTATIVE}


def test_warm_cache_results_identical(spark, cold_results):
    qs = all_queries()
    counts = warm_cache(spark, SF_DIR)
    try:
        assert counts["lineitem"] > 0
        for name in REPRESENTATIVE:
            assert _rows(qs[name](spark, SF_DIR)) == cold_results[name], name
    finally:
        clear_warm_cache(spark, SF_DIR)


def test_clear_warm_cache_restores_raw_scans(spark):
    from trendengine_spark.operators.util import fan_out

    warm_cache(spark, SF_DIR, names=("nation",))
    # r8 semantics: a cache-backed plan is skipped by DEFAULT (the
    # byte-sized cache partitioning is right for codegen/BLAS stages;
    # widening it costs a payload shuffle) but widened when the caller
    # declares a per-byte-Python stage (cpu_dense=True — the codec
    # paths); an un-warmed single-file scan still gets the
    # parallelism fix unconditionally
    warmed = load_table(spark, SF_DIR, "nation")
    from trendengine_spark.operators.util import _plan_num_partitions

    target = spark.sparkContext.defaultParallelism
    assert fan_out(warmed) is warmed
    assert _plan_num_partitions(
        fan_out(warmed, cpu_dense=True)
    ) >= min(target, 4)
    unwarmed = load_table(spark, SF_DIR, "documents")
    assert fan_out(unwarmed) is not unwarmed
    clear_warm_cache(spark, SF_DIR)
    # raw scan again (fresh plan, no InMemoryRelation)
    plan = load_table(spark, SF_DIR, "nation")._jdf.queryExecution()
    assert "InMemoryRelation" not in plan.analyzed().toString()


def test_ctx_memo_builds_once_and_is_reusable(spark):
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        from pyspark.sql import functions as F

        return [F.sum("x").alias("s")]

    a = ctx_memo(spark, "test.memo.exprs", build)
    b = ctx_memo(spark, "test.memo.exprs", build)
    assert a is b and calls["n"] == 1
    # the memoized aliased column mounts cleanly in two separate plans
    df = spark.createDataFrame([(1,), (2,)], ["x"])
    assert df.groupBy().agg(*a).collect()[0]["s"] == 3
    assert df.filter("x > 1").groupBy().agg(*a).collect()[0]["s"] == 2


def test_minhash_twice_same_session_same_result(spark):
    """The memoized 64-perm expression list must give identical
    signatures on repeated builds (exprId reuse across plans)."""
    qs = all_queries()
    r1 = _rows(qs["dedup_minhash_lsh"](spark, SF_DIR))
    r2 = _rows(qs["dedup_minhash_lsh"](spark, SF_DIR))
    assert r1 == r2


def test_fan_out_restores_parallelism_of_cache_derived_plans(spark):
    """r8: under cpu_dense=True, fan_out must widen (a) a cached
    input whose cache was built at byte-sized partitioning, and (b) a
    plan DERIVED from such a cache (select/filter — reports no input
    files); both previously passed through at 2-3 partitions and
    starved codec stages downstream (measured 4.1s vs 0.9s on the GIF
    stage in the bench session). Without the flag both are skipped
    (the extra payload shuffle measurably hurts vectorized stages:
    sim_cosine_topk 0.22s -> 0.40s)."""
    from pyspark.sql import functions as F

    from trendengine_spark.operators.util import (
        _plan_num_partitions as nparts,
        fan_out,
    )

    target = spark.sparkContext.defaultParallelism

    base = spark.range(10_000).repartition(2).cache()
    try:
        base.count()
        assert fan_out(base) is base  # default: cached skip holds
        assert nparts(fan_out(base, cpu_dense=True)) >= min(target, 4)
        derived = base.select((F.col("id") * 2).alias("x"))
        assert derived.inputFiles() == []
        assert fan_out(derived) is derived
        assert nparts(fan_out(derived, cpu_dense=True)) >= min(target, 4)
        # an already-wide plan is left alone (no pointless shuffle)
        wide = spark.range(10_000).repartition(target)
        assert fan_out(wide, cpu_dense=True) is wide
    finally:
        base.unpersist(blocking=False)
