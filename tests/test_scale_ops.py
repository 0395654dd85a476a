"""Scale-story operators: salted join equivalence, dedup cluster
connected components, bucketed-write exchange elision."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from trendengine_spark.operators.dedup import dedup_clusters
from trendengine_spark.operators.relational import salted_join
from trendengine_spark.sinks import write_bucketed


def test_salted_join_matches_plain_join(spark):
    left = spark.createDataFrame(
        pd.DataFrame({"k": [1] * 50 + [2] * 3 + [3] * 2, "v": range(55)})
    )
    right = spark.createDataFrame(
        pd.DataFrame({"k": [1, 2, 4], "name": ["a", "b", "d"]})
    )
    plain = (
        left.join(right, "k").groupBy("k", "name").agg(F.sum("v").alias("s")).toPandas()
    )
    salted = (
        salted_join(left, right, "k", salt_buckets=8)
        .groupBy("k", "name")
        .agg(F.sum("v").alias("s"))
        .toPandas()
    )
    assert plain.sort_values("k").reset_index(drop=True).equals(
        salted.sort_values("k").reset_index(drop=True)
    )


def test_dedup_clusters_components(spark):
    # components: {1,2,3} via chained pairs, {10,11}, singletons absent
    pairs = spark.createDataFrame(
        pd.DataFrame({"id_a": [1, 2, 10], "id_b": [2, 3, 11]})
    )
    out = dedup_clusters(pairs).toPandas().set_index("id")["cluster_id"].to_dict()
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_dedup_clusters_long_chain_converges(spark):
    # a 12-node path graph needs multiple propagation rounds
    pairs = spark.createDataFrame(
        pd.DataFrame({"id_a": list(range(11)), "id_b": list(range(1, 12))})
    )
    out = dedup_clusters(pairs).toPandas()
    assert set(out["cluster_id"]) == {0}
    assert len(out) == 12


def test_bucketed_write_elides_exchange(spark):
    # warehouse dir is a static conf — the default ./spark-warehouse is
    # used and the table dropped afterwards (dir is gitignored)
    df = spark.range(10000).withColumn("k", (F.col("id") % 100).cast("long"))
    write_bucketed(df, "bucketed_t", ["k"], num_buckets=8)
    try:
        t1 = spark.table("bucketed_t")
        agg_plan = (
            t1.groupBy("k").count()._jdf.queryExecution().executedPlan().toString()
        )
        # aggregation on the bucket key must not shuffle
        assert "Exchange" not in agg_plan, agg_plan[:500]
    finally:
        spark.sql("DROP TABLE IF EXISTS bucketed_t")


def test_salted_join_rejects_replication_unsafe_how(spark):
    import pytest

    left = spark.createDataFrame(pd.DataFrame({"k": [1], "v": [1]}))
    right = spark.createDataFrame(pd.DataFrame({"k": [2], "name": ["x"]}))
    for how in ("right", "full", "left_semi", "left_anti"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(left, right, "k", how=how)


def test_owned_caches_bounded_across_invocations(spark):
    """Re-invoking cache-backed dedup/similarity operators must not
    grow the JVM persistent-RDD set: each owned_cache key replaces its
    previous epoch (VERDICT r3 leak / r4 localCheckpoint regression)."""
    import pandas as pd

    from trendengine_spark.operators.dedup import (
        minhash_lsh_pairs,
        simhash_near_pairs,
    )

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": list(range(40)),
                "text": [
                    f"the quick brown fox jumps over dog {i} " * 3
                    for i in range(40)
                ],
            }
        )
    )

    def n_persistent() -> int:
        return spark.sparkContext._jsc.sc().getPersistentRDDs().size()

    # drain entries left by earlier tests SYNCHRONOUSLY: owned_cache's
    # own replacement unpersists non-blocking, so a stale async removal
    # completing mid-test would otherwise shift the baseline count
    pool = getattr(spark.sparkContext, "_te_owned_caches", None) or {}
    for key in list(pool):
        pool.pop(key).unpersist(blocking=True)

    minhash_lsh_pairs(docs, threshold=0.1).count()
    simhash_near_pairs(docs).count()
    after_first = n_persistent()
    minhash_lsh_pairs(docs, threshold=0.1).count()
    simhash_near_pairs(docs).count()
    # owned_cache replaces its previous epoch with a NON-blocking
    # unpersist, so the old entry may linger briefly — poll until the
    # async removal lands, then assert the set did not grow
    import time

    deadline = time.time() + 20
    while time.time() < deadline and n_persistent() > after_first:
        time.sleep(0.2)
    assert n_persistent() <= after_first
