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


def test_bucketed_join_elides_exchange(spark):
    """r15 (VERDICT r14 #4): the q18/q21 posture — a fact bucketed on
    its join key serves repeated equi-joins and aggregations with ZERO
    Exchange nodes. This pins the engine's 100 TB answer for the
    fact-key family (the r14 probe record: q21's four joins ran 3.60 s
    bucketed vs 21.7-29.3 s plain at sf10) as a plan property, not a
    probe memory. Broadcast is disabled for the assertion so the join
    must rely on the bucketed layout, not on a small-side shortcut."""
    df = spark.range(20000).withColumn(
        "k", (F.col("id") % 100).cast("long")
    ).withColumn("q", (F.col("id") % 7).cast("long"))
    write_bucketed(df, "bucketed_j", ["k"], num_buckets=8, sort_cols=["k"])
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        t1 = spark.table("bucketed_j")
        # q21 shape: self-join on the bucket key (base + EXISTS-like
        # second reference), then the q18 per-key roll-up on top
        agg = (
            t1.alias("a")
            .join(t1.alias("b"), "k")
            .groupBy("k")
            .agg(F.sum(F.col("a.q") + F.col("b.q")).alias("s"))
        )
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:800]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bucketed_j")


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


def test_asof_join_matches_pandas_merge_asof_randomized(spark):
    """asof_join vs pandas.merge_asof (the de-facto reference) on
    seeded random data, all three directions, with and without
    tolerance."""
    import numpy as np
    import pandas as pd

    from trendengine_spark.operators.relational import asof_join

    for seed in (0, 1, 2):
        rng = np.random.RandomState(seed)
        nl, nr = 120, 90
        left = pd.DataFrame(
            {
                "k": rng.randint(0, 5, nl),
                "t": pd.to_datetime("2024-01-01")
                + pd.to_timedelta(rng.randint(0, 100_000, nl), unit="s"),
                "lid": np.arange(nl),
            }
        )
        right = pd.DataFrame(
            {
                "k": rng.randint(0, 5, nr),
                "rt": pd.to_datetime("2024-01-01")
                + pd.to_timedelta(rng.randint(0, 100_000, nr), unit="s"),
                "pay": rng.randint(0, 1_000_000, nr).astype("int64"),
            }
        )
        sl = spark.createDataFrame(left)
        sr = spark.createDataFrame(right)
        for direction in ("backward", "forward", "nearest"):
            for tol in (None, 3600.0):
                got = (
                    asof_join(
                        sl, sr, on="k", left_ts="t", right_ts="rt",
                        direction=direction, tolerance=tol,
                    )
                    .toPandas()
                    .sort_values("lid")
                    .reset_index(drop=True)
                )
                want = pd.merge_asof(
                    left.sort_values("t"),
                    right.sort_values("rt"),
                    left_on="t",
                    right_on="rt",
                    by="k",
                    direction=direction,
                    tolerance=(
                        None if tol is None else pd.Timedelta(seconds=tol)
                    ),
                ).sort_values("lid").reset_index(drop=True)
                g = got["pay"].astype("float64")
                w = want["pay"].astype("float64")
                mism = (g.fillna(-1) != w.fillna(-1))
                assert not mism.any(), (
                    seed, direction, tol,
                    got[mism].head().to_dict(),
                    want[mism].head().to_dict(),
                )


def test_trailing_range_aggs_randomized(spark):
    """Halo-partitioned trailing aggregates vs the naive global window
    on seeded random ints (negatives included, duplicates likely)."""
    import numpy as np
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from trendengine_spark.operators.relational import trailing_range_aggs

    for seed in (7, 8):
        rng = np.random.RandomState(seed)
        vals = rng.randint(-300, 300, 400)
        df = spark.createDataFrame(
            [(int(i), int(v)) for i, v in enumerate(vals)],
            schema="id int, v int",
        )
        got = {
            r["id"]: r["n"]
            for r in trailing_range_aggs(
                df, "v", {"n": F.count(F.lit(1))}, lookback=13, bucket_width=64
            ).collect()
        }
        w = Window.orderBy("v").rangeBetween(-13, 0)
        want = {
            r["id"]: r["n"]
            for r in df.select("id", F.count(F.lit(1)).over(w).alias("n")).collect()
        }
        assert got == want, seed


def test_ntile_global_randomized(spark):
    """Arithmetic global ntile vs the naive window on seeded random
    doubles with duplicates, across several n."""
    import numpy as np
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from trendengine_spark.operators.relational import ntile_global

    rng = np.random.RandomState(11)
    vals = rng.randint(0, 40, 250).astype(float)
    df = spark.createDataFrame(
        [(int(i), float(v)) for i, v in enumerate(vals)],
        schema="id int, v double",
    )
    for n in (3, 8, 11):
        got = {
            r["id"]: r["b"]
            for r in ntile_global(df, ["v", "id"], n, out_col="b").collect()
        }
        w = Window.orderBy("v", "id")
        want = {
            r["id"]: r["b"]
            for r in df.select("id", F.ntile(n).over(w).alias("b")).collect()
        }
        assert got == want, n


def test_khop_frontiers_exact_levels(spark):
    """BFS levels on a hand-built graph: each node reported at its
    shortest distance only; unreachable nodes absent; the 2-hop query
    shape is the k=2 case of this operator."""
    import pandas as pd

    from trendengine_spark.operators.graph import khop_frontiers

    # 0→1→2→3→4 chain, plus shortcut 0→2 and a cycle 3→0, island 9→10
    edges = spark.createDataFrame(
        pd.DataFrame(
            {"a": [0, 1, 2, 3, 0, 9], "b": [1, 2, 3, 4, 2, 10]}
        )
    )
    seed = spark.createDataFrame(pd.DataFrame({"k": [0]}))
    got = {
        (r["k"], r["hop"])
        for r in khop_frontiers(edges, seed, k=4, checkpoint_every=2).collect()
    }
    # 1 and 2 at hop 1 (0→1, 0→2 shortcut); 3 at hop 2; 4 at hop 3
    assert got == {(1, 1), (2, 1), (3, 2), (4, 3)}

    # consistency with the declared 2-hop query semantics
    h2 = {
        (r["k"], r["hop"])
        for r in khop_frontiers(edges, seed, k=2).collect()
    }
    assert h2 == {(1, 1), (2, 1), (3, 2)}
