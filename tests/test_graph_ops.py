


def test_label_propagation_separates_bridged_cliques(spark):
    """Two 6-cliques joined by ONE bridge edge: CC merges them into a
    single component; label propagation keeps two communities — the
    differentiator this operator exists for. Result must also be
    partitioning-invariant."""
    from trendengine_spark.operators.graph import label_propagation

    c1 = [(i, j) for i in range(6) for j in range(i + 1, 6)]
    c2 = [(10 + i, 10 + j) for i in range(6) for j in range(i + 1, 6)]
    bridge = [(5, 10)]
    edges = spark.createDataFrame(
        c1 + c2 + bridge, "src long, dst long"
    )
    out = {
        r["node"]: r["community"]
        for r in label_propagation(edges, iters=5).collect()
    }
    comm1 = {out[i] for i in range(6)}
    comm2 = {out[10 + i] for i in range(6)}
    assert len(comm1) == 1 and len(comm2) == 1
    assert comm1 != comm2  # the bridge did NOT flood the cliques
    # partitioning invariance
    out2 = {
        r["node"]: r["community"]
        for r in label_propagation(
            edges.repartition(13), iters=5
        ).collect()
    }
    assert out2 == out


def test_label_propagation_early_exit_is_fixpoint_identity(spark):
    """r10: early_exit stops only when a round changes NO label —
    synchronous LPA is then at a fixpoint, so the result must be
    bit-identical to running every declared round (and to a larger
    iters: rounds past convergence are the identity)."""
    from trendengine_spark.operators.graph import label_propagation

    c1 = [(i, j) for i in range(6) for j in range(i + 1, 6)]
    c2 = [(10 + i, 10 + j) for i in range(6) for j in range(i + 1, 6)]
    edges = spark.createDataFrame(
        c1 + c2 + [(5, 10)], "src long, dst long"
    )
    ref = {
        r["node"]: r["community"]
        for r in label_propagation(edges, iters=5, early_exit=False).collect()
    }
    fast = {
        r["node"]: r["community"]
        for r in label_propagation(edges, iters=5, early_exit=True).collect()
    }
    more = {
        r["node"]: r["community"]
        for r in label_propagation(edges, iters=9, early_exit=True).collect()
    }
    assert fast == ref == more


def test_label_propagation_checkpoint_cadence_identity(spark):
    """r12: checkpoint_every batches rounds into fewer jobs — a pure
    execution-shape knob. Labels must be identical for every cadence
    (1 = per-round, 2 = pairs, 5 = one job), on a graph that needs
    several rounds to converge."""
    from trendengine_spark.operators.graph import label_propagation

    c1 = [(i, j) for i in range(6) for j in range(i + 1, 6)]
    c2 = [(10 + i, 10 + j) for i in range(6) for j in range(i + 1, 6)]
    # chain of bridges so labels keep moving for a few rounds
    edges = spark.createDataFrame(
        c1 + c2 + [(5, 10), (11, 20), (20, 21), (21, 22)],
        "src long, dst long",
    )
    outs = [
        {
            r["node"]: r["community"]
            for r in label_propagation(
                edges, iters=5, early_exit=False, checkpoint_every=k
            ).collect()
        }
        for k in (1, 2, 5)
    ]
    assert outs[0] == outs[1] == outs[2]


def test_label_propagation_repartition_votes_identity(spark):
    """r14: repartition_votes pre-partitions the checkpointed edge
    table on the vote-join key — a pure execution-layout knob. Labels
    must be identical with it on/off, on a graph that converges over
    several rounds (same topology as the cadence test)."""
    from trendengine_spark.operators.graph import label_propagation

    c1 = [(i, j) for i in range(6) for j in range(i + 1, 6)]
    c2 = [(10 + i, 10 + j) for i in range(6) for j in range(i + 1, 6)]
    edges = spark.createDataFrame(
        c1 + c2 + [(5, 10), (11, 20), (20, 21), (21, 22)],
        "src long, dst long",
    )
    outs = [
        {
            r["node"]: r["community"]
            for r in label_propagation(
                edges, iters=5, early_exit=False, repartition_votes=rv
            ).collect()
        }
        for rv in (False, True)
    ]
    assert outs[0] == outs[1]


def test_label_propagation_isolated_pairs(spark):
    from trendengine_spark.operators.graph import label_propagation

    edges = spark.createDataFrame(
        [(1, 2), (3, 4)], "src long, dst long"
    )
    out = {
        r["node"]: r["community"]
        for r in label_propagation(edges, iters=3).collect()
    }
    assert out[1] == out[2] and out[3] == out[4]
    assert out[1] != out[3]


def test_modularity_scores_partitions(spark):
    """Bridged cliques: the LPA 2-community partition scores high
    modularity; the everything-in-one-community partition ~0; a
    random-ish split scores lower than the true one."""
    from pyspark.sql import functions as F

    from trendengine_spark.operators.graph import (
        label_propagation,
        modularity,
    )

    c1 = [(i, j) for i in range(6) for j in range(i + 1, 6)]
    c2 = [(10 + i, 10 + j) for i in range(6) for j in range(i + 1, 6)]
    edges = spark.createDataFrame(
        c1 + c2 + [(5, 10)], "src long, dst long"
    )
    lpa = label_propagation(edges, iters=5)
    q_lpa = modularity(edges, lpa)
    assert 0.4 < q_lpa < 0.5  # 2 cliques + 1 bridge: Q ~ 0.467
    one = lpa.select("node").withColumn("community", F.lit(0))
    assert abs(modularity(edges, one)) < 1e-9
    parity = lpa.select(
        "node", (F.col("node") % 2).alias("community")
    )
    assert modularity(edges, parity) < q_lpa
