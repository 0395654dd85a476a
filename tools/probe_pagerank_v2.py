"""Probe round 2 for graph_pagerank_micro (guide §2.3/§2.4):

A = current plan (oriented cache + union-flip)
B = symmetrized cache hash-partitioned on `a` (probe_pagerank_copart winner)
C = B + per-iteration pre-join: w = ranks ⋈ deg (|nodes| rows) joined
    ONCE to edges, instead of joining the edge table twice; nodes
    derived from deg (drops the separate distinct pass)
D = C + edge build via groupBy(order).collect_set + in-row pair
    generation instead of the lineitem self-join

All noop-sunk (§1.4), min-of-N warm with caches dropped between reps,
job-labeled (§1.5), result hashes compared (pure plan change).

Run: python tools/probe_pagerank_v2.py [sf_dir] [n_reps]
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def rank_two_joins(edges, deg, nodes):
    r = nodes.withColumn("rank", F.lit(1000000).cast("long"))
    for _ in range(2):
        contrib = (
            edges.join(deg, "a")
            .join(r, edges.a == r.k)
            .groupBy("b")
            .agg(F.expr("CAST(sum(rank div d) AS BIGINT)").alias("s"))
        )
        r = nodes.join(contrib, nodes.k == contrib.b, "left").select(
            "k",
            (F.lit(150000) + F.expr("(85 * COALESCE(s, 0)) div 100"))
            .cast("long")
            .alias("rank"),
        )
    return r.select(
        F.col("k").alias("partkey"), F.col("rank").alias("pagerank_micro")
    )


def rank_prejoin(edges, deg):
    nodes = deg.select(F.col("a").alias("k"))
    r = nodes.withColumn("rank", F.lit(1000000).cast("long"))
    for _ in range(2):
        w = r.join(deg, r.k == deg.a).select(
            "a", F.expr("rank div d").alias("c")
        )
        contrib = (
            edges.join(w, "a")
            .groupBy("b")
            .agg(F.expr("CAST(sum(c) AS BIGINT)").alias("s"))
        )
        r = nodes.join(contrib, nodes.k == contrib.b, "left").select(
            "k",
            (F.lit(150000) + F.expr("(85 * COALESCE(s, 0)) div 100"))
            .cast("long")
            .alias("rank"),
        )
    return r.select(
        F.col("k").alias("partkey"), F.col("rank").alias("pagerank_micro")
    )


def edges_selfjoin(spark, sf_dir):
    from trendengine_spark.queries.base import t

    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    l2 = li.withColumnRenamed("l_partkey", "b")
    return (
        li.join(l2, "l_orderkey")
        .filter(F.col("l_partkey") < F.col("b"))
        .select(F.col("l_partkey").alias("a"), "b")
        .distinct()
    )


def edges_pairgen(spark, sf_dir):
    from trendengine_spark.queries.base import t

    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    return (
        li.groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("ps"))
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ps, (x, i) ->"
                    " transform(slice(ps, i + 2, size(ps) - i - 1),"
                    " y -> struct(x AS a, y AS b))))"
                )
            ).alias("p")
        )
        .select("p.a", "p.b")
        .distinct()
    )


def sym_copart(spark, ori, nparts, key):
    from trendengine_spark.operators.util import owned_cache

    sym = ori.unionAll(
        ori.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    return owned_cache(sym.repartition(nparts, "a"), key=key)


def variant_a(spark, sf_dir):
    from trendengine_spark.queries.analytics import _copurchase_edges

    edges = _copurchase_edges(spark, sf_dir, f"prA:{sf_dir}")
    deg = edges.groupBy("a").agg(F.count(F.lit(1)).alias("d"))
    nodes = edges.select(F.col("a").alias("k")).distinct()
    return rank_two_joins(edges, deg, nodes)


def variant_b(spark, sf_dir, nparts):
    edges = sym_copart(
        spark, edges_selfjoin(spark, sf_dir), nparts, f"prB:{sf_dir}"
    )
    deg = edges.groupBy("a").agg(F.count(F.lit(1)).alias("d"))
    nodes = edges.select(F.col("a").alias("k")).distinct()
    return rank_two_joins(edges, deg, nodes)


def variant_c(spark, sf_dir, nparts):
    edges = sym_copart(
        spark, edges_selfjoin(spark, sf_dir), nparts, f"prC:{sf_dir}"
    )
    deg = edges.groupBy("a").agg(F.count(F.lit(1)).alias("d"))
    return rank_prejoin(edges, deg)


def variant_d(spark, sf_dir, nparts):
    edges = sym_copart(
        spark, edges_pairgen(spark, sf_dir), nparts, f"prD:{sf_dir}"
    )
    deg = edges.groupBy("a").agg(F.count(F.lit(1)).alias("d"))
    return rank_prejoin(edges, deg)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    from trendengine_spark.operators.util import owned_cache_drop
    from trendengine_spark.session import get_spark

    spark = get_spark(app_name="probe_pr_v2")
    sc = spark.sparkContext
    nparts = sc.defaultParallelism

    def run(tag, builder):
        times = []
        h = None
        for i in range(reps):
            for pfx in ("prA:", "prB:", "prC:", "prD:"):
                owned_cache_drop(spark, pfx)
            spark.catalog.clearCache()
            df = builder()
            sc.setJobDescription(f"pagerank v2 {tag} rep{i}")
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
            if h is None:
                h = df.orderBy("partkey").agg(
                    F.sum(F.hash("partkey", "pagerank_micro"))
                ).collect()[0][0]
        plan = df._jdf.queryExecution().executedPlan().toString()
        n_ex = len(re.findall(r"Exchange hashpartitioning", plan))
        return times, h, n_ex

    out = {}
    for tag, builder in [
        ("A", lambda: variant_a(spark, sf_dir)),
        ("B", lambda: variant_b(spark, sf_dir, nparts)),
        ("C", lambda: variant_c(spark, sf_dir, nparts)),
        ("D", lambda: variant_d(spark, sf_dir, nparts)),
    ]:
        out[tag] = run(tag, builder)
        ts, h, nx = out[tag]
        print(
            f"RESULT {tag}: min {min(ts):.3f}s  all {[round(x, 3) for x in ts]}"
            f"  exchanges~{nx}  hash={h}",
            flush=True,
        )
    hs = {t: v[1] for t, v in out.items()}
    print(f"RESULT hashes match: {len(set(hs.values())) == 1}  {hs}")


if __name__ == "__main__":
    main()
