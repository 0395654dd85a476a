"""A/B probe (guide §2.4): does co-partitioning the cached co-purchase
edge table on the join key collapse the per-iteration exchanges in
graph_pagerank_micro?

A = current plan (oriented cache + union-flip, no explicit partitioning)
B = symmetrized cache hash-partitioned on `a` before persist

Both variants noop-sunk (§1.4), min-of-N warm, job-labeled (§1.5).
Result hashes compared to guarantee the rewrite is a pure plan change.

Run: python tools/probe_pagerank_copart.py [sf_dir] [n_reps]
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def build_rank(edges, deg, nodes):
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


def variant_a(spark, sf_dir):
    from trendengine_spark.queries.analytics import _copurchase_edges

    edges = _copurchase_edges(spark, sf_dir, f"prA:{sf_dir}")
    deg = edges.groupBy("a").agg(F.count(F.lit(1)).alias("d"))
    nodes = edges.select(F.col("a").alias("k")).distinct()
    return build_rank(edges, deg, nodes)


def variant_b(spark, sf_dir, nparts):
    from trendengine_spark.operators.util import owned_cache
    from trendengine_spark.queries.base import t

    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    l2 = li.withColumnRenamed("l_partkey", "b")
    ori = (
        li.join(l2, "l_orderkey")
        .filter(F.col("l_partkey") < F.col("b"))
        .select(F.col("l_partkey").alias("a"), "b")
        .distinct()
    )
    sym = ori.unionAll(
        ori.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    edges = owned_cache(
        sym.repartition(nparts, "a"), key=f"prB:{sf_dir}"
    )
    deg = edges.groupBy("a").agg(F.count(F.lit(1)).alias("d"))
    nodes = edges.select(F.col("a").alias("k")).distinct()
    return build_rank(edges, deg, nodes)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    from trendengine_spark.operators.util import owned_cache_drop
    from trendengine_spark.session import get_spark

    spark = get_spark(app_name="probe_pr_copart")
    sc = spark.sparkContext
    nparts = spark.sparkContext.defaultParallelism

    def run(tag, builder):
        times = []
        h = None
        for i in range(reps):
            owned_cache_drop(spark, "prA:")
            owned_cache_drop(spark, "prB:")
            spark.catalog.clearCache()
            df = builder()
            sc.setJobDescription(f"pagerank copart {tag} rep{i}")
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

    ta, ha, exa = run("A", lambda: variant_a(spark, sf_dir))
    tb, hb, exb = run(
        "B", lambda: variant_b(spark, sf_dir, nparts)
    )
    print(f"A (current):   min {min(ta):.3f}s  all {[round(x,3) for x in ta]}  exchanges~{exa}")
    print(f"B (copart):    min {min(tb):.3f}s  all {[round(x,3) for x in tb]}  exchanges~{exb}")
    print(f"hash A={ha} B={hb} match={ha == hb}")


if __name__ == "__main__":
    main()
