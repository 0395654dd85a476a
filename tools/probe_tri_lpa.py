"""A/B probes for graph_triangle_counts and graph_communities_lpa
(guide §2.3/§2.4, following the probe_pagerank_v2 findings).

Triangles:
  A = current (self-join und, uncached, degree from endpoint union)
  B = und + degree read off the shared co-partitioned symmetrized
      edge cache (_copurchase_edges): und = sym.filter(a < b),
      deg = sym.groupBy(a) — exchange-free on the cached layout

LPA:
  A = current (self-join + groupBy count >= 2 build; operator as-is)
  B = multiplicity-preserving in-row pair generation build
      (collect_list + sorted i<j pairs with x < y)
  C = B + und checkpointed partitioned on the vote-join key b
      (operator repartition_votes knob)

All noop-sunk, min-of-N with caches dropped between reps, result
hashes compared.

Run: python tools/probe_tri_lpa.py [sf_dir] [n_reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


# ---------- triangles ----------

def tri_body(oriented):
    adj = oriented.groupBy("src").agg(F.collect_list("dst").alias("nbrs"))
    au = adj.select(F.col("src").alias("u"), F.col("nbrs").alias("nu"))
    av = adj.select(F.col("src").alias("v"), F.col("nbrs").alias("nv"))
    tri = (
        oriented.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .join(F.broadcast(au), "u")
        .join(F.broadcast(av), "v", "left")
        .select(
            "u",
            "v",
            F.explode(
                F.array_intersect("nu", F.coalesce("nv", F.array()))
            ).alias("w"),
        )
    )
    member = tri.select(F.explode(F.array("u", "v", "w")).alias("k"))
    return member.groupBy(F.col("k").alias("partkey")).agg(
        F.count(F.lit(1)).alias("n_triangles")
    )


def orient(und, deg):
    from trendengine_spark.operators.util import owned_cache

    da = deg.select(F.col("v").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("v").alias("b"), F.col("d").alias("db"))
    lower_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    return owned_cache(
        und.join(da, "a")
        .join(db, "b")
        .select(
            F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("src"),
            F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
        ),
        key="probe_tri_oriented",
    )


def tri_a(spark, sf_dir):
    from trendengine_spark.queries.base import t as _t

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    l2 = li.withColumnRenamed("l_partkey", "b")
    und = (
        li.join(l2, "l_orderkey")
        .filter(F.col("l_partkey") < F.col("b"))
        .select(F.col("l_partkey").alias("a"), "b")
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("v"))
        .unionAll(und.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    return tri_body(orient(und, deg))


def tri_b(spark, sf_dir):
    from trendengine_spark.queries.analytics import _copurchase_edges

    sym = _copurchase_edges(spark, sf_dir, f"probe_tri_sym:{sf_dir}")
    und = sym.filter(F.col("a") < F.col("b"))
    deg = sym.groupBy(F.col("a").alias("v")).agg(
        F.count(F.lit(1)).alias("d")
    )
    return tri_body(orient(und, deg))


# ---------- LPA ----------

def lpa_edges_current(spark, sf_dir):
    from trendengine_spark.queries.base import t as _t

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("src"))
    b = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("dst"))
    return (
        a.join(b, "o")
        .filter(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 2)
        .select("src", "dst")
    )


def lpa_edges_pairgen(spark, sf_dir):
    from trendengine_spark.queries.base import t as _t

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    return (
        li.groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_list("l_partkey")).alias("ps"))
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ps, (x, i) ->"
                    " filter(transform(slice(ps, i + 2, size(ps) - i - 1),"
                    " y -> struct(x AS src, y AS dst)),"
                    " p -> p.src < p.dst)))"
                )
            ).alias("p")
        )
        .select("p.src", "p.dst")
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 2)
        .select("src", "dst")
    )


def lpa_full(spark, edges_df, repartition_votes):
    from trendengine_spark.operators.graph import label_propagation, modularity
    from trendengine_spark.operators.util import owned_cache

    edges = owned_cache(edges_df, "probe.lpa.edges")
    labels = owned_cache(
        label_propagation(
            edges, iters=5, early_exit=False,
            repartition_votes=repartition_votes,
        )
        if repartition_votes is not None
        else label_propagation(edges, iters=5, early_exit=False),
        "probe.lpa.labels",
    )
    q = modularity(edges, labels)
    return (
        labels.groupBy("community")
        .agg(F.count(F.lit(1)).alias("n_members"))
        .orderBy(F.desc("n_members"), "community")
        .limit(20)
        .withColumn("modularity", F.lit(float(q)))
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    which = sys.argv[3] if len(sys.argv) > 3 else "both"
    from trendengine_spark.operators.util import owned_cache_drop
    from trendengine_spark.session import get_spark

    spark = get_spark(app_name="probe_tri_lpa")
    sc = spark.sparkContext

    def run(tag, builder, hash_cols):
        times = []
        h = None
        df = None
        for i in range(reps):
            owned_cache_drop(spark, "probe")
            spark.catalog.clearCache()
            sc.setJobDescription(f"{tag} rep{i}")
            # the builder is INSIDE the timed region: LPA's operator
            # localCheckpoints eagerly, so build time IS query time
            # (matches the bench, which times fn(spark, sf_dir) whole)
            t0 = time.perf_counter()
            df = builder()
            df.write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
            if h is None:
                h = (
                    df.orderBy(*hash_cols)
                    .agg(F.sum(F.hash(*hash_cols)))
                    .collect()[0][0]
                )
        return times, h

    if which in ("tri", "both"):
        for tag, b in [("triA", lambda: tri_a(spark, sf_dir)),
                       ("triB", lambda: tri_b(spark, sf_dir))]:
            ts, h = run(tag, b, ["partkey", "n_triangles"])
            print(
                f"RESULT {tag}: min {min(ts):.3f}s all"
                f" {[round(x, 3) for x in ts]} hash={h}",
                flush=True,
            )
    if which in ("lpa", "both"):
        for tag, b in [
            ("lpaA", lambda: lpa_full(spark, lpa_edges_current(spark, sf_dir), None)),
            ("lpaB", lambda: lpa_full(spark, lpa_edges_pairgen(spark, sf_dir), None)),
            ("lpaC", lambda: lpa_full(spark, lpa_edges_pairgen(spark, sf_dir), True)),
            ("lpaD", lambda: lpa_full(spark, lpa_edges_current(spark, sf_dir), True)),
        ]:
            try:
                ts, h = run(tag, b, ["community", "n_members"])
            except TypeError as exc:
                print(f"RESULT {tag}: skipped ({exc})", flush=True)
                continue
            print(
                f"RESULT {tag}: min {min(ts):.3f}s all"
                f" {[round(x, 3) for x in ts]} hash={h}",
                flush=True,
            )


if __name__ == "__main__":
    main()
