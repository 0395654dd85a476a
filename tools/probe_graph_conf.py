"""Interleaved A/B of the r14 graph-family plan knobs UNDER THE EXACT
BENCH CONF (AQE off, spark.sql.shuffle.partitions=8) — r15, VERDICT
r14 #2. The r14 probes ran under the engine default (AQE on, 32
shuffle partitions); the driver's bench showed LPA 0.62x and triangles
0.74x under ITS conf, so each knob is re-decided here under that conf.

Knobs:
  edge layout   — the shared symmetrized co-purchase cache:
                    key   : repartition(col("a"))      (r14 shape; n
                            follows shuffle.partitions = 8 here)
                    keyN  : repartition(max(shuffle, defaultParallelism),
                            col("a")) — same layout, full-width
                    none  : cache the union as produced (scan-width
                            partitions, no keyed layout)
  vote layout   — label_propagation(repartition_votes=True/False)

Variants are interleaved round-robin (ambient drift hits all equally);
owned caches are dropped between samples (bench discipline) so every
sample pays its full plan cost. Result hash printed per variant —
all variants must agree.

Usage: python tools/probe_graph_conf.py [sf_dir] [rounds]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BENCH_CONF = {
    "spark.sql.adaptive.enabled": "false",
    "spark.ui.showConsoleProgress": "false",
    "spark.sql.shuffle.partitions": "8",
}

#: PROBE_CONF=engine re-runs the matrix under the engine default
#: (AQE on, cores-based shuffle partitions) — a keep/revert decision
#: must not trade one conf's win for the other's loss.
ENGINE_CONF = {"spark.ui.showConsoleProgress": "false"}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from pyspark.sql import functions as F

    from trendengine_spark.session import get_spark
    from trendengine_spark.tables import warm_cache
    from trendengine_spark.queries.base import t
    from trendengine_spark.operators.graph import label_propagation, modularity
    from trendengine_spark.operators.util import owned_cache

    conf_name = os.environ.get("PROBE_CONF", "bench")
    conf = ENGINE_CONF if conf_name == "engine" else BENCH_CONF
    spark = get_spark(app_name="probe_graph_conf", extra_conf=conf)
    spark.range(1000).selectExpr("sum(id)").collect()
    warm_cache(spark, sf_dir)

    jsc = spark.sparkContext._jsc
    base_ids = set(jsc.getPersistentRDDs().keySet())

    def drop_caches() -> None:
        pool = getattr(spark.sparkContext, "_te_owned_caches", None) or {}
        for key in list(pool):
            try:
                pool.pop(key).unpersist(blocking=True)
            except Exception:
                pass
        for rid in set(jsc.getPersistentRDDs().keySet()) - base_ids:
            try:
                jsc.getPersistentRDDs().get(rid).unpersist()
            except Exception:
                pass

    def sym_edges(layout: str):
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
        if layout == "key":
            sym = sym.repartition(F.col("a"))
        elif layout == "keyN":
            n = max(
                int(spark.conf.get("spark.sql.shuffle.partitions")),
                spark.sparkContext.defaultParallelism,
            )
            sym = sym.repartition(n, F.col("a"))
        return owned_cache(sym, key=f"probe_edges:{layout}")

    def pagerank(layout: str):
        edges = sym_edges(layout)
        deg = edges.groupBy("a").agg(F.count(F.lit(1)).alias("d"))
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
                (
                    F.lit(150000) + F.expr("(85 * COALESCE(s, 0)) div 100")
                ).cast("long").alias("rank"),
            )
        return r.select(
            F.col("k").alias("partkey"), F.col("rank").alias("pagerank_micro")
        )

    def triangles(layout: str):
        sym = sym_edges(layout)
        und = sym.filter(F.col("a") < F.col("b"))
        deg = sym.groupBy(F.col("a").alias("v")).agg(
            F.count(F.lit(1)).alias("d")
        )
        da = deg.select(F.col("v").alias("a"), F.col("d").alias("da"))
        db = deg.select(F.col("v").alias("b"), F.col("d").alias("db"))
        lower_first = (F.col("da") < F.col("db")) | (
            (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
        )
        oriented = owned_cache(
            und.join(da, "a")
            .join(db, "b")
            .select(
                F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("src"),
                F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
            ),
            key="probe_tri_oriented",
        )
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

    def lpa(rv: bool):
        li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
        a = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("src"))
        b = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("dst"))
        edges = (
            a.join(b, "o")
            .filter(F.col("src") < F.col("dst"))
            .groupBy("src", "dst")
            .agg(F.count(F.lit(1)).alias("w"))
            .filter(F.col("w") >= 2)
            .select("src", "dst")
        )
        edges = owned_cache(edges, "probe_lpa_edges")
        labels = owned_cache(
            label_propagation(
                edges, iters=5, early_exit=False, repartition_votes=rv
            ),
            "probe_lpa_labels",
        )
        q = modularity(edges, labels)
        return (
            labels.groupBy("community")
            .agg(F.count(F.lit(1)).alias("n_members"))
            .orderBy(F.desc("n_members"), "community")
            .limit(20)
            .withColumn("modularity", F.lit(float(q)))
        )

    variants = {
        "pagerank[key]": lambda: pagerank("key"),
        "pagerank[keyN]": lambda: pagerank("keyN"),
        "pagerank[none]": lambda: pagerank("none"),
        "triangles[key]": lambda: triangles("key"),
        "triangles[keyN]": lambda: triangles("keyN"),
        "triangles[none]": lambda: triangles("none"),
        "lpa[rv=True]": lambda: lpa(True),
        "lpa[rv=False]": lambda: lpa(False),
    }

    times: dict[str, list[float]] = {k: [] for k in variants}
    hashes: dict[str, str] = {}

    for k, build in variants.items():  # untimed warm-up + hash
        df = build()
        tbl = df.toArrow()
        rows = sorted(map(str, tbl.to_pylist()))
        hashes[k] = hashlib.md5("\n".join(rows).encode()).hexdigest()[:12]
        drop_caches()

    for r in range(rounds):
        for k, build in variants.items():
            spark.sparkContext.setJobDescription(f"{k} round {r}")
            t0 = time.perf_counter()
            build().toArrow()
            times[k].append(round(time.perf_counter() - t0, 3))
            drop_caches()

    print(f"# conf: {conf_name}, sf={sf_dir}")
    for k in variants:
        print(f"{k}: min={min(times[k])} samples={times[k]} hash={hashes[k]}")


if __name__ == "__main__":
    main()
