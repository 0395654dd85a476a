"""Synthetic-sf1 scale probe: the driver ships sf≤0.1 (~600k
lineitem); this tool manufactures a coherent ~sf1 dataset (~6M
lineitem / 1.5M orders) by replicating the sf0.1 FACT tables 10×
with key offsets (dims unchanged — exactly how TPC-H scales), then
times representative query shapes on Spark AND DuckDB over the SAME
files.

Purpose: direct evidence for the 100 TB design claim that the
engine's wall time is slope-dominated at real data sizes — the
per-query scheduler constant that dominates the sf0.1 bench (~150 ms,
BASELINE.md floor decomposition) should shrink to noise once stages
run for seconds, and the plan quality (pushdown, partial agg,
broadcast-vs-shuffle choice) is what remains.

Replication is key-consistent: replica k offsets o_orderkey and
l_orderkey by k·OFFSET, so order⋈lineitem joins land exactly as in
the original, customers simply own 10× orders each (valid skew-free
scaling). Output layout is multi-file parquet (~64 splits/fact) —
the ingest posture the engine assumes (SCALE.md), unlike the
driver's single-row-group files.

Usage: python tools/stress_sf1.py [replicas] [sf_src_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

OUT = "/tmp/te_sf1"
FACTS = ("lineitem", "orders")
DIMS = ("customer", "supplier", "part", "nation", "region", "events")

#: registry queries whose shapes span the relational spine
QUERIES = [
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q13_customer_distribution",
    "tpch_q18_large_volume_customer",
    "tpch_q21_waiting_supplier",
    "join_inner_3way",
    "window_topk_per_group",
    # r7: iterative graph shapes — the edge self-join fans out 10×
    # with the fact tables, so this probes the join/agg-per-iteration
    # plan at ~2M distinct edges
    "graph_pagerank_micro",
    "recursive_cte_reachability",
    # r8: adjacency-intersection triangles — Spark's third crossover
    # (5.9 s vs DuckDB 12.3 s at sf3, measured separately in r8)
    "graph_triangle_counts",
    # r8 session 3: one-pass exact-Gram correlation profile — pure
    # scan + partial-aggregate over the widest fact table, the shape
    # the engine is built for
    "profile_numeric_correlations",
]

ORACLE_TABLES = FACTS + DIMS


def build(spark, src: str, replicas: int) -> None:
    from pyspark.sql import functions as F

    from trendengine_spark.tables import load_table

    if os.path.exists(OUT):
        shutil.rmtree(OUT)
    os.makedirs(OUT)
    # write µs timestamps (not legacy INT96): INT96 decodes slowly AND
    # blocks timestamp predicate pushdown — it would handicap exactly
    # the scan path this probe exists to measure
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    offset = 10_000_000
    rep = F.explode(F.sequence(F.lit(0), F.lit(replicas - 1))).alias("_r")
    for name in FACTS:
        df = load_table(spark, src, name).select("*", rep)
        key = "o_orderkey" if name == "orders" else "l_orderkey"
        df = df.withColumn(key, F.col(key) + F.col("_r") * offset).drop("_r")
        df.repartition(64).write.parquet(f"{OUT}/{name}.parquet")
    for name in DIMS:
        load_table(spark, src, name).repartition(4).write.parquet(
            f"{OUT}/{name}.parquet"
        )


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from trendengine_spark.queries import REGISTRY
    from trendengine_spark.session import get_spark

    spark = get_spark(app_name="stress_sf1")
    t0 = time.perf_counter()
    build(spark, src, replicas)
    print(f"build: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    rows = spark.read.parquet(f"{OUT}/lineitem.parquet").count()

    spark_times = {}
    for name in QUERIES:
        fn = REGISTRY[name].fn
        fn(spark, OUT).toArrow()  # codegen warm-up
        best = float("inf")
        for _ in range(3):
            s = time.perf_counter()
            fn(spark, OUT).toArrow()
            best = min(best, time.perf_counter() - s)
        spark_times[name] = round(best, 3)

    import duckdb

    duck_times = {}
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in ORACLE_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{OUT}/{t}.parquet/*.parquet'"
        )
    for name in QUERIES:
        sql = REGISTRY[name].sql
        con.execute(sql).fetchall()  # warm
        best = float("inf")
        # DuckDB min-of-5: its run-to-run spread measured larger than
        # Spark's on this box (q3 0.19-1.11 s across runs at 6M rows)
        for _ in range(5):
            s = time.perf_counter()
            con.execute(sql).fetchall()
            best = min(best, time.perf_counter() - s)
        duck_times[name] = round(best, 3)

    total_s = round(sum(spark_times.values()), 3)
    total_d = round(sum(duck_times.values()), 3)
    print(
        json.dumps(
            {
                "lineitem_rows": rows,
                "spark": spark_times,
                "duckdb": duck_times,
                "spark_total": total_s,
                "duckdb_total": total_d,
                "ratio": round(total_s / total_d, 2) if total_d else None,
            }
        )
    )


if __name__ == "__main__":
    main()
