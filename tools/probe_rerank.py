"""Interleaved A/B probe for sim_two_stage_rerank (guide §4).

A = the pre-r14 two-scan shape, transcribed: JVM sign-pack + code
    BNLJ + stage-1 window + id-join back to the float column +
    broadcast query vectors + pair-cosine ArrowEval + stage-2 window.
B = the landed one-pass shape: operators.similarity.two_stage_rerank
    (mapInPandas computing Hamming AND the candidate cosines per
    batch, one global window pass over the bounded union).

Hashes asserted identical per run.

Run: python tools/probe_rerank.py [sf_dir] [n_reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window, functions as F


def rerank_a(spark, sf_dir, k=10, budget=50):
    from trendengine_spark.operators.similarity import cosine_arrow
    from trendengine_spark.queries.base import t

    corpus = t(spark, sf_dir, "embeddings")
    id_col, vec_col = "vec_id", "embedding"
    pack = F.expr(
        f"aggregate(sequence(0, 63), 0L, (acc, i) -> acc + CASE WHEN "
        f"{vec_col}[i] > 0 THEN shiftleft(1L, i) ELSE 0L END)"
    )
    codes = corpus.select(id_col, pack.alias("code"))
    q_codes = codes.filter(F.col(id_col) < 10).select(
        F.col(id_col).alias("query_id"), F.col("code").alias("qc")
    )
    q_vecs = corpus.filter(F.col(id_col) < 10).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    d = codes.join(
        F.broadcast(q_codes), F.col(id_col) != F.col("query_id")
    ).select(
        "query_id",
        id_col,
        F.bit_count(F.col("qc").bitwiseXOR(F.col("code")))
        .cast("int")
        .alias("hamming"),
    )
    w1 = Window.partitionBy("query_id").orderBy("hamming", id_col)
    cand = (
        d.withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= budget)
        .select("query_id", id_col)
    )
    scored = (
        cand.join(corpus.select(id_col, vec_col), id_col)
        .join(F.broadcast(q_vecs), "query_id")
        .select(
            "query_id",
            id_col,
            cosine_arrow(F.col(vec_col), F.col("_qv")).alias("c"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("c"), id_col)
    return (
        scored.withColumn("rn", F.row_number().over(w2).cast("int"))
        .filter(F.col("rn") <= k)
        .select(
            "query_id", id_col, F.round("c", 4).alias("cos_sim"), "rn"
        )
    )


def rerank_b(spark, sf_dir, k=10, budget=50):
    from trendengine_spark.operators.similarity import (
        load_query_vectors,
        two_stage_rerank,
    )
    from trendengine_spark.queries.base import t

    return two_stage_rerank(
        t(spark, sf_dir, "embeddings"),
        k=k,
        budget=budget,
        queries_local=load_query_vectors(sf_dir),
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    from trendengine_spark.session import get_spark

    spark = get_spark(
        app_name="probe_rerank",
        extra_conf={
            "spark.sql.adaptive.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.shuffle.partitions": "8",
        },
    )
    sc = spark.sparkContext

    hash_cols = ["query_id", "vec_id", "cos_sim", "rn"]
    times: dict[str, list[float]] = {"A": [], "B": []}
    hashes: dict[str, object] = {}
    for i in range(reps):
        for tag, builder in (("A", rerank_a), ("B", rerank_b)):
            spark.catalog.clearCache()
            sc.setJobDescription(f"rerank{tag} rep{i}")
            t0 = time.perf_counter()
            df = builder(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            times[tag].append(time.perf_counter() - t0)
            if tag not in hashes:
                hashes[tag] = (
                    df.orderBy("query_id", "rn")
                    .agg(F.sum(F.hash(*hash_cols)))
                    .collect()[0][0]
                )
    for tag in ("A", "B"):
        print(
            f"RESULT rerank{tag}: min {min(times[tag]):.3f}s all"
            f" {[round(x, 3) for x in times[tag]]} hash={hashes[tag]}",
            flush=True,
        )
    print(f"HASH MATCH: {hashes['A'] == hashes['B']}", flush=True)


if __name__ == "__main__":
    main()
