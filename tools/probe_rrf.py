"""A/B probe for sim_rrf_fusion (guide §2.3/§2.4): fuse the two
ranker scans into one pass.

A = current shape: cosine pairs (scan 1 + BNLJ + window) and Hamming
    pairs (scan 2 + pack + BNLJ + window) ranked independently, then
    fused with an equi-join on (query_id, vec_id) and a final window —
    4 parquet scans, 2 BNLJs, 1 SMJ, 14 static Exchanges.
B = one pass: a single scan computes (embedding, packed code) per
    row, ONE broadcast of the query side carrying both the query
    vector and the query code, ONE pair generation, then both
    row_numbers over the SAME query_id partitioning (two sorts, one
    exchange) and the rank filter — the fusion join disappears
    because both ranks live on the same row.

Result identity: both ranks are row_number over identical (ordering,
tie-break) keys evaluated on the identical pair set, and the RRF
score is the same two-term unit-fraction sum on those integer ranks —
bit-identical doubles. Hash-asserted per rep below; the DuckDB oracle
text is untouched.

Run: python tools/probe_rrf.py [sf_dir] [n_reps]
Interleaved A/B reps (session-4 lesson: block-ordered A/B confounds
with host-contention drift on this box).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window, functions as F


def rrf_a(spark, sf_dir):
    """Transcription of the pre-change sim_rrf_fusion body."""
    from trendengine_spark.operators.similarity import cosine_arrow
    from trendengine_spark.queries.base import t

    emb = t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("_qv")
    )
    cos_scored = (
        emb.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            cosine_arrow(F.col("embedding"), F.col("_qv")).alias("c"),
        )
    )
    w_cos = Window.partitionBy("query_id").orderBy(F.desc("c"), "vec_id")
    cos_r = (
        cos_scored.withColumn("r", F.row_number().over(w_cos))
        .filter(F.col("r") <= 100)
        .select("query_id", "vec_id", F.col("r").alias("cos_rank"))
    )

    pack = F.expr(
        "aggregate(sequence(0, 63), 0L, (acc, i) -> acc + CASE WHEN "
        "embedding[i] > 0 THEN shiftleft(1L, i) ELSE 0L END)"
    )
    codes = emb.select("vec_id", pack.alias("code"))
    qc = codes.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("code").alias("qc")
    )
    ham_scored = codes.join(
        F.broadcast(qc), F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        "vec_id",
        F.bit_count(F.col("qc").bitwiseXOR(F.col("code"))).alias("hamming"),
    )
    w_ham = Window.partitionBy("query_id").orderBy("hamming", "vec_id")
    ham_r = (
        ham_scored.withColumn("r", F.row_number().over(w_ham))
        .filter(F.col("r") <= 100)
        .select("query_id", "vec_id", F.col("r").alias("ham_rank"))
    )

    fused = cos_r.join(ham_r, ["query_id", "vec_id"]).select(
        "query_id",
        "vec_id",
        F.col("cos_rank").cast("int").alias("cos_rank"),
        F.col("ham_rank").cast("int").alias("ham_rank"),
        (
            F.lit(1.0) / (F.lit(60) + F.col("cos_rank"))
            + F.lit(1.0) / (F.lit(60) + F.col("ham_rank"))
        ).alias("rrf"),
    )
    w_f = Window.partitionBy("query_id").orderBy(F.desc("rrf"), "vec_id")
    return (
        fused.withColumn("rn", F.row_number().over(w_f).cast("int"))
        .filter(F.col("rn") <= 10)
        .select(
            "query_id", "vec_id", "cos_rank", "ham_rank",
            F.round("rrf", 6).alias("rrf"), "rn",
        )
    )


def rrf_b(spark, sf_dir):
    """Fused single-pass shape."""
    from trendengine_spark.operators.similarity import cosine_arrow
    from trendengine_spark.queries.base import t

    emb = t(spark, sf_dir, "embeddings")
    pack = F.expr(
        "aggregate(sequence(0, 63), 0L, (acc, i) -> acc + CASE WHEN "
        "embedding[i] > 0 THEN shiftleft(1L, i) ELSE 0L END)"
    )
    base = emb.select("vec_id", "embedding", pack.alias("code"))
    qside = base.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("_qv"),
        F.col("code").alias("qc"),
    )
    pairs = base.join(
        F.broadcast(qside), F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        "vec_id",
        cosine_arrow(F.col("embedding"), F.col("_qv")).alias("c"),
        F.bit_count(F.col("qc").bitwiseXOR(F.col("code"))).alias("hamming"),
    )
    w_cos = Window.partitionBy("query_id").orderBy(F.desc("c"), "vec_id")
    w_ham = Window.partitionBy("query_id").orderBy("hamming", "vec_id")
    fused = (
        pairs.withColumn("cos_rank", F.row_number().over(w_cos))
        .withColumn("ham_rank", F.row_number().over(w_ham))
        .filter((F.col("cos_rank") <= 100) & (F.col("ham_rank") <= 100))
        .select(
            "query_id",
            "vec_id",
            F.col("cos_rank").cast("int").alias("cos_rank"),
            F.col("ham_rank").cast("int").alias("ham_rank"),
            (
                F.lit(1.0) / (F.lit(60) + F.col("cos_rank"))
                + F.lit(1.0) / (F.lit(60) + F.col("ham_rank"))
            ).alias("rrf"),
        )
    )
    w_f = Window.partitionBy("query_id").orderBy(F.desc("rrf"), "vec_id")
    return (
        fused.withColumn("rn", F.row_number().over(w_f).cast("int"))
        .filter(F.col("rn") <= 10)
        .select(
            "query_id", "vec_id", "cos_rank", "ham_rank",
            F.round("rrf", 6).alias("rrf"), "rn",
        )
    )


def rrf_c(spark, sf_dir):
    """mapInPandas shape: ONE corpus pass computes cosine AND Hamming
    per batch against the closure-held query matrix, emitting only the
    union of batch-local top-100s per ordering — an exact decomposition
    (every global-top-100 row survives its batch-local top-100; a row
    outside a global top-100 cannot reach union-rank ≤ 100 because all
    rows that beat it globally are present in the union). Cosine keeps
    the pairs path's exact einsum signature (broadcast view), so the
    doubles are bit-identical to variant B."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from trendengine_spark.operators.similarity import load_query_vectors
    from trendengine_spark.operators.util import fan_out
    from trendengine_spark.queries.base import t

    emb = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    q_ids, q_mat = load_query_vectors(sf_dir)
    sc = spark.sparkContext
    bc = sc.broadcast((list(q_ids), q_mat))

    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("vec_id", T.LongType()),
            T.StructField("c", T.DoubleType()),
            T.StructField("hamming", T.IntegerType()),
        ]
    )

    def _pack(m: "np.ndarray") -> "np.ndarray":
        bits = (m > 0).astype(np.uint64)
        weights = np.left_shift(
            np.uint64(1), np.arange(64, dtype=np.uint64)
        )
        return (bits * weights).sum(axis=1, dtype=np.uint64)

    def _popcount(x: "np.ndarray") -> "np.ndarray":
        b = x.astype(np.uint64).view(np.uint8).reshape(x.size, 8)
        return np.unpackbits(b, axis=1).sum(axis=1).astype(np.int32)

    def score_batches(batches):
        ids_b, qm = bc.value
        q_codes = _pack(qm)
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["vec_id"].to_numpy()
            m = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
            )
            norms = np.linalg.norm(m, axis=1)
            codes = _pack(m)
            out = {"query_id": [], "vec_id": [], "c": [], "hamming": []}
            for qi, qid in enumerate(ids_b):
                qv = np.broadcast_to(qm[qi], m.shape)
                dots = np.einsum("ij,ij->i", m, qv)
                qn = np.linalg.norm(qv, axis=1)
                c = dots / (norms * qn)
                hm = _popcount(codes ^ q_codes[qi])
                cand = np.flatnonzero(ids != qid)
                if cand.size == 0:
                    continue
                top_c = cand[np.lexsort((ids[cand], -c[cand]))][:100]
                top_h = cand[np.lexsort((ids[cand], hm[cand]))][:100]
                keep = np.union1d(top_c, top_h)
                out["query_id"].extend([qid] * keep.size)
                out["vec_id"].extend(ids[keep].tolist())
                out["c"].extend(c[keep].tolist())
                out["hamming"].extend(hm[keep].tolist())
            yield pd.DataFrame(out)

    pairs = fan_out(emb).mapInPandas(score_batches, schema=out_schema)
    w_cos = Window.partitionBy("query_id").orderBy(F.desc("c"), "vec_id")
    w_ham = Window.partitionBy("query_id").orderBy("hamming", "vec_id")
    fused = (
        pairs.withColumn("cos_rank", F.row_number().over(w_cos))
        .withColumn("ham_rank", F.row_number().over(w_ham))
        .filter((F.col("cos_rank") <= 100) & (F.col("ham_rank") <= 100))
        .select(
            "query_id",
            "vec_id",
            F.col("cos_rank").cast("int").alias("cos_rank"),
            F.col("ham_rank").cast("int").alias("ham_rank"),
            (
                F.lit(1.0) / (F.lit(60) + F.col("cos_rank"))
                + F.lit(1.0) / (F.lit(60) + F.col("ham_rank"))
            ).alias("rrf"),
        )
    )
    w_f = Window.partitionBy("query_id").orderBy(F.desc("rrf"), "vec_id")
    return (
        fused.withColumn("rn", F.row_number().over(w_f).cast("int"))
        .filter(F.col("rn") <= 10)
        .select(
            "query_id", "vec_id", "cos_rank", "ham_rank",
            F.round("rrf", 6).alias("rrf"), "rn",
        )
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    from trendengine_spark.session import get_spark

    # bench posture so the deltas speak to the bench numbers
    spark = get_spark(
        app_name="probe_rrf",
        extra_conf={
            "spark.sql.adaptive.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.shuffle.partitions": "8",
        },
    )
    sc = spark.sparkContext

    hash_cols = ["query_id", "vec_id", "cos_rank", "ham_rank", "rrf", "rn"]
    times: dict[str, list[float]] = {"A": [], "B": [], "C": []}
    hashes: dict[str, object] = {}
    for i in range(reps):
        for tag, builder in (("A", rrf_a), ("B", rrf_b), ("C", rrf_c)):
            spark.catalog.clearCache()
            sc.setJobDescription(f"rrf{tag} rep{i}")
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
    for tag in ("A", "B", "C"):
        print(
            f"RESULT rrf{tag}: min {min(times[tag]):.3f}s all"
            f" {[round(x, 3) for x in times[tag]]} hash={hashes[tag]}",
            flush=True,
        )
    print(
        f"HASH MATCH: {hashes['A'] == hashes['B'] == hashes['C']}",
        flush=True,
    )


if __name__ == "__main__":
    main()
