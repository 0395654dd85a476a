"""ANN derived-knob scale probe (r14, VERDICT r13 #1 "Done ="):
measure CANDIDATE VOLUME and recall for the hyperplane-LSH and IVF
production operators as the corpus grows 10k -> 100k -> 1M vectors,
with the r14 derived knobs (p = ceil(log2 n) + banded table;
n_cells = ceil-sqrt).

What "fixed" means here, measured:
- hyperplane: candidates per query should stay ~bands (bucket
  occupancy ~1 because 2^p >= n), NOT a constant fraction of the
  corpus (the frozen p=4 gave ~n/16 per band).
- IVF: candidates per query should grow ~nprobe*sqrt(N), NOT
  N*nprobe/16.
- recall floors: planted near-dup (cos ~ 0.999) recall stays ~1.0 at
  every scale; brute-force top-5 recall at the synthetic corpus's
  low-similarity regime is reported for honesty (LSH theory says it
  decays past the band cap - see _ANN_BANDS_FOR_P).

Usage: python tools/probe_ann_scale.py [max_n]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
from pyspark.sql import SparkSession, functions as F

from trendengine_spark.operators.similarity import (
    _md5_sign_planes,
    adaptive_ann_bands,
    adaptive_n_cells,
    adaptive_planes_per_band,
    band_signatures,
    cosine_topk,
    ivf_index,
    random_hyperplane_ann,
)

MAX_N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
DIM = 64
N_QUERIES = 10
N_PLANTED = 50

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "64")
    .config("spark.driver.memory", "48g")
    .config("spark.driver.maxResultSize", "8g")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

# synthetic corpus: hash-derived pseudo-random vectors (same family as
# tools/stress_decon.py); ids >= n carry near-copies of ids < N_PLANTED
# (1e-4 noise => cos ~ 0.999) for the planted-recall floor
VEC = F.expr(
    f"transform(sequence(0,{DIM-1}), j ->"
    " (pmod(xxhash64(id, j), 1000) - 500.0) / 500.0)"
)


def corpus(n):
    base = spark.range(n).select(F.col("id").alias("vec_id"), VEC.alias("embedding"))
    dup = spark.range(N_PLANTED).select(
        (F.col("id") + n).alias("vec_id"),
        F.expr(
            f"transform(sequence(0,{DIM-1}), j ->"
            " (pmod(xxhash64(id, j), 1000) - 500.0) / 500.0"
            " + (pmod(xxhash64(id + 77, j), 7) - 3.0) * 1e-4)"
        ).alias("embedding"),
    )
    return base.unionAll(dup).repartition(64).cache()


for n in sorted({s for s in (10_000, 100_000, MAX_N) if s <= MAX_N}):
    emb = corpus(n)
    emb.count()
    total = n + N_PLANTED
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    # ---- hyperplane LSH: candidate volume via the same bucket join
    p = adaptive_planes_per_band(total)
    bands = adaptive_ann_bands(p)
    planes = _md5_sign_planes(p * bands, DIM)
    sigs = band_signatures(
        emb, planes, p, bands, "vec_id", "embedding", quantize=True
    ).select("vec_id", F.posexplode("sigs").alias("band", "sig"))
    qsig = sigs.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), "band", "sig"
    )
    t0 = time.time()
    cand = (
        sigs.join(F.broadcast(qsig), ["band", "sig"])
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id")
        .distinct()
        .count()
    )
    t_lsh_cand = time.time() - t0

    t0 = time.time()
    ann = random_hyperplane_ann(emb, queries, k=5, dim=DIM, family="md5")
    ann_pd = ann.toPandas()
    t_lsh = time.time() - t0

    # planted near-dup recall: query with the ORIGINALS of the planted
    # copies — their copy must appear in top-5
    dup_q = emb.filter(F.col("vec_id") < N_PLANTED).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    dup_hits = (
        random_hyperplane_ann(emb, dup_q, k=5, dim=DIM, family="md5")
        .filter(F.col("vec_id") == F.col("query_id") + n)
        .count()
    )

    # brute-force recall at the demo (low-sim) regime, for honesty
    exact = cosine_topk(emb, queries, k=5).toPandas()
    es = set(zip(exact["query_id"], exact["vec_id"]))
    as_ = set(zip(ann_pd["query_id"], ann_pd["vec_id"]))
    lowsim_recall = len(es & as_) / max(len(es), 1)

    # ---- IVF: candidate volume = probed-cell population
    t0 = time.time()
    asg, cent = ivf_index(emb, n_cells=None)
    asg = asg.cache()
    nc = len(cent)
    sizes = {r["cell"]: r["c"] for r in asg.groupBy("cell").agg(F.count(F.lit(1)).alias("c")).collect()}
    t_ivf_build = time.time() - t0
    cn = cent / np.linalg.norm(cent, axis=1, keepdims=True)
    qrows = queries.collect()
    nprobe = 6
    ivf_cand = 0
    for r in qrows:
        qv = np.asarray(list(r[1]))
        qv = qv / (np.linalg.norm(qv) or 1.0)
        for cell in np.argsort(-(cn @ qv))[:nprobe]:
            ivf_cand += sizes.get(int(cell), 0)

    print(
        f"n={total:>9,}  LSH p={p} bands={bands} "
        f"cand/query={cand / N_QUERIES:>8.1f} "
        f"({100.0 * cand / N_QUERIES / total:.3f}% of corpus) "
        f"wall cand={t_lsh_cand:.1f}s topk={t_lsh:.1f}s "
        f"planted_recall={dup_hits / N_PLANTED:.3f} "
        f"lowsim_recall@5={lowsim_recall:.2f}  ||  "
        f"IVF nc={nc} cand/query={ivf_cand / N_QUERIES:>10.1f} "
        f"({100.0 * ivf_cand / N_QUERIES / total:.2f}% of corpus) "
        f"build={t_ivf_build:.1f}s",
        flush=True,
    )
    asg.unpersist()
    emb.unpersist()

spark.stop()
