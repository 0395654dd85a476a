"""sf10 solo timing + whole-corpus exactness for the r14 fused
retrieval operators (r15, VERDICT r14 #8).

The fused kernels (`cosine_hamming_candidates`, `two_stage_rerank`)
were validated at sf0.1 + local-cluster in r14; this drives the two
DECLARED queries (`sim_rrf_fusion`, `sim_two_stage_rerank`) against an
sf10-scale embeddings table (build with `tools/stress_sf1.py 100`) and

1. times each solo (bench methodology: fresh plan per sample,
   operator caches dropped between samples, min-of-N);
2. verifies BOTH queries' full collected output against a pure-numpy
   whole-corpus reference (the tests' `_brute_rank_reference`
   contract: exact einsum cosine + sign-code Hamming for every
   (query, candidate), no batch-local pruning) — membership, ranks,
   and the RRF doubles must match exactly.

Usage: python tools/probe_fused_sf10.py [sf_dir] [n_reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def brute_reference(ids, mat, q_ids, q_mat):
    from trendengine_spark.operators.similarity import (
        _pack_sign_codes,
        _popcount64,
    )

    codes = _pack_sign_codes(mat)
    q_codes = _pack_sign_codes(q_mat)
    norms = np.linalg.norm(mat, axis=1)
    out = {}
    for qi, qid in enumerate(q_ids):
        qv = np.broadcast_to(q_mat[qi], mat.shape)
        dots = np.einsum("ij,ij->i", mat, qv)
        c = dots / (norms * np.linalg.norm(qv, axis=1))
        hm = _popcount64(codes ^ q_codes[qi])
        cand = np.flatnonzero(ids != qid)
        cos_order = cand[np.lexsort((ids[cand], -c[cand]))]
        ham_order = cand[np.lexsort((ids[cand], hm[cand]))]
        out[qid] = (c, hm, cos_order, ham_order)
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/te_sf1"
    n_reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from trendengine_spark.session import get_spark
    from trendengine_spark.queries import all_queries
    from trendengine_spark.operators.similarity import load_query_vectors

    spark = get_spark(
        app_name="probe_fused_sf10",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.range(1000).selectExpr("sum(id)").collect()
    qs = all_queries()

    def drop_caches() -> None:
        pool = getattr(spark.sparkContext, "_te_owned_caches", None) or {}
        for key in list(pool):
            try:
                pool.pop(key).unpersist(blocking=True)
            except Exception:
                pass

    # --- timing ---
    for name in ("sim_rrf_fusion", "sim_two_stage_rerank"):
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"{name} sf10 solo")
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        drop_caches()
        samples = []
        for _ in range(n_reps):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(round(time.perf_counter() - t0, 3))
            drop_caches()
        print(f"{name}: min={min(samples)} samples={samples}", flush=True)

    # --- exactness vs whole-corpus reference ---
    emb = qs  # keep linters quiet
    tbl = (
        spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        .select("vec_id", "embedding")
        .toArrow()
    )
    ids = np.asarray(tbl["vec_id"], dtype=np.int64)
    mat = np.asarray(
        [list(v) for v in tbl["embedding"].to_pylist()], dtype=np.float64
    )
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    q_ids, q_mat = load_query_vectors(sf_dir)
    ref = brute_reference(ids, np.asarray(mat), list(q_ids), np.asarray(q_mat))
    print(f"corpus: {ids.size} vectors, {len(q_ids)} queries", flush=True)

    # rrf expected: both ranks <= 100, rrf = 1/(60+cr) + 1/(60+hr),
    # top-10 by (rrf desc, vec_id)
    want_rrf = {}
    for qid, (c, hm, cos_order, ham_order) in ref.items():
        cr = {ids[i]: r + 1 for r, i in enumerate(cos_order[:100])}
        hr = {ids[i]: r + 1 for r, i in enumerate(ham_order[:100])}
        rows = []
        for vid in set(cr) & set(hr):
            score = 1.0 / (60 + cr[vid]) + 1.0 / (60 + hr[vid])
            rows.append((-score, vid, cr[vid], hr[vid]))
        rows.sort()
        for rn, (neg, vid, a, b) in enumerate(rows[:10], 1):
            want_rrf[(qid, int(vid))] = (a, b, round(-neg, 6), rn)
    got_rrf = {
        (r["query_id"], r["vec_id"]): (
            r["cos_rank"], r["ham_rank"], r["rrf"], r["rn"]
        )
        for r in qs["sim_rrf_fusion"](spark, sf_dir).collect()
    }
    assert got_rrf == want_rrf, (
        f"rrf mismatch: {len(got_rrf)} got vs {len(want_rrf)} want; "
        f"diff={set(got_rrf.items()) ^ set(want_rrf.items())}"
    )
    print("sim_rrf_fusion: EXACT vs whole-corpus reference", flush=True)
    drop_caches()

    # rerank expected: top-50 by (hamming, id), rerank by (c desc, id),
    # top-10 with cos_sim rounded 4
    want_rr = {}
    for qid, (c, hm, cos_order, ham_order) in ref.items():
        cand = ham_order[:50]
        rerank = cand[np.lexsort((ids[cand], -c[cand]))][:10]
        for rn, i in enumerate(rerank, 1):
            want_rr[(qid, int(ids[i]))] = (round(float(c[i]), 4), rn)
    got_rr = {
        (r["query_id"], r["vec_id"]): (r["cos_sim"], r["rn"])
        for r in qs["sim_two_stage_rerank"](spark, sf_dir).collect()
    }
    assert got_rr == want_rr, (
        f"rerank mismatch: diff="
        f"{set(got_rr.items()) ^ set(want_rr.items())}"
    )
    print("sim_two_stage_rerank: EXACT vs whole-corpus reference", flush=True)


if __name__ == "__main__":
    main()
