"""LLM-pipeline operator tests: LSH recall vs exact twins, dedup on
constructed duplicates, similarity ranking, multimodal plumbing."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from trendengine_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_near_pairs,
)
from trendengine_spark.operators.multimodal import (
    attach_fake_media,
    decode_image_batch,
    extract_media_features,
)
from trendengine_spark.operators.similarity import (
    cosine_topk,
    random_hyperplane_ann,
)
from trendengine_spark.operators.text import language_id, quality_features
from trendengine_spark.tables import load_table


def docs_with_dups(spark):
    base = load_table(spark, SF_SMOKE, "documents").limit(100)
    dup = base.filter(F.col("doc_id") < 5).withColumn(
        "doc_id", F.col("doc_id") + 100000
    )
    return base.unionByName(dup)


def test_exact_dedup_finds_constructed_dups(spark):
    d = exact_dedup(docs_with_dups(spark)).toPandas()
    assert int((d["n_dups"] == 2).sum()) == 5
    # representative is the minimum id (the original, not the copy)
    assert (d.loc[d["n_dups"] == 2, "rep_id"] < 100000).all()


def test_minhash_lsh_recall_vs_exact(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    exact = ngram_jaccard_pairs(docs, threshold=0.5, n=3).toPandas()
    lsh = minhash_lsh_pairs(docs, threshold=0.35, num_perm=64, bands=16).toPandas()
    exact_pairs = set(zip(exact["id_a"], exact["id_b"]))
    lsh_pairs = set(zip(lsh["id_a"], lsh["id_b"]))
    assert exact_pairs, "fixture should contain near-dup pairs"
    recall = len(exact_pairs & lsh_pairs) / len(exact_pairs)
    assert recall >= 0.9, f"LSH recall {recall:.2f} over {len(exact_pairs)} pairs"


def test_simhash_hamming_on_identical_docs(spark):
    pairs = simhash_near_pairs(docs_with_dups(spark), max_hamming=3).toPandas()
    # the 5 constructed exact dups must appear at hamming 0
    found = set(zip(pairs["id_a"], pairs["id_b"]))
    for i in range(5):
        assert (i, i + 100000) in found
    assert (pairs["hamming"] <= 3).all()


def test_cosine_topk_matches_numpy(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = cosine_topk(emb, queries, k=5).toPandas()

    pdf = emb.toPandas()
    M = np.stack(pdf["embedding"].map(np.asarray, na_action=None).to_numpy()).astype(
        np.float64
    )
    ids = pdf["vec_id"].to_numpy()
    M_n = M / np.linalg.norm(M, axis=1, keepdims=True)
    for qid in range(3):
        qi = int(np.where(ids == qid)[0][0])
        sims = M_n @ M_n[qi]
        order = [
            int(ids[j])
            for j in np.lexsort((ids, -sims))
            if ids[j] != qid
        ][:5]
        mine = got[got["query_id"] == qid].sort_values("rn")["vec_id"].tolist()
        assert mine == order, f"query {qid}: {mine} vs {order}"


def test_ann_recall_vs_bruteforce(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = cosine_topk(emb, queries, k=5).toPandas()
    ann = random_hyperplane_ann(emb, queries, k=5, dim=64).toPandas()
    exact_set = set(zip(exact["query_id"], exact["vec_id"]))
    ann_set = set(zip(ann["query_id"], ann["vec_id"]))
    recall = len(exact_set & ann_set) / len(exact_set)
    assert recall >= 0.5, f"ANN recall {recall:.2f}"


def test_quality_features_ranges(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    q = quality_features(docs).toPandas()
    for col in ("punct_ratio", "digit_ratio", "stopword_ratio", "upper_ratio"):
        assert ((q[col] >= 0) & (q[col] <= 1)).all()
    assert (q["n_tokens"] > 0).all()
    assert (q["n_chars_c"] == q["n_chars"]).all()  # matches the stored column


def test_language_id_deterministic(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    a = language_id(docs).toPandas().sort_values("doc_id")["lang_pred"].tolist()
    b = language_id(docs).toPandas().sort_values("doc_id")["lang_pred"].tolist()
    assert a == b
    assert set(a) <= {"de", "en", "es", "fr", "und"}


def test_multimodal_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        decode_image_batch(pd.Series([b"abc"]), fake=False)


def test_multimodal_feature_plumbing(spark):
    docs = load_table(spark, SF_SMOKE, "documents").limit(50)
    media = attach_fake_media(docs)
    feats = extract_media_features(media, fake=True).toPandas()
    assert len(feats) == 50
    assert (feats["n_bytes"] > 0).all()
    assert ((feats["mean_luma"] >= 0) & (feats["mean_luma"] <= 1)).all()
    # deterministic: re-run produces identical features
    again = extract_media_features(media, fake=True).toPandas()
    merged = feats.merge(again, on="doc_id", suffixes=("_a", "_b"))
    assert (merged["width_a"] == merged["width_b"]).all()


def test_resize_geometry_and_passthrough(spark):
    from trendengine_spark.operators.multimodal import resize_images

    docs = load_table(spark, SF_SMOKE, "documents").limit(50)
    out = resize_images(
        attach_fake_media(docs), max_side=256, fake=True
    ).toPandas()
    assert len(out) == 50
    long_side = out[["out_width", "out_height"]].max(axis=1)
    assert (long_side <= 256).all()
    # never upscale; aspect preserved within floor rounding
    assert (out["out_width"] <= out["width"]).all()
    small = out[out[["width", "height"]].max(axis=1) <= 256]
    assert (small["out_width"] == small["width"]).all()
    with pytest.raises(Exception):  # stub contract: real resample absent
        resize_images(attach_fake_media(docs), fake=False).collect()


def test_frame_sample_row_expansion(spark):
    from trendengine_spark.operators.multimodal import (
        attach_fake_video,
        sample_frames,
    )

    docs = load_table(spark, SF_SMOKE, "documents").limit(30)
    out = sample_frames(
        attach_fake_video(docs), step_ms=1000, fake=True
    ).toPandas()
    per_doc = out.groupby("doc_id").size()
    # duration is ((id % 120) + 1) s at 1 frame/s → (id % 120) + 1 frames
    for doc_id, n in per_doc.items():
        assert n == (doc_id % 120) + 1
    assert (out["ts_ms"] == out["frame_idx"] * 1000).all()
    assert out["frame_md5"].str.len().eq(32).all()


def test_winnow_fingerprints_shared_substring(spark):
    from trendengine_spark.operators.text import winnow_fingerprints

    # two docs sharing a long substring must share >= 1 fingerprint
    # (winnowing guarantee for shared runs >= k + w - 1 chars)
    shared = "the quick brown fox jumps over the lazy dog"
    df = spark.createDataFrame(
        [
            (1, f"AAA {shared} BBB"),
            (2, f"CCC {shared} DDD"),
            (3, "completely unrelated content zzz qqq"),
        ],
        "doc_id long, text string",
    )
    fp = winnow_fingerprints(df, k=5, w=4).toPandas()
    s1 = set(fp[fp.doc_id == 1]["fingerprint"])
    s2 = set(fp[fp.doc_id == 2]["fingerprint"])
    s3 = set(fp[fp.doc_id == 3]["fingerprint"])
    assert s1 & s2
    assert not (s1 & s3)
    # deterministic + distinct per doc
    assert fp.groupby("doc_id")["fingerprint"].nunique().sum() == len(fp)


def test_bpe_ish_tokens(spark):
    from trendengine_spark.operators.text import bpe_ish_tokens

    df = spark.createDataFrame([(1, "it's 2024, ok?!")], "id long, text string")
    toks = df.select(bpe_ish_tokens(F.col("text")).alias("t")).first()["t"]
    assert toks == ["it", "'", "s", "2024", ",", "ok", "?", "!"]


def test_ivf_recall_vs_bruteforce(spark):
    from trendengine_spark.operators.similarity import cosine_topk, ivf_topk

    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = cosine_topk(emb, queries, k=5).toPandas()
    approx = ivf_topk(emb, queries, k=5, n_cells=16, nprobe=6).toPandas()
    hits = tot = 0
    for qid, grp in exact.groupby("query_id"):
        truth = set(grp["vec_id"])
        got = set(approx[approx.query_id == qid]["vec_id"])
        hits += len(truth & got)
        tot += len(truth)
    assert hits / tot >= 0.5  # nprobe=6/16 of the space probed
    # full probe == brute force (exactness when every cell is probed)
    full = ivf_topk(emb, queries, k=5, n_cells=16, nprobe=16).toPandas()
    merged = exact.merge(full, on=["query_id", "rn"], suffixes=("_e", "_f"))
    assert (merged["vec_id_e"] == merged["vec_id_f"]).all()
    # deterministic across runs
    again = ivf_topk(emb, queries, k=5, n_cells=16, nprobe=6).toPandas()
    assert approx.sort_values(["query_id", "rn"]).reset_index(drop=True).equals(
        again.sort_values(["query_id", "rn"]).reset_index(drop=True)
    )


def test_stratified_sample_deterministic_rates(spark):
    import pandas as pd

    from trendengine_spark.operators.pipeline import stratified_sample

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": list(range(400)),
                "lang": ["en", "de", "fr", "zh"] * 100,
                "text": ["x"] * 400,
            }
        )
    )
    out = stratified_sample(docs, rates={"en": 50, "de": 20}, default_rate=10)
    counts = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    # ids for lang L are L_idx + 4k: en ids ≡ 0 (mod 4) → of 100 en ids,
    # those with id % 100 < 50 → exactly 50 per 100-block × id stride 4
    # ⇒ 100 ids spread over 0..396; kept iff id % 100 < rate
    assert counts["en"] == sum(1 for i in range(0, 400, 4) if i % 100 < 50)
    assert counts["de"] == sum(1 for i in range(1, 400, 4) if i % 100 < 20)
    assert counts["fr"] == sum(1 for i in range(2, 400, 4) if i % 100 < 10)
    # deterministic: second run identical
    again = stratified_sample(docs, rates={"en": 50, "de": 20}, default_rate=10)
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )


def test_pack_concat_chunks_layout(spark):
    import pandas as pd

    from trendengine_spark.operators.pipeline import pack_concat_chunks

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 8, 16, 24],  # one shard (n_shards=8)
                "text": ["a " * 300, "b " * 300, "c " * 100, ""],
            }
        )
    )
    rows = {
        r["doc_id"]: r
        for r in pack_concat_chunks(docs, seq_len=512, n_shards=8).collect()
    }
    assert all(r["shard"] == 0 for r in rows.values())
    # stream: doc0 [0,300) seq0 | doc8 [300,600) straddles seq0/seq1 |
    # doc16 [600,700) seq1 | doc24 empty at 700 → degenerate seq1 span
    assert (rows[0]["start_off"], rows[0]["start_seq"], rows[0]["end_seq"]) == (0, 0, 0)
    assert (rows[8]["start_off"], rows[8]["start_seq"], rows[8]["end_seq"]) == (300, 0, 1)
    assert (rows[16]["start_off"], rows[16]["start_seq"], rows[16]["end_seq"]) == (600, 1, 1)
    assert (rows[24]["n_tokens"], rows[24]["start_seq"], rows[24]["end_seq"]) == (0, 1, 1)


def test_key_skew_profile_values(spark):
    import pandas as pd

    from trendengine_spark.operators.profile import key_skew_profile

    df = spark.createDataFrame(
        pd.DataFrame({"k": [1] * 6 + [2] * 3 + [3] * 1, "v": range(10)})
    )
    r = key_skew_profile(df, "k", top_k=2).collect()[0]
    assert (r["n_rows"], r["n_keys"], r["max_per_key"]) == (10, 3, 6)
    assert abs(r["mean_per_key"] - 10 / 3) < 1e-6
    assert abs(r["skew_ratio"] - 6 / (10 / 3)) < 1e-6
    assert r["hot_keys"] == "1:6,2:3"


def test_null_profile_counts(spark):
    import pandas as pd

    from trendengine_spark.operators.profile import null_profile

    df = spark.createDataFrame(
        pd.DataFrame({"a": [1, None, 3], "b": [None, None, "x"]})
    )
    rows = {r["column_name"]: r for r in null_profile(df).collect()}
    assert rows["a"]["n_null"] == 1 and rows["b"]["n_null"] == 2
    assert rows["b"]["null_frac"] == round(2 / 3, 6)


def test_near_dup_adaptive_floor_non_vacuous(spark):
    """VERDICT r5: the bare 99.9-percentile cut returned exactly 1 pair
    at sf0.01 — thin evidence. The min_pairs floor must keep at least
    5 surviving pairs at both test scales."""
    from tests.conftest import SF_CORRECT
    from trendengine_spark.operators.similarity import embedding_near_dup_pairs

    for sf in (SF_SMOKE, SF_CORRECT):
        emb = load_table(spark, sf, "embeddings")
        pairs = embedding_near_dup_pairs(
            emb, threshold=None, dim=64, quantile=0.999, min_pairs=10
        ).toPandas()
        assert len(pairs) >= 5, f"{sf}: only {len(pairs)} near-dup pairs"
        assert (pairs["id_a"] < pairs["id_b"]).all()


def test_ann_empty_query_set_returns_empty(spark):
    """ADVICE r5 (low): an empty query set used to reach the BLAS
    matmul as a (0,)-shaped array and raise ValueError."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    empty_q = emb.filter(F.col("vec_id") < 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = random_hyperplane_ann(emb, empty_q, k=5, dim=64)
    assert out.count() == 0
    assert out.columns == ["query_id", "vec_id", "cos_sim", "rn"]


def test_real_video_frame_sample_end_to_end(spark):
    """r6: multimodal_frame_sample is a REAL decode path — container
    parse (AVI RIFF walk) + baseline-JPEG entropy decode. Frame md5s
    must equal hashlib over the exact encoder output, and decoded
    grays the generating arithmetic."""
    import hashlib

    from trendengine_spark.operators.codecs import jpeg_encode
    from trendengine_spark.operators.multimodal import (
        attach_mjpeg_video,
        decode_frame_stats,
        sample_frames,
    )

    docs = load_table(spark, SF_SMOKE, "documents").limit(20)
    media = attach_mjpeg_video(docs)
    frames = sample_frames(media, step_ms=1000, fake=False)
    got = frames.toPandas().sort_values(["doc_id", "frame_idx"])
    for _, row in got.iterrows():
        did, i = int(row["doc_id"]), int(row["frame_idx"])
        expect = jpeg_encode(
            np.full((16, 16), (did * 31 + i * 17) % 256, dtype=np.uint8)
        )
        assert bytes(row["frame"]) == expect
        assert row["frame_md5"] == hashlib.md5(expect).hexdigest()
    stats = decode_frame_stats(frames).toPandas()
    assert (
        stats["gray"]
        == (stats["doc_id"] * 31 + stats["frame_idx"] * 17) % 256
    ).all()
    # frame count per doc = (id % 4) + 2 at 1 fps / 1000 ms step
    per_doc = got.groupby("doc_id").size()
    for did, n in per_doc.items():
        assert n == (did % 4) + 2


def test_pq_adc_and_refined_recall(spark):
    """PQ two-stage contract at sf0.01: raw ADC candidates carry real
    signal (recall@5 ≥ 0.4 vs brute force at m=32 × k=32), and the
    exact re-rank of the 4× pool recovers ≥ 0.9 — measured 1.0."""
    from pyspark.sql import functions as F

    from trendengine_spark.operators.similarity import (
        cosine_topk,
        l2_normalize,
        pq_encode,
        pq_topk,
        pq_train_codebooks,
    )
    from trendengine_spark.queries import all_queries
    from trendengine_spark.tables import load_table

    sf = "/root/testdata/sf0.01"
    emb = load_table(spark, sf, "embeddings")
    unit = emb.select("vec_id", l2_normalize(F.col("embedding")).alias("embedding"))
    queries = unit.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    bf = cosine_topk(unit, queries, k=5).toPandas()
    truth = {q: set(bf[bf.query_id == q].vec_id) for q in range(10)}

    books = pq_train_codebooks(unit, m_subspaces=32, k=32, iters=3, seed=7)
    assert books.shape == (32, 32, 2)
    raw = pq_topk(pq_encode(unit, books), books, queries, k=5).toPandas()
    raw_rec = sum(
        len(set(raw[raw.query_id == q].vec_id) & truth[q]) / 5 for q in range(10)
    ) / 10
    assert raw_rec >= 0.4, raw_rec

    refined = all_queries()["sim_pq_topk"](spark, sf).toPandas()
    assert len(refined) == 50
    ref_rec = sum(
        len(set(refined[refined.query_id == q].vec_id) & truth[q]) / 5
        for q in range(10)
    ) / 10
    assert ref_rec >= 0.9, ref_rec


def test_range_search_subsumes_topk_above_threshold(spark):
    """Radius search at τ must return exactly the topk rows whose
    similarity clears τ (same scoring path, count-bound vs
    similarity-bound), and an empty query set must degrade to an
    empty frame instead of crashing the BLAS pass."""
    from trendengine_spark.operators.similarity import (
        cosine_range_search,
        cosine_topk,
    )

    sf = SF_SMOKE
    emb = load_table(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    tau = 0.3
    rng = cosine_range_search(emb, queries, threshold=tau).toPandas()
    assert len(rng) > 0
    assert (rng["cos_sim"] >= tau - 1e-9).all()
    topk = cosine_topk(emb, queries, k=5).toPandas()
    top_above = topk[topk.cos_sim >= tau]
    got = set(zip(rng.query_id, rng.vec_id))
    assert set(zip(top_above.query_id, top_above.vec_id)) <= got

    empty = cosine_range_search(
        emb, queries.filter(F.col("query_id") < 0), threshold=tau
    )
    assert empty.count() == 0


def test_audio_spectrogram_recovers_tone_frequency(spark):
    """Every frame's dominant FFT bin must land within one bin width
    (8000/256 = 31.25 Hz) of the generated sine frequency — a wrong
    window, framing, decode, or FFT shifts it."""
    from trendengine_spark.queries import all_queries

    pdf = all_queries()["multimodal_audio_spectrogram"](
        spark, SF_SMOKE
    ).toPandas()
    assert len(pdf) > 0
    expected_hz = 200.0 + (pdf["doc_id"] % 20) * 150.0
    err = (pdf["dominant_hz"] - expected_hz).abs()
    assert float(err.max()) <= 8000.0 / 256, float(err.max())
    assert (pdf["energy"] > 0).all()
    # n_frames per doc = (n_samples - 256)//128 + 1 with
    # n = 1024 + (doc_id % 4)*256
    n = 1024 + (pdf["doc_id"] % 4) * 256
    want_frames = (n - 256) // 128 + 1
    got_frames = pdf.groupby("doc_id")["frame_idx"].count()
    import pandas as pd

    per_doc_want = want_frames.groupby(pdf["doc_id"]).first()
    assert got_frames.equals(per_doc_want.astype(got_frames.dtype))


def test_recall_at_10_pinned_floors(spark):
    """Measured retrieval quality of all three approximate paths vs
    exact brute force, recall@10 at sf0.01 (20 queries, floors set
    ~0.1 under the tools/recall_study.py measurement so noise can't
    flake them; full sweep incl. sf0.1 in SCALE.md):

    - hyperplane LSH (12 bands x 4 planes): measured 0.80 -> >= 0.6
    - IVF nprobe=8/16 cells: measured 0.74 -> >= 0.55 (the synthetic
      embeddings are ~uniform on the sphere — IVF's worst case, so
      recall tracks the probed-mass fraction; nprobe=16 is exact,
      pinned in test_ivf_recall_vs_bruteforce)
    - PQ ADC m=32 x k=32: measured 0.73 -> >= 0.5 (raw codes;
      the re-ranked sim_pq_topk stage is pinned >= 0.9 in
      test_pq_adc_and_refined_recall)
    """
    from trendengine_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
        l2_normalize,
        pq_encode,
        pq_topk,
        pq_train_codebooks,
        random_hyperplane_ann,
    )

    sf = "/root/testdata/sf0.01"
    emb = load_table(spark, sf, "embeddings")
    unit = emb.select(
        "vec_id", l2_normalize(F.col("embedding")).alias("embedding")
    ).cache()
    queries = unit.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    def recall(got_pd, exact_pd, k=10):
        hits = tot = 0
        for qid, grp in exact_pd.groupby("query_id"):
            truth = set(grp.sort_values("rn")["vec_id"].head(k))
            mine = set(got_pd[got_pd.query_id == qid]["vec_id"])
            hits += len(truth & mine)
            tot += len(truth)
        return hits / tot

    exact = cosine_topk(unit, queries, k=10).toPandas()

    lsh = random_hyperplane_ann(unit, queries, k=10).toPandas()
    r_lsh = recall(lsh, exact)
    assert r_lsh >= 0.6, f"LSH recall@10 {r_lsh:.2f}"

    ivf = ivf_topk(unit, queries, k=10, n_cells=16, nprobe=8).toPandas()
    r_ivf = recall(ivf, exact)
    assert r_ivf >= 0.55, f"IVF nprobe=8 recall@10 {r_ivf:.2f}"

    books = pq_train_codebooks(unit, m_subspaces=32, k=32, iters=3, seed=7)
    pq = pq_topk(pq_encode(unit, books), books, queries, k=10).toPandas()
    r_pq = recall(pq, exact)
    assert r_pq >= 0.5, f"PQ m=32 ADC recall@10 {r_pq:.2f}"
    unit.unpersist()


def test_ivfpq_recall_and_contract(spark):
    """Composed IVF+residual-PQ index: recall@10 at nprobe=8/16 cells,
    m=32 codes — measured 0.63 at sf0.01 (the two approximations
    compound: IVF@8 alone 0.74, PQ m=32 alone 0.73); floor pinned at
    0.45. Self-matches excluded, k rows per query."""
    from trendengine_spark.operators.similarity import (
        cosine_topk,
        ivfpq_index,
        ivfpq_topk,
        l2_normalize,
    )

    sf = "/root/testdata/sf0.01"
    emb = load_table(spark, sf, "embeddings")
    unit = emb.select(
        "vec_id", l2_normalize(F.col("embedding")).alias("embedding")
    ).cache()
    queries = unit.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = cosine_topk(unit, queries, k=10).toPandas()
    codes, cent, books = ivfpq_index(
        unit, n_cells=16, m_subspaces=32, k_codes=32, iters=2, seed=7
    )
    got = ivfpq_topk(codes, cent, books, queries, k=10, nprobe=8).toPandas()
    hits = tot = 0
    for qid, grp in exact.groupby("query_id"):
        truth = set(grp.sort_values("rn")["vec_id"].head(10))
        mine = set(got[got.query_id == qid]["vec_id"])
        assert qid not in mine  # no self-matches
        assert len(mine) == 10
        hits += len(truth & mine)
        tot += len(truth)
    assert hits / tot >= 0.45, f"IVFPQ recall@10 {hits/tot:.2f}"
    # full probe (= every cell) must beat partial probe
    full = ivfpq_topk(codes, cent, books, queries, k=10, nprobe=16).toPandas()
    h2 = sum(
        len(
            set(exact[exact.query_id == q].sort_values("rn")["vec_id"].head(10))
            & set(full[full.query_id == q]["vec_id"])
        )
        for q in range(20)
    )
    assert h2 >= hits
    unit.unpersist()


def test_incremental_minhash_index_catches_cross_batch_dups(spark, tmp_path):
    """Production incremental dedup: write the corpus LSH index once,
    then probe an ingest batch against it — planted near-copies of
    indexed docs must surface as (new_id, index_id) pairs with high
    estimated Jaccard; genuinely new docs must not. The corpus is
    never re-signatured at probe time (the probe plan reads the
    stored band/signature parquet)."""
    from trendengine_spark.operators.dedup import (
        incremental_minhash_dedup,
        write_minhash_index,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    idx_path = str(tmp_path / "mh_index")
    meta = write_minhash_index(docs, idx_path)
    assert meta["n_docs"] == docs.count()

    # ingest batch: 5 exact copies of indexed docs (shifted ids) + 5
    # fresh token-soup docs that match nothing
    copies = docs.filter(F.col("doc_id") < 5).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    fresh = spark.range(5).select(
        (F.col("id") + 2_000_000).alias("doc_id"),
        F.concat_ws(
            " ",
            *[F.concat(F.lit(f"zq{j}x"), F.col("id").cast("string"))
              for j in range(30)],
        ).alias("text"),
    )
    batch = copies.unionByName(fresh)
    hits = incremental_minhash_dedup(batch, idx_path, threshold=0.5)
    got = hits.toPandas()
    # every planted copy found against its source doc with est ~1.0
    planted = got[got.new_id >= 1_000_000]
    planted = planted[planted.new_id < 2_000_000]
    found = {(r.new_id, r.index_id) for r in planted.itertuples()}
    for i in range(5):
        assert (1_000_000 + i, i) in found
        assert (
            got[(got.new_id == 1_000_000 + i) & (got.index_id == i)][
                "est_jaccard"
            ].iloc[0]
            >= 0.99
        )
    # fresh docs match nothing
    assert (got.new_id >= 2_000_000).sum() == 0


def test_ivfpq_partial_topk_tie_break_deterministic(spark):
    """ADVICE r7: the per-batch partial top-k must break exact score
    ties by id ASC (matching the final window's score DESC, id ASC),
    otherwise duplicate vectors make results partitioning-dependent.
    40 identical vectors: top-k must be the k smallest ids regardless
    of how the code table is partitioned."""
    from trendengine_spark.operators.similarity import (
        ivfpq_index,
        ivfpq_topk,
        l2_normalize,
    )

    vec = [1.0] + [0.0] * 31
    rows = [(i, vec) for i in range(40)]
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).select("vec_id", l2_normalize(F.col("embedding")).alias("embedding"))
    queries = corpus.filter(F.col("vec_id") == 39).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    codes, cent, books = ivfpq_index(
        corpus, n_cells=2, m_subspaces=4, k_codes=4, iters=1, seed=3
    )
    want = list(range(10))  # all scores tie -> smallest ids win
    for nparts in (1, 7):
        got = (
            ivfpq_topk(
                codes.repartition(nparts), cent, books, queries, k=10, nprobe=2
            )
            .orderBy("rn")
            .toPandas()
        )
        assert list(got["vec_id"]) == want, f"nparts={nparts}"


def test_containment_max_df_caps_hot_shingles(spark):
    """r8 (ADVICE/VERDICT task 5): ngram_containment_pairs must mirror
    the Jaccard twin's max_df cap — a boilerplate shingle in every doc
    must stop generating df^2 candidates under the cap while
    planted-copy pairs (shingle df = 2) survive with containment 1."""
    from trendengine_spark.operators.dedup import ngram_containment_pairs

    boiler = "all rights reserved by example authority "
    rows = [(i, boiler + f"unique tail {i} alpha beta{i} gamma{i}")
            for i in range(30)]
    rows.append((100, rows[0][1]))  # exact copy of doc 0
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    capped = ngram_containment_pairs(
        docs, threshold=0.5, n=3, max_df=2
    ).toPandas()
    got = {(r.id_a, r.id_b) for r in capped.itertuples()}
    assert got == {(0, 100), (100, 0)}
    assert (capped["containment"] == 1.0).all()
    # uncapped: the boilerplate shingles alone pair everything with
    # everything at a low threshold — the df^2 blow-up the cap exists
    # to stop
    unc = ngram_containment_pairs(docs, threshold=0.05, n=3).count()
    assert unc == 31 * 30


def test_weighted_sample_deterministic_and_weight_sensitive(spark):
    """A-ES weighted sampling: identical results across partitionings
    and reruns (pure function of seed/id/weight); heavier rows must be
    overrepresented (probability ~ w/(sum w) for the top draw); zero
    or negative weights excluded; stratified form keeps k per group."""
    from pyspark.sql import functions as F

    from trendengine_spark.operators.pipeline import weighted_sample

    rows = [(i, 1.0 if i % 10 else 100.0, f"s{i % 2}") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, w double, grp string")
    a = sorted(
        r["doc_id"] for r in weighted_sample(df, 50, "w").collect()
    )
    b = sorted(
        r["doc_id"]
        for r in weighted_sample(df.repartition(17), 50, "w").collect()
    )
    assert a == b and len(a) == 50
    # 100 heavy rows hold ~99% of the mass: they must dominate the
    # sample (expected ~48.7 of 50; loose floor well above chance)
    heavy = sum(1 for i in a if i % 10 == 0)
    assert heavy >= 35, heavy
    # a different seed gives a different (but still deterministic) set
    c = sorted(
        r["doc_id"] for r in weighted_sample(df, 50, "w", seed=7).collect()
    )
    assert c != a
    # zero/negative weights never sampled
    dz = spark.createDataFrame(
        [(1, 0.0), (2, -3.0), (3, 5.0)], "doc_id long, w double"
    )
    assert [
        r["doc_id"] for r in weighted_sample(dz, 3, "w").collect()
    ] == [3]
    # stratified: k per stratum
    s = weighted_sample(df, 10, "w", strata_col="grp").groupBy("grp").count()
    assert {r["grp"]: r["count"] for r in s.collect()} == {
        "s0": 10,
        "s1": 10,
    }


def test_heavy_hitters_mg_equals_exact_groupby(spark):
    """Planted skew: MG candidates + verify must EQUAL the exact
    GROUP BY/HAVING answer, independent of partitioning."""
    from trendengine_spark.operators.profile import heavy_hitters_mg

    # 3 hot keys (freq > 1/16) in a sea of 500 cold keys
    rows = (
        [("hot_a",)] * 400 + [("hot_b",)] * 300 + [("hot_c",)] * 150
        + [(f"cold_{i % 500}",) for i in range(1000)]
    )
    for nparts in (1, 7, 32):
        df = spark.createDataFrame(rows, "k string").repartition(nparts)
        got = heavy_hitters_mg(df, "k", denom=16, counters=64).collect()
        n = len(rows)
        exact = {
            (r["k"], r["cnt"])
            for r in df.groupBy("k").agg(F.count(F.lit(1)).alias("cnt")).collect()
            if r["cnt"] * 16 > n
        }
        assert {(r["k"], r["cnt"]) for r in got} == exact, nparts
        assert exact == {("hot_a", 400), ("hot_b", 300), ("hot_c", 150)}


def test_heavy_hitters_gate_boundary_equality(spark):
    """The cardinality-gated dispatcher (r12): forcing the gate to
    each side of the boundary on the SAME data must give identical
    results — the exact branch (gate above the cardinality) and the
    Misra-Gries branch (gate at 0, everything goes to MG) are equal
    answers by the mergeable-summaries bound, and the gate may only
    ever change the plan."""
    from trendengine_spark.operators.profile import (
        heavy_hitters,
        heavy_hitters_mg,
    )

    rows = (
        [("hot_a",)] * 400 + [("hot_b",)] * 300 + [("hot_c",)] * 150
        + [(f"cold_{i % 500}",) for i in range(1000)]
    )
    df = spark.createDataFrame(rows, "k string").repartition(7)
    exact_branch = heavy_hitters(
        df, "k", denom=16, counters=64, max_exact_distinct=10**9
    ).collect()
    mg_branch = heavy_hitters(
        df, "k", denom=16, counters=64, max_exact_distinct=0
    ).collect()
    direct_mg = heavy_hitters_mg(df, "k", denom=16, counters=64).collect()
    as_set = lambda rs: {(r["k"], r["cnt"]) for r in rs}  # noqa: E731
    assert (
        as_set(exact_branch)
        == as_set(mg_branch)
        == as_set(direct_mg)
        == {("hot_a", 400), ("hot_b", 300), ("hot_c", 150)}
    )
    # default gate on this data picks the exact branch (cardinality
    # far below 10^8) and still matches
    dflt = heavy_hitters(df, "k", denom=16).collect()
    assert as_set(dflt) == as_set(exact_branch)


def test_heavy_hitters_mg_empty_when_uniform(spark):
    """Uniform keys below threshold -> empty result, no crash."""
    from trendengine_spark.operators.profile import heavy_hitters_mg

    df = spark.range(0, 2000).select((F.col("id") % 200).alias("k"))
    assert heavy_hitters_mg(df, "k", denom=64, counters=256).count() == 0


def test_heavy_hitters_mg_summary_is_bounded(spark):
    """The phase-1 summary output stays <= counters rows per partition
    even when the partition has far more distinct keys."""
    from trendengine_spark.operators.profile import heavy_hitters_mg

    df = spark.range(0, 5000).select(F.col("id").alias("k")).coalesce(2)
    # distinct=5000 >> counters=32: verify no blow-up and exact result
    out = heavy_hitters_mg(df, "k", denom=8, counters=32)
    assert out.count() == 0  # every key occurs once; none above N/8


def test_redact_pii_golden(spark):
    """Golden strings through the JVM redaction chain."""
    from trendengine_spark.operators.text import pii_counts, redact_pii

    cases = [
        ("mail bob.smith+x@corp.example.com now", "mail <EMAIL> now", 1, 0, 0),
        ("call 555-123-4567 twice 555-000-1111", "call <PHONE> twice <PHONE>", 0, 2, 0),
        ("host 192.168.0.1 up", "host <IP> up", 0, 0, 1),
        # email domain must win over the IPv4 rule
        ("ping a@10.0.0.1x.com end", "ping <EMAIL> end", 1, 0, 0),
        ("clean text only", "clean text only", 0, 0, 0),
    ]
    df = spark.createDataFrame([(s,) for s, *_ in cases], "s string")
    c = pii_counts(F.col("s"))
    got = df.select(
        "s",
        redact_pii(F.col("s")).alias("r"),
        c["n_emails"].alias("e"),
        c["n_phones"].alias("p"),
        c["n_ips"].alias("i"),
    ).collect()
    by_s = {r["s"]: r for r in got}
    for s, want, e, p, i in cases:
        r = by_s[s]
        assert r["r"] == want, s
        assert (r["e"], r["p"], r["i"]) == (e, p, i), s


def test_winnow_arrow_matches_expression_path(spark):
    """The Arrow winnowing path must be row-identical to the pure-JVM
    expression path on edge-shaped inputs (short docs, < w grams,
    repeated substrings, nulls, multi-space runs, mixed case)."""
    from trendengine_spark.operators.text import winnow_fingerprints

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "abcd"),               # < k chars -> no rows
        (3, "abcde"),              # exactly one gram (< w hashes)
        (4, "abcdefg"),            # 3 grams (< w)
        (5, "aaaaaaaaaaaaaaaa"),   # degenerate repeats -> 1 distinct
        (6, None),                 # null text -> no rows
        (7, "  The   QUICK  brown\tfox  "),  # normalization stress
        (8, "the quick brown fox jumps over the lazy dog"),  # dup of 1
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(
        map(tuple, winnow_fingerprints(df, k=5, w=4, impl="arrow").collect())
    )
    e = sorted(
        map(tuple, winnow_fingerprints(df, k=5, w=4, impl="expr").collect())
    )
    assert a == e
    assert a, "expected non-empty fingerprints"
    # docs 1 and 8 share full text -> identical fingerprint sets
    fa = {fp for d, fp in a if d == 1}
    fb = {fp for d, fp in a if d == 8}
    assert fa == fb and fa
    assert not any(d in (2, 6) for d, _ in a)


def test_ivfpq_persisted_index_matches_inmemory(spark, tmp_path):
    """Build-once/probe-forever IVFPQ: the persisted-index query path
    must return EXACTLY the in-memory ivfpq_topk results (same seed →
    same centroids/books; codes round-trip losslessly through
    parquet), and the codes scan must be partition-pruned to the
    probed cells."""
    from trendengine_spark.operators.similarity import (
        ivfpq_index,
        ivfpq_query_index,
        ivfpq_topk,
        ivfpq_write_index,
    )
    from trendengine_spark.queries.base import t as load_t

    emb = load_t(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    params = dict(n_cells=8, m_subspaces=4, k_codes=8, iters=2, seed=11)
    codes, cent, books = ivfpq_index(emb, **params)
    r_mem = sorted(
        map(tuple, ivfpq_topk(codes, cent, books, queries, k=5, nprobe=3).collect())
    )
    idx = str(tmp_path / "ivfpq_idx")
    ivfpq_write_index(emb, idx, **params)
    q2 = ivfpq_query_index(spark, idx, queries, k=5, nprobe=3)
    r_disk = sorted(map(tuple, q2.collect()))
    assert r_mem == r_disk and r_disk

    plan = q2._jdf.queryExecution().executedPlan().toString()
    scan_lines = [l for l in plan.splitlines() if "codes" in l and "Scan" in l]
    assert any("PartitionFilters" in l and "cell" in l for l in plan.splitlines()), (
        "expected a partition-pruned codes scan"
    )


def test_ivfpq_persisted_empty_queries(spark, tmp_path):
    from trendengine_spark.operators.similarity import (
        ivfpq_query_index,
        ivfpq_write_index,
    )
    from trendengine_spark.queries.base import t as load_t

    emb = load_t(spark, SF_SMOKE, "embeddings")
    idx = str(tmp_path / "ivfpq_idx0")
    ivfpq_write_index(emb, idx, n_cells=4, m_subspaces=4, k_codes=8)
    empty_q = emb.filter(F.col("vec_id") < 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    assert ivfpq_query_index(spark, idx, empty_q, k=3).count() == 0


def test_append_minhash_index_batch_key_retry_noop(spark, tmp_path):
    """ADVICE r8: a retried append with the same batch_key must not
    duplicate signature/band rows (applied keys recorded in the
    manifest after both writes)."""
    from trendengine_spark.operators.dedup import (
        append_minhash_index,
        write_minhash_index,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    idx = str(tmp_path / "mh_idx")
    write_minhash_index(docs.filter(F.col("doc_id") < 50), idx)
    batch = docs.filter(
        (F.col("doc_id") >= 50) & (F.col("doc_id") < 60)
    )
    append_minhash_index(batch, idx, batch_key="b1")
    n_sig = spark.read.parquet(f"{idx}/signatures").count()
    n_band = spark.read.parquet(f"{idx}/bands").count()
    meta = append_minhash_index(batch, idx, batch_key="b1")  # retry
    assert spark.read.parquet(f"{idx}/signatures").count() == n_sig
    assert spark.read.parquet(f"{idx}/bands").count() == n_band
    assert meta["applied"] == ["b1"]
    # a new key still appends
    batch2 = docs.filter(
        (F.col("doc_id") >= 60) & (F.col("doc_id") < 65)
    )
    append_minhash_index(batch2, idx, batch_key="b2")
    assert spark.read.parquet(f"{idx}/signatures").count() == n_sig + 5


def test_append_minhash_index_honors_md5_family(spark, tmp_path):
    """ADVICE r9: appending to an index built with family='md5' must
    write md5-family signatures and md5 STRING band buckets — not
    xxhash64 longs (which would never match future probes and break
    the bands/ parquet schema). A doc appended and then probed with
    its own text must come back as a hit."""
    from trendengine_spark.operators.dedup import (
        append_minhash_index,
        incremental_minhash_dedup,
        write_minhash_index,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    idx = str(tmp_path / "mh_idx_md5")
    write_minhash_index(
        docs.filter(F.col("doc_id") < 40), idx, family="md5"
    )
    batch = docs.filter((F.col("doc_id") >= 40) & (F.col("doc_id") < 50))
    append_minhash_index(batch, idx, batch_key="m1")
    # band buckets must stay the md5 string type end-to-end
    bands = spark.read.parquet(f"{idx}/bands")
    assert dict(bands.dtypes)["bucket"] == "string"
    # a self-copy of an APPENDED doc must probe as a duplicate
    probe = batch.filter(F.col("doc_id") == 45).withColumn(
        "doc_id", F.lit(9945).cast("long")
    )
    hits = incremental_minhash_dedup(probe, idx, threshold=0.9)
    assert hits.filter(F.col("index_id") == 45).count() == 1


# ---------------------------------------------------------------- r9:
# image near-dup via perceptual hash (dHash over the real PNG path)


def test_image_dhash_planted_recall_and_invariance(spark):
    """Every planted near-dup pair (2k, 2k+1) — 2x upscale, +1
    brightness, re-encoded — must be recovered at Hamming <= 7
    (recall 1.0; the 8-block pigeonhole join is lossless for <= 7 by
    construction), and a pure resize with no brightness change must
    hash IDENTICALLY (dHash compares neighboring cell-mean order,
    which nearest-neighbor upscaling preserves exactly)."""
    import numpy as np
    import pandas as pd

    from trendengine_spark.operators.codecs import png_encode
    from trendengine_spark.operators.multimodal import image_dhash
    from trendengine_spark.queries import REGISTRY

    sf = "/root/testdata/sf0.001"
    rows = REGISTRY["dedup_image_phash"].fn(spark, sf).collect()
    pairs = {(r["index_id"], r["new_id"]) for r in rows}
    docs = {
        r[0]
        for r in spark.read.parquet(f"{sf}/documents.parquet")
        .select("doc_id")
        .collect()
    }
    planted = {
        (d, d + 1) for d in docs if d % 2 == 0 and d + 1 in docs
    }
    assert planted <= pairs, f"missed {sorted(planted - pairs)[:5]}"
    assert all(r["hamming"] <= 7 for r in rows)

    # resize-only invariance: the same texture at 1x and 2x (no
    # brightness shift) must produce hamming 0
    rng = np.random.RandomState(11)
    base = rng.randint(0, 256, size=(32, 36)).astype(np.uint8)
    up = np.kron(base, np.ones((2, 2), dtype=np.uint8))
    pdf = pd.DataFrame(
        {"doc_id": [0, 1], "media": [png_encode(base[:, :, None]),
                                     png_encode(up[:, :, None])]}
    )
    out = image_dhash(spark.createDataFrame(pdf)).collect()
    h = {r["doc_id"]: r["dhash"] for r in out}
    assert h[0] == h[1]


def _brute_rank_reference(ids, mat, q_ids, q_mat, exclude_self=True):
    """Pure-numpy whole-corpus reference for the fused one-pass
    retrieval operators (r14): per query, exact einsum cosine (the
    operators' own signature, so doubles are bit-identical) and
    sign-code Hamming for EVERY candidate — no batch-local pruning,
    so any union-decomposition bug in the operators shows up as a
    membership or rank mismatch against this."""
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
        cand = np.flatnonzero(ids != qid) if exclude_self else np.arange(
            ids.size
        )
        cos_order = cand[np.lexsort((ids[cand], -c[cand]))]
        ham_order = cand[np.lexsort((ids[cand], hm[cand]))]
        out[qid] = (ids, c, hm, cos_order, ham_order)
    return out


def test_fused_retrieval_union_decomposition_is_exact(spark):
    """r14 one-pass retrieval operators: the batch-local
    top-``depth``/top-``budget`` UNION must reproduce the exact
    whole-corpus ranking — membership AND rank values — on a corpus
    deliberately split across many partitions (so the union logic,
    not a single-batch degenerate case, is what's exercised)."""
    from pyspark.sql import functions as F

    from trendengine_spark.operators.similarity import (
        cosine_hamming_candidates,
        two_stage_rerank,
    )
    from pyspark.sql import Window

    rng = np.random.RandomState(7)
    n, d = 600, 64
    mat = rng.normal(size=(n, d))
    ids = np.arange(n, dtype=np.int64)
    pdf = pd.DataFrame({"vec_id": ids, "embedding": [list(v) for v in mat]})
    # 8 partitions -> every batch prunes locally; depth << n
    corpus = spark.createDataFrame(pdf).repartition(8)
    q_ids = list(range(4))
    q_mat = mat[:4]
    ref = _brute_rank_reference(ids, mat, q_ids, q_mat)

    depth = 25
    pairs = cosine_hamming_candidates(
        corpus, (q_ids, q_mat), depth=depth
    )
    w_cos = Window.partitionBy("query_id").orderBy(F.desc("c"), "vec_id")
    w_ham = Window.partitionBy("query_id").orderBy("hamming", "vec_id")
    got = (
        pairs.withColumn("cos_rank", F.row_number().over(w_cos))
        .withColumn("ham_rank", F.row_number().over(w_ham))
        .filter((F.col("cos_rank") <= depth) & (F.col("ham_rank") <= depth))
        .collect()
    )
    got_map = {
        (r["query_id"], r["vec_id"]): (r["cos_rank"], r["ham_rank"])
        for r in got
    }
    want = {}
    for qid, (aids, c, hm, cos_order, ham_order) in ref.items():
        cos_rank = {aids[i]: r + 1 for r, i in enumerate(cos_order)}
        ham_rank = {aids[i]: r + 1 for r, i in enumerate(ham_order)}
        for vid in aids:
            if vid == qid:
                continue
            cr, hr = cos_rank[vid], ham_rank[vid]
            if cr <= depth and hr <= depth:
                want[(qid, vid)] = (cr, hr)
    assert got_map == want

    # two_stage_rerank: global top-budget by (hamming, id) then
    # top-k by (c desc, id), rank values exact
    k, budget = 5, 30
    got2 = two_stage_rerank(
        corpus, k=k, budget=budget, queries_local=(q_ids, q_mat)
    ).collect()
    got2_map = {
        (r["query_id"], r["vec_id"]): (r["cos_sim"], r["rn"]) for r in got2
    }
    want2 = {}
    for qid, (aids, c, hm, cos_order, ham_order) in ref.items():
        cand_idx = ham_order[:budget]
        rerank = cand_idx[np.lexsort((aids[cand_idx], -c[cand_idx]))][:k]
        for r, i in enumerate(rerank):
            want2[(qid, aids[i])] = (round(float(c[i]), 4), r + 1)
    assert got2_map == want2


def test_two_stage_rerank_recall_floors(spark):
    """End recall of the two-stage (Hamming -> exact cosine) pipeline
    vs brute force at two candidate budgets — the production role of
    the low-standalone-recall binary codes. The pipeline is fully
    deterministic (integer stage-1, id tie-breaks), so these are
    exact values at this corpus; floors leave margin only for
    testdata regeneration. Budget sensitivity (0.66 @ 50 vs 0.99 @
    200 on 500 vectors) is the documented knob: recall tracks
    budget/N on an isotropic corpus."""
    from trendengine_spark.operators.similarity import (
        cosine_topk,
        load_query_vectors,
        two_stage_rerank,
    )
    from trendengine_spark.queries.base import t as _t

    sf = "/root/testdata/sf0.01"
    emb = _t(spark, sf, "embeddings")
    brute = {}
    for r in cosine_topk(
        emb, k=10, queries_local=load_query_vectors(sf)
    ).collect():
        brute.setdefault(r[0], set()).add(r[1])
    floors = {50: 0.55, 200: 0.95}
    for budget, floor in floors.items():
        got = {}
        for r in two_stage_rerank(emb, k=10, budget=budget).collect():
            got.setdefault(r["query_id"], set()).add(r["vec_id"])
        recall = sum(len(brute[q] & got[q]) / 10 for q in brute) / len(brute)
        assert recall >= floor, (budget, recall)


def test_simhash_md5_family_exact_dup_and_ann_md5_recall(spark):
    """r10 md5-family conversions: (a) a verbatim copy of a document
    must SimHash-fingerprint identically under family='md5' (hamming
    0 pair recovered through the pigeonhole join); (b) md5-sign-plane
    ANN must keep a sane recall floor vs brute force — the portable
    family trades bucket isotropy, not correctness."""
    from trendengine_spark.operators.dedup import simhash_near_pairs
    from trendengine_spark.operators.similarity import (
        cosine_topk,
        random_hyperplane_ann,
    )

    docs = load_table(spark, SF_SMOKE, "documents").limit(50)
    copies = docs.filter(F.col("doc_id") < 3).withColumn(
        "doc_id", F.col("doc_id") + 100000
    )
    pairs = simhash_near_pairs(
        docs.unionByName(copies), max_hamming=3, family="md5"
    ).collect()
    zero = {(r["id_a"], r["id_b"]) for r in pairs if r["hamming"] == 0}
    assert all((i, i + 100000) in zero for i in range(3))

    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = cosine_topk(emb, queries, k=5).toPandas()
    ann = random_hyperplane_ann(
        emb, queries, k=5, dim=64, family="md5"
    ).toPandas()
    exact_set = set(zip(exact["query_id"], exact["vec_id"]))
    ann_set = set(zip(ann["query_id"], ann["vec_id"]))
    recall = len(exact_set & ann_set) / len(exact_set)
    assert recall >= 0.5, f"md5-family ANN recall {recall:.2f}"


def test_leakage_safe_split_no_cross_split_near_dups(spark):
    """r10: the split's entire reason to exist — NO near-dup pair may
    straddle a split boundary (each cluster moves atomically), every
    document gets exactly one split, and the assignment is
    deterministic across invocations. Weights must roughly hold on
    the singleton-dominated corpus."""
    from trendengine_spark.operators.dedup import ngram_jaccard_pairs
    from trendengine_spark.operators.pipeline import leakage_safe_split

    docs = load_table(spark, SF_SMOKE, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.5, n=3)
    out = leakage_safe_split(docs, pairs).cache()
    assert out.count() == docs.count()
    a = out.select(F.col("doc_id").alias("id_a"), F.col("split").alias("sa"))
    b = out.select(F.col("doc_id").alias("id_b"), F.col("split").alias("sb"))
    leaks = (
        pairs.join(a, "id_a").join(b, "id_b")
        .filter(F.col("sa") != F.col("sb"))
        .count()
    )
    assert leaks == 0
    fr = {
        r["split"]: r["n"]
        for r in out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n = sum(fr.values())
    assert 0.7 <= fr.get("train", 0) / n <= 0.9
    # determinism across invocations
    again = {
        (r["doc_id"], r["split"])
        for r in leakage_safe_split(docs, pairs).collect()
    }
    assert again == {(r["doc_id"], r["split"]) for r in out.collect()}
    out.unpersist()


def test_two_stage_rerank_external_queries_keep_id_collisions(spark):
    """ADVICE r9: with an EXTERNAL queries frame the id spaces are
    unrelated, so a corpus doc whose vec_id equals a query_id must
    stay eligible — in particular, a query that IS corpus vector q
    must retrieve vec_id == q as its top hit (cosine 1.0)."""
    from trendengine_spark.operators.similarity import two_stage_rerank
    from trendengine_spark.queries.base import t as _t

    emb = _t(spark, "/root/testdata/sf0.01", "embeddings")
    q = (
        emb.filter(F.col("vec_id") < 5)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    out = two_stage_rerank(emb, k=3, budget=20, queries=q).collect()
    top = {r["query_id"]: r["vec_id"] for r in out if r["rn"] == 1}
    assert top == {i: i for i in range(5)}


def test_audio_fingerprint_planted_recall_and_gain_invariance(spark):
    """Every planted re-mastered pair (2k, 2k+1) — 2x upsample, 2x
    gain, +1 DC — must be recovered at Hamming <= 7 with recall 1.0,
    and pure gain (no DC shift) must fingerprint IDENTICALLY (the
    energy-contour hash compares frame-energy order, which uniform
    amplification preserves exactly)."""
    import numpy as np
    import pandas as pd

    from trendengine_spark.operators.codecs import wav_encode
    from trendengine_spark.operators.multimodal import audio_fingerprint
    from trendengine_spark.queries import REGISTRY

    sf = "/root/testdata/sf0.001"
    rows = REGISTRY["dedup_audio_fingerprint"].fn(spark, sf).collect()
    pairs = {(r["index_id"], r["new_id"]) for r in rows}
    docs = {
        r[0]
        for r in spark.read.parquet(f"{sf}/documents.parquet")
        .select("doc_id")
        .collect()
    }
    planted = {(d, d + 1) for d in docs if d % 2 == 0 and d + 1 in docs}
    assert planted <= pairs, f"missed {sorted(planted - pairs)[:5]}"
    assert all(r["hamming"] <= 7 for r in rows)

    rng = np.random.RandomState(7)
    base = rng.randint(-300, 300, size=2080).astype(np.int16)
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1],
            "media": [
                wav_encode(8000, base),
                wav_encode(8000, (base.astype(np.int64) * 3).astype(np.int16)),
            ],
        }
    )
    out = audio_fingerprint(spark.createDataFrame(pdf)).collect()
    h = {r["doc_id"]: r["afp"] for r in out}
    assert h[0] == h[1]


def test_quantized_cosine_is_engine_portable(spark):
    """cosine_arrow_quantized (the md5-family verify scorer, r11)
    must equal DuckDB's rendering of the same quantized formula
    BIT-FOR-BIT, including on exact .5/1024 quantization ties where
    np.rint (ties-to-even) silently diverged from SQL round
    (half-away) — the sf1 sweep failure this scorer fixed."""
    import duckdb
    import pandas as pd

    from trendengine_spark.operators.similarity import (
        cosine_arrow_quantized,
    )

    # vectors engineered to hit quantization ties: (k + 0.5)/1024 is
    # exactly representable, so v*1024 == k.5 exactly
    va = [(3 + 0.5) / 1024, 0.25, -0.125, (7 + 0.5) / 1024]
    vb = [(5 + 0.5) / 1024, -0.5, 0.375, (2 + 0.5) / 1024]
    pdf = pd.DataFrame({"a": [va, va], "b": [vb, va]})
    got = (
        spark.createDataFrame(pdf)
        .select(cosine_arrow_quantized(F.col("a"), F.col("b")).alias("c"))
        .collect()
    )
    con = duckdb.connect()
    want = con.execute(
        """
        SELECT list_dot_product(qa, qb) /
               (sqrt(list_dot_product(qa, qa)) *
                sqrt(list_dot_product(qb, qb))) AS c
        FROM (
          SELECT list_transform(a, x -> round(x * 1024)) AS qa,
                 list_transform(b, x -> round(x * 1024)) AS qb
          FROM (SELECT ? AS a, ? AS b UNION ALL SELECT ? AS a, ? AS b)
        )
        """,
        [va, vb, va, va],
    ).fetchall()
    assert got[0]["c"] == want[0][0]  # bitwise, no tolerance
    assert got[1]["c"] == want[1][0]
    assert abs(got[1]["c"] - 1.0) < 1e-12  # self-cosine ~ 1


def test_owned_cache_get_memoizes_per_key(spark):
    """owned_cache_get (r11): the builder runs once per key; a second
    call serves the pooled DataFrame object, and a pool drop (the
    bench harness discipline) forces a rebuild."""
    from trendengine_spark.operators.util import owned_cache_get

    calls = []

    def build():
        calls.append(1)
        return spark.range(5).toDF("v")

    a = owned_cache_get(spark, "test.memo.key", build)
    b = owned_cache_get(spark, "test.memo.key", build)
    assert a is b and len(calls) == 1
    pool = spark.sparkContext._te_owned_caches
    pool.pop("test.memo.key").unpersist(blocking=True)
    c = owned_cache_get(spark, "test.memo.key", build)
    assert len(calls) == 2 and c.count() == 5
    pool.pop("test.memo.key").unpersist(blocking=True)


def test_owned_cache_drop_invalidates_by_prefix(spark):
    """owned_cache_drop (r12, ADVICE r11): the explicit invalidation
    for sessions that rewrite source parquet mid-session — entries
    under the prefix are unpersisted and forgotten (next get
    rebuilds), entries outside it survive, unknown prefixes no-op."""
    from trendengine_spark.operators.util import (
        owned_cache_drop,
        owned_cache_get,
    )

    calls = []

    def build():
        calls.append(1)
        return spark.range(3).toDF("v")

    owned_cache_get(spark, "/tmp/srcA:pairs", build)
    owned_cache_get(spark, "/tmp/srcA:clusters", build)
    keep = owned_cache_get(spark, "/tmp/srcB:pairs", build)
    assert owned_cache_drop(spark, "/tmp/srcA") == 2
    assert owned_cache_drop(spark, "/tmp/nowhere") == 0
    pool = spark.sparkContext._te_owned_caches
    assert "/tmp/srcB:pairs" in pool and pool["/tmp/srcB:pairs"] is keep
    owned_cache_get(spark, "/tmp/srcA:pairs", build)  # rebuilds
    assert len(calls) == 4
    for k in ("/tmp/srcA:pairs", "/tmp/srcB:pairs"):
        pool.pop(k).unpersist(blocking=True)


def test_ivf_relational_twin_recall_vs_bruteforce(spark):
    """The r12 declared-query twin (md5 init + exact-int Lloyd +
    quantized scoring) keeps useful recall against brute-force cosine
    — the quality gate for the oracle conversion."""
    from trendengine_spark.operators.similarity import cosine_topk
    from trendengine_spark.queries import REGISTRY

    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = cosine_topk(emb, queries, k=5).toPandas()
    twin = REGISTRY["sim_ivf_topk"].fn(spark, SF_SMOKE).toPandas()
    hits = tot = 0
    for qid, grp in exact.groupby("query_id"):
        truth = set(grp["vec_id"])
        got = set(twin[twin.query_id == qid]["vec_id"])
        hits += len(truth & got)
        tot += len(truth)
    assert hits / tot >= 0.5  # nprobe=6/16 of the space probed


def test_pq_relational_twin_recall_vs_bruteforce(spark):
    """The r12 PQ declared-query twin keeps useful recall against
    brute-force cosine (ADC over 32x32 trained codes, 4k rerank)."""
    from trendengine_spark.operators.similarity import cosine_topk
    from trendengine_spark.queries import REGISTRY

    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = cosine_topk(emb, queries, k=5).toPandas()
    twin = REGISTRY["sim_pq_topk"].fn(spark, SF_SMOKE).toPandas()
    hits = tot = 0
    for qid, grp in exact.groupby("query_id"):
        truth = set(grp["vec_id"])
        got = set(twin[twin.query_id == qid]["vec_id"])
        hits += len(truth & got)
        tot += len(truth)
    assert hits / tot >= 0.5  # lossy 160-bit codes, 4x rerank pool


def test_ivfpq_relational_twin_recall_vs_bruteforce(spark):
    """The r12 IVFPQ declared-query twin (integer residual ADC over
    composed coarse+product quantizers) keeps useful recall."""
    from trendengine_spark.operators.similarity import cosine_topk
    from trendengine_spark.queries import REGISTRY

    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = cosine_topk(emb, queries, k=5).toPandas()
    twin = REGISTRY["sim_ivfpq_topk"].fn(spark, SF_SMOKE).toPandas()
    hits = tot = 0
    for qid, grp in exact.groupby("query_id"):
        truth = set(grp["vec_id"])
        got = set(twin[twin.query_id == qid]["vec_id"])
        hits += len(truth & got)
        tot += len(truth)
    # lossy 160-bit residual codes + nprobe 8/16 pruning: the floor
    # mirrors the production operator's pinned 0.63 recall posture
    assert hits / tot >= 0.4


# ----- r14 derived-knob posture (VERDICT r13 #1 + ADVICE r13) -----


def test_adaptive_ann_bands_table_matches_formula():
    """The frozen integer table (oracle-transcribable, zero float
    risk) must equal the closed form it was derived from: bands(p) =
    ceil(ln(1-0.8) / ln(1 - r^p)) at the demo regime's per-plane
    collision r = 1 - acos(0.3)/pi, capped at 256."""
    import math

    from trendengine_spark.operators.similarity import (
        _ANN_BANDS_CAP,
        _ANN_BANDS_FOR_P,
        adaptive_ann_bands,
    )

    r = 1.0 - math.acos(0.3) / math.pi
    for p in range(4, 25):
        want = min(
            math.ceil(math.log(0.2) / math.log(1.0 - r**p)), _ANN_BANDS_CAP
        )
        assert adaptive_ann_bands(p) == want, (p, want)
    assert _ANN_BANDS_FOR_P[4] == 12  # the old fixed default, exactly


def test_adaptive_n_cells_integer_sqrt_and_clamps():
    from trendengine_spark.operators.similarity import adaptive_n_cells

    assert adaptive_n_cells(0) == 16
    assert adaptive_n_cells(1) == 16
    assert adaptive_n_cells(256) == 16
    assert adaptive_n_cells(257) == 17  # smallest c with c*c >= n
    assert adaptive_n_cells(500) == 23
    assert adaptive_n_cells(529) == 23
    assert adaptive_n_cells(530) == 24
    assert adaptive_n_cells(10**6) == 1000
    assert adaptive_n_cells(10**9) == 4096  # hi clamp
    assert adaptive_n_cells(100, lo=4) == 10


def test_bands_for_threshold_holds_recall_curve():
    import math

    from trendengine_spark.operators.similarity import bands_for_threshold

    # hand-checked values of the closed form
    assert bands_for_threshold(24, 0.95) == 29
    assert bands_for_threshold(16, 0.95) == 12
    assert bands_for_threshold(24, 0.995) == 4
    # derived band count really does hold the target recall
    for p, thr in ((8, 0.9), (18, 0.95), (24, 0.95), (12, 0.99)):
        r = 1.0 - math.acos(thr) / math.pi
        h = r**p
        L = bands_for_threshold(p, thr)
        assert 1.0 - (1.0 - h) ** L >= 0.9 - 1e-9, (p, thr, L)
    # monotone in p (wider bands need more of them)
    assert bands_for_threshold(24, 0.95) > bands_for_threshold(8, 0.95)
    # clamps and guards
    assert bands_for_threshold(24, 0.9999999999999) == 2  # h -> 1 => lo
    with pytest.raises(ValueError):
        bands_for_threshold(8, 1.5)


def test_threshold_mode_recall_holds_at_wide_bands(spark):
    """ADVICE r13 (medium): with the derived band width at p=24, the
    old fixed 6 bands give ~38% expected recall for cos=0.95 pairs;
    bands=None now derives 29 bands from (p, threshold), restoring
    ~90%. Planted-pair recall measured with p PINNED at the clamp."""
    from trendengine_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    rng = np.random.default_rng(11)
    n, dim, planted = 600, 64, 40
    base = rng.normal(size=(n, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = [(i, [float(x) for x in base[i]]) for i in range(n)]
    truth = set()
    cos_t = 0.96
    for j in range(planted):
        v = base[j]
        w = rng.normal(size=dim)
        w -= (w @ v) * v
        w /= np.linalg.norm(w)
        dup = cos_t * v + float(np.sqrt(1 - cos_t**2)) * w
        rows.append((n + j, [float(x) for x in dup]))
        truth.add((j, n + j))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartition(8)

    got = embedding_near_dup_pairs(
        df, threshold=0.95, dim=dim, planes_per_band=24, bands=None,
        seed=3,
    ).toPandas()
    got_pairs = set(zip(got["id_a"], got["id_b"]))
    recall = len(truth & got_pairs) / len(truth)
    assert recall >= 0.8, f"derived-bands recall {recall:.2f}"

    # the pre-fix fixed-6-bands configuration demonstrably misses
    old = embedding_near_dup_pairs(
        df, threshold=0.95, dim=dim, planes_per_band=24, bands=6,
        seed=3,
    ).toPandas()
    old_recall = len(truth & set(zip(old["id_a"], old["id_b"]))) / len(truth)
    assert old_recall < recall, (old_recall, recall)
