"""Plan audit over the bench surface (guide §7.2): for each query,
count Exchange / Sort / BatchEvalPython / ArrowEvalPython / MapInPandas
nodes, list join strategies, and flag scans without pushed filters
where a filter exists. One line per query; anomalies hunt material.

Run: python tools/audit_plans.py [sf_dir] [names...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BENCH_SET = [
    "tpch_q1_pricing_summary", "tpch_q3_shipping_priority",
    "join_inner_3way", "window_topk_per_group", "stream_session_window",
    "a1_annual_composite", "d1_period_pairing", "flagship_trend_pipeline",
    "dedup_minhash_lsh", "sim_cosine_topk",
    "tpch_q21_waiting_supplier", "flagship_curation_pipeline",
    "sim_range_search", "dedup_paragraph_global", "graph_pagerank_micro",
    "multimodal_gif_animation", "trend_mann_kendall_stats",
    "join_time_window_counts", "sim_hamming_topk", "text_bpe_pair_counts",
    "window_rolling_slope", "graph_triangle_counts", "text_pii_redact",
    "profile_heavy_hitters", "udtf_run_length_segments",
    "quality_gram_matrix", "dedup_semantic_survivors",
    "flagship_model_curation", "pipeline_semantic_decontaminate",
    "window_time_weighted_avg", "dedup_image_phash",
    "dedup_audio_fingerprint", "sim_two_stage_rerank", "sim_rrf_fusion",
    "quality_isotonic_calibration", "dedup_incremental_batch",
    "graph_communities_lpa", "quality_logistic_gate",
    "flagship_lifecycle_pipeline", "pipeline_leakage_safe_split",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or BENCH_SET

    from trendengine_spark.queries import all_queries
    from trendengine_spark.session import get_spark

    if names == ["--all"]:
        # full declared registry (bench surface first, then the rest)
        names = BENCH_SET + [
            n for n in sorted(all_queries()) if n not in BENCH_SET
        ]

    spark = get_spark(
        app_name="audit_plans",
        extra_conf={
            "spark.sql.adaptive.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.shuffle.partitions": "8",
        },
    )
    qs = all_queries()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    print(f"{'query':38s} {'Exch':>4} {'Sort':>4} {'PyEval':>6} {'joins'}")
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(mode)
        except Exception as exc:
            print(f"{name:38s} ERROR {str(exc)[:90]}")
            continue
        n_ex = len(re.findall(r"\bExchange\b", plan)) - len(
            re.findall(r"BroadcastExchange", plan)
        )
        n_bex = len(re.findall(r"BroadcastExchange", plan))
        n_sort = len(re.findall(r"\bSort \(", plan))
        n_py = len(
            re.findall(r"BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow|FlatMapGroupsInPandas", plan)
        )
        joins = re.findall(
            r"(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct)",
            plan,
        )
        from collections import Counter

        jc = ",".join(f"{k}x{v}" for k, v in Counter(joins).items())
        print(
            f"{name:38s} {n_ex:>4} {n_sort:>4} {n_py:>6} "
            f"bex={n_bex} {jc}"
        )


if __name__ == "__main__":
    main()
