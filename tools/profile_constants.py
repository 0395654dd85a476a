"""Per-query constant-cost decomposition for the headline suite.

For each headline query (warm cache, bench session conf): time the
Python-side plan construction (the ``fn(spark, sf_dir)`` call — pure
py4j Column-tree chatter), the execution (``toArrow()``), and count
the Spark jobs/stages/tasks the execution launched (status tracker
delta). Guides VERDICT r5 item 5 (fuse broadcast-build jobs, pre-build
plans). Manual tool, not part of the driver contract.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADLINE = [
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "join_inner_3way",
    "window_topk_per_group",
    "stream_session_window",
    "a1_annual_composite",
    "d1_period_pairing",
    "flagship_trend_pipeline",
    "dedup_minhash_lsh",
    "sim_cosine_topk",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from trendengine_spark.session import get_spark
    from trendengine_spark.queries import all_queries
    from trendengine_spark.tables import warm_cache

    spark = get_spark(
        app_name="profile_constants",
        extra_conf={
            "spark.sql.adaptive.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.shuffle.partitions": "8",
        },
    )
    qs = all_queries()
    spark.range(1000).selectExpr("sum(id)").collect()
    warm_cache(spark, sf_dir)

    sc = spark.sparkContext
    tracker = sc.statusTracker()

    print(f"{'query':32s} {'build_ms':>8s} {'exec_ms':>8s} {'jobs':>5s} {'stages':>6s} {'tasks':>6s}")
    for name in HEADLINE:
        fn = qs[name]
        # warm up codegen once, untimed
        try:
            fn(spark, sf_dir).toArrow()
        except Exception as exc:
            print(f"{name:32s} FAILED: {exc}")
            continue
        pool = getattr(sc, "_te_owned_caches", None) or {}
        for key in list(pool):
            pool.pop(key).unpersist(blocking=True)

        best_build = best_exec = float("inf")
        jobs = stages = tasks = 0
        for _ in range(3):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            before = set(tracker.getJobIdsForGroup(None))
            df.toArrow()
            t2 = time.perf_counter()
            after = set(tracker.getJobIdsForGroup(None))
            new_jobs = after - before
            n_stages = n_tasks = 0
            for jid in new_jobs:
                ji = tracker.getJobInfo(jid)
                if ji is None:
                    continue
                for sid in ji.stageIds:
                    si = tracker.getStageInfo(sid)
                    if si is not None:
                        n_stages += 1
                        n_tasks += si.numTasks
            if (t2 - t1) < best_exec:
                best_exec = t2 - t1
                jobs, stages, tasks = len(new_jobs), n_stages, n_tasks
            best_build = min(best_build, t1 - t0)
            pool = getattr(sc, "_te_owned_caches", None) or {}
            for key in list(pool):
                pool.pop(key).unpersist(blocking=True)
        print(
            f"{name:32s} {best_build*1000:8.1f} {best_exec*1000:8.1f} "
            f"{jobs:5d} {stages:6d} {tasks:6d}"
        )


if __name__ == "__main__":
    main()
