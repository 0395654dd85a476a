"""Solo sf10 re-measure of the graph family after the r14 replan
(guide §1 re-measure): builds (or reuses, TE_SF1_REUSE=1) the
stress_sf1 100-replica fact set and times the four graph-family
registry queries min-of-3 warm, same methodology as the suite tool.

Run: TE_SF1_REUSE=1 python tools/probe_sf10_graph.py [replicas]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NAMES = [
    "graph_pagerank_micro",
    "graph_triangle_counts",
    "graph_communities_lpa",
    "recursive_cte_reachability",
]


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
    from stress_sf1 import OUT, build

    from trendengine_spark.queries import REGISTRY
    from trendengine_spark.session import get_spark

    spark = get_spark(
        app_name="probe_sf10_graph",
        extra_conf={"spark.driver.maxResultSize": "8g"},
    )
    if os.environ.get("TE_SF1_REUSE") == "1" and os.path.exists(OUT):
        print("build: reused existing", file=sys.stderr)
    else:
        t0 = time.perf_counter()
        build(spark, "/root/testdata/sf0.1", replicas)
        print(f"build: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    pool_holder = spark.sparkContext

    def drop_caches() -> None:
        pool = getattr(pool_holder, "_te_owned_caches", None) or {}
        for key in list(pool):
            try:
                pool.pop(key).unpersist(blocking=True)
            except Exception:
                pass

    print(f"load_avg {os.getloadavg()[0]:.2f}")
    for name in NAMES:
        fn = REGISTRY[name].fn
        spark.sparkContext.setJobDescription(f"sf10 graph {name} warmup")
        fn(spark, OUT).toArrow()
        drop_caches()
        times = []
        for i in range(3):
            spark.sparkContext.setJobDescription(f"sf10 graph {name} rep{i}")
            s = time.perf_counter()
            fn(spark, OUT).toArrow()
            times.append(time.perf_counter() - s)
            drop_caches()
        print(
            f"RESULT {name}: min {min(times):.3f}s"
            f" all {[round(x, 3) for x in times]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
