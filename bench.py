"""Per-round benchmark (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line: {"metric", "value", "unit", "queries", "sf"}.

Each query is forced to full execution with the noop sink (no
driver-side collect cost, no result materialization skew). One
untimed warm-up of a trivial action initializes the JVM/session so
the first timed query isn't charged for startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

#: name → registry query. The set spans the engine surface: scan+agg
#: (q1), joins (q3/inner), windows (topk), streaming windows
#: (session), composites (a1), the applyInPandas analytical core
#: (flagship), and the LLM-pipeline paths (minhash, cosine topk).
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
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    from trendengine_spark.session import get_spark
    from trendengine_spark.queries import all_queries

    spark = get_spark(app_name="trendengine_bench")
    qs = all_queries()

    # untimed warm-up: JVM codegen paths, parquet reader init, footer
    # caches (steady-state query time is the metric, not cold start)
    spark.range(1000).selectExpr("sum(id)").collect()
    from trendengine_spark.tables import load_table

    load_table(spark, sf_dir, "lineitem").limit(1).write.format("noop").mode(
        "overwrite"
    ).save()

    times: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # one broken query must not kill the suite
            print(f"bench: {name} failed: {exc}", file=sys.stderr)
            times[name] = -1.0

    total = round(sum(v for v in times.values() if v >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
