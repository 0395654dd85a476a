"""Per-round benchmark (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line: {"metric", "value", "unit", "queries", "sf"}.

Each query is forced to full execution with the noop sink (no
driver-side collect cost, no result materialization skew). Each
query gets ONE untimed warm-up execution before its timed run: the
metric is steady-state plan cost (scan + shuffle + compute), not
one-time JVM codegen/compilation, which on a real cluster amortizes
to zero over a 100 TB scan but at sf0.1 would otherwise dominate
(~50% of cold wall time, measured). Every timed run executes the
full plan end-to-end from the parquet scan: the cache is cleared
before each sample, so operators that cache an intermediate
internally (minhash signatures) recompute it inside the timed
window. Per query the metric is the min of two samples (the box is
shared with the harness; a single sample carries scheduler noise).
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
        try:
            # warm-up: pays one-time codegen/compile for this plan shape
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = float("inf")
            # min of two timed runs: the machine shares cores with the
            # harness, so a single sample carries ±30% scheduler noise.
            # clearCache first so operators with an internal .cache()
            # (minhash signatures, LSH) pay their full plan cost in the
            # timed run instead of reusing the warm-up's blocks
            for _ in range(2):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            times[name] = round(best, 3)
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
