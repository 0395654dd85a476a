"""Decompose the bench's per-query constant cost.

Times, at the bench scale factor: an empty job, a 1-row noop write, a
full single-table scan+count, plan construction (Python-side py4j
chatter) vs execution for two headline queries, and the effect of the
AQE coalesce knobs. Output guides constant-cost engineering (VERDICT
r2 'Next round' item 2) — run manually, not part of the driver
contract.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def t(label, fn, n=3):
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{label:45s} {best*1000:8.1f} ms")
    return best


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from trendengine_spark.session import get_spark
    from trendengine_spark.tables import load_table
    from trendengine_spark.queries import all_queries

    spark = get_spark(app_name="overhead_profile")
    qs = all_queries()
    spark.range(1000).selectExpr("sum(id)").collect()

    t("empty job (range(1).count)", lambda: spark.range(1).count())
    t("32-task job (range repartition count)",
      lambda: spark.range(100000).repartition(32).count())
    li = load_table(spark, sf_dir, "lineitem")
    li.count()
    t("lineitem full count", lambda: li.count())
    t("lineitem scan+sum one col",
      lambda: li.selectExpr("sum(l_quantity)").collect())

    for name in ("tpch_q1_pricing_summary", "join_inner_3way"):
        fn = qs[name]
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

        def build():
            fn(spark, sf_dir)

        def run():
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

        b = t(f"{name}: plan construction only", build)
        r = t(f"{name}: construct + execute", run)
        print(f"{'':45s} -> exec-only ≈ {(r - b)*1000:.1f} ms")


if __name__ == "__main__":
    main()
