"""Decompose flagship_trend_pipeline's warm latency (r15, VERDICT r14 #1).

Runs under the EXACT bench posture (BENCH_CONF, warm columnar cache,
fresh plan per sample, min-of-N with the noop sink) and times:

  1. full    — the declared query, as the bench does (toArrow action)
  2. sqlagg  — the relational prologue only (monthly SQL aggregate)
  3. noop    — the declared query through the noop sink (guide §1.4)

Knobs (env):
  PROBE_SKIP_SHIP=1   — no-op session.ship_package before get_spark
                        (A/B for the r14 addPyFile session hook)
  PROBE_N=7           — samples per variant (default 7)

Usage: python tools/probe_flagship.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BENCH_CONF = {
    "spark.sql.adaptive.enabled": "false",
    "spark.ui.showConsoleProgress": "false",
    "spark.sql.shuffle.partitions": "8",
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_samples = int(os.environ.get("PROBE_N", "7"))

    from trendengine_spark import session as te_session

    if os.environ.get("PROBE_SKIP_SHIP") == "1":
        te_session.ship_package = lambda spark: None
        print("ship_package: SKIPPED", file=sys.stderr)

    from trendengine_spark.session import get_spark
    from trendengine_spark.queries import all_queries
    from trendengine_spark.tables import warm_cache

    spark = get_spark(app_name="probe_flagship", extra_conf=BENCH_CONF)
    spark.range(1000).selectExpr("sum(id)").collect()
    warm_cache(spark, sf_dir)
    qs = all_queries()
    fn = qs["flagship_trend_pipeline"]

    from trendengine_spark.sqltext import sql_over_tables

    def sqlagg_df():
        return sql_over_tables(
            spark,
            sf_dir,
            """
            SELECT l_returnflag,
                   CAST(date_trunc('month', l_shipdate) AS TIMESTAMP)
                     AS period_start,
                   CAST(sum(CAST(l_extendedprice / 1000.0 AS DECIMAL(18,10)))
                        AS DOUBLE) / count(l_extendedprice) AS value
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1995-01-01'
              AND l_shipdate <  TIMESTAMP '2002-01-01'
            GROUP BY l_returnflag, date_trunc('month', l_shipdate)
            """,
            ("lineitem",),
        )

    variants = {
        "full(toArrow)": lambda: fn(spark, sf_dir).toArrow(),
        "sqlagg(noop)": lambda: sqlagg_df()
        .write.format("noop")
        .mode("overwrite")
        .save(),
        "full(noop)": lambda: fn(spark, sf_dir)
        .write.format("noop")
        .mode("overwrite")
        .save(),
    }

    for name, run in variants.items():
        spark.sparkContext.setJobDescription(f"flagship probe: {name}")
        run()  # untimed warm-up (codegen)
        samples = []
        for _ in range(n_samples):
            t0 = time.perf_counter()
            run()
            samples.append(round(time.perf_counter() - t0, 3))
        print(f"{name}: min={min(samples)} samples={samples}")
    spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
