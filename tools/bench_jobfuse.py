"""Job-count lever probe (VERDICT r6 task 3): the bench floor study
pins ~145 ms/query of fixed cost, part of it job launches — every
BroadcastExchange runs as its own Spark job. This probe measures, per
headline SQL query, (a) the job count and wall time of the current
registry plan, and (b) variants that trade the broadcast-build jobs
away (SHUFFLE_HASH / MERGE dims — fewer jobs, one more exchange).

Honest framing: at 100 TB the broadcast of a small dim is strictly
right (no fact shuffle); this probe only asks whether the LOCAL bench
constant can be bought down without harness tricks, and the registry
plan only changes if the winner is also scale-correct.

Usage: python tools/bench_jobfuse.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.1"

VARIANTS = {
    "join_inner_3way": {
        "base": """
        SELECT /*+ BROADCAST(nation) */ n_name, count(1) AS n_orders,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(10,2))), 2)
                    AS DOUBLE) AS revenue
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        GROUP BY n_name
        """,
        "shuffle_dims": """
        SELECT /*+ SHUFFLE_HASH(nation), SHUFFLE_HASH(customer) */
               n_name, count(1) AS n_orders,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(10,2))), 2)
                    AS DOUBLE) AS revenue
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        GROUP BY n_name
        """,
    },
    "tpch_q3": {
        "base": """
        SELECT /*+ BROADCAST(customer), MERGE(lineitem) */
               l_orderkey,
               CAST(round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                         * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                         AS DECIMAL(28,0))
                    * CAST('0.0001' AS DECIMAL(6,4)), 2) AS DOUBLE) AS revenue,
               o_orderdate, o_orderpriority
        FROM customer JOIN orders   ON c_custkey = o_custkey
                      JOIN lineitem ON o_orderkey = l_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15'
          AND l_shipdate  > TIMESTAMP '1998-03-15'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        """,
        "shuffle_dims": """
        SELECT /*+ SHUFFLE_HASH(customer), MERGE(lineitem) */
               l_orderkey,
               CAST(round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                         * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                         AS DECIMAL(28,0))
                    * CAST('0.0001' AS DECIMAL(6,4)), 2) AS DOUBLE) AS revenue,
               o_orderdate, o_orderpriority
        FROM customer JOIN orders   ON c_custkey = o_custkey
                      JOIN lineitem ON o_orderkey = l_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15'
          AND l_shipdate  > TIMESTAMP '1998-03-15'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        """,
    },
}


def main() -> None:
    from trendengine_spark.session import get_spark
    from trendengine_spark.sqltext import sql_over_tables
    from trendengine_spark.tables import warm_cache

    import bench

    spark = get_spark(app_name="jobfuse", extra_conf=bench.BENCH_CONF)
    spark.range(1000).selectExpr("sum(id)").collect()
    warm_cache(spark, SF)
    st = spark.sparkContext.statusTracker()

    tables = ("orders", "customer", "nation", "lineitem")
    for qname, variants in VARIANTS.items():
        for vname, sql in variants.items():
            # warm-up (codegen) once
            sql_over_tables(spark, SF, sql, tables).toArrow()
            best, jobs = float("inf"), 0
            for _ in range(5):
                j0 = len(st.getJobIdsForGroup(None) or [])
                ids0 = set(st.getJobIdsForGroup(None) or [])
                t0 = time.perf_counter()
                sql_over_tables(spark, SF, sql, tables).toArrow()
                dt = time.perf_counter() - t0
                ids1 = set(st.getJobIdsForGroup(None) or [])
                if dt < best:
                    best, jobs = dt, len(ids1 - ids0)
            print(f"{qname}/{vname}: {best*1000:.0f} ms, {jobs} jobs")


if __name__ == "__main__":
    main()
