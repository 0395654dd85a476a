"""Scaling probe: is the Spark-vs-DuckDB gap a constant or a slope?

Runs the SQL-expressible headline queries on BOTH engines at every
available scale factor and reports, per query, the marginal cost of
10× more data (t_sf0.1 − t_sf0.01, which is ~0.9 · sf0.1's data).

Rationale: the driver's bench gate compares absolute wall time at
sf0.1, where Spark pays a fixed per-query constant (job scheduling,
py4j plan construction, Python worker round trips) that an embedded
engine does not. That constant AMORTIZES at scale — what matters for
the 100 TB target is the marginal cost per additional row. If Spark's
slope ≤ DuckDB's slope, the plans are scale-correct and the residual
sf0.1 gap is pure constant. Run manually; results are recorded in
BASELINE.md's appendix.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from bench import BENCH_CONF, HEADLINE
from trendengine_spark.queries import all_oracle_sql, all_queries
from trendengine_spark.tables import TABLE_NAMES, clear_warm_cache, warm_cache

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def time_best(fn, n=3) -> float:
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def duckdb_times(sf_dir: str, names: list[str]) -> dict[str, float]:
    con = duckdb.connect()
    con.execute(
        f"SET threads TO {int(os.environ.get('SPARK_GRAFT_CPUS', os.cpu_count() or 8))}"
    )
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    sqls = all_oracle_sql()
    out = {}
    for name in names:
        sql = sqls[name]
        con.execute(sql).fetchall()  # warm
        out[name] = time_best(lambda: con.execute(sql).fetchall())
    con.close()
    return out


def main() -> None:
    from trendengine_spark.session import get_spark

    spark = get_spark(app_name="bench_scaling", extra_conf=BENCH_CONF)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    qs = all_queries()
    sqls = all_oracle_sql()
    names = [n for n in HEADLINE if n in sqls]

    jsc = spark.sparkContext._jsc

    def pids():
        return set(jsc.getPersistentRDDs().keySet())

    results: dict[str, dict] = {}
    for sf_dir in SF_DIRS:
        warm_cache(spark, sf_dir)
        base = pids()

        def drop():
            for rid in pids() - base:
                try:
                    jsc.getPersistentRDDs().get(rid).unpersist()
                except Exception:
                    pass

        spark_t = {}
        for name in names:
            fn = qs[name]
            fn(spark, sf_dir).toArrow()
            drop()

            def run(fn=fn):
                fn(spark, sf_dir).toArrow()

            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                run()
                best = min(best, time.perf_counter() - t0)
                drop()
            spark_t[name] = best
        clear_warm_cache(spark, sf_dir)
        duck_t = duckdb_times(sf_dir, names)
        results[sf_dir] = {"spark": spark_t, "duckdb": duck_t}
        print(
            f"{sf_dir}: spark={sum(spark_t.values()):.3f}s "
            f"duckdb={sum(duck_t.values()):.3f}s",
            file=sys.stderr,
        )

    lo, hi = SF_DIRS[1], SF_DIRS[2]  # sf0.01 → sf0.1 = 10× data
    print("\nper-query marginal cost of 10x data (sf0.01 -> sf0.1), ms:")
    print(f"{'query':34s} {'spark_lo':>9s} {'spark_hi':>9s} {'d_spark':>8s} "
          f"{'duck_lo':>8s} {'duck_hi':>8s} {'d_duck':>7s}")
    for name in names:
        s_lo = results[lo]["spark"][name] * 1000
        s_hi = results[hi]["spark"][name] * 1000
        d_lo = results[lo]["duckdb"][name] * 1000
        d_hi = results[hi]["duckdb"][name] * 1000
        print(
            f"{name:34s} {s_lo:9.1f} {s_hi:9.1f} {s_hi - s_lo:8.1f} "
            f"{d_lo:8.1f} {d_hi:8.1f} {d_hi - d_lo:7.1f}"
        )
    print(json.dumps({
        sf: {
            "spark_total_sec": round(sum(r["spark"].values()), 3),
            "duckdb_total_sec": round(sum(r["duckdb"].values()), 3),
        }
        for sf, r in results.items()
    }))


if __name__ == "__main__":
    main()
