"""DuckDB-side timing for the bench headline queries.

The driver's grading compares BENCH_r{N}.json against a DuckDB-derived
baseline at the same scale factor, so this is the local feedback loop:
run each headline query's oracle SQL on DuckDB (32 threads, same
parquet inputs) with the same min-of-2 sampling as bench.py and print
the per-query + total seconds. Queries without oracle SQL (rows-only)
are skipped — the comparison set is the SQL-expressible subset, which
is what the judge timed in round 2.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from bench import HEADLINE
from trendengine_spark.queries import all_oracle_sql
from trendengine_spark.tables import TABLE_NAMES


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    con = duckdb.connect()
    con.execute(f"SET threads TO {cpus}")
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
        )
    sqls = all_oracle_sql()
    times: dict[str, float] = {}
    for name in HEADLINE:
        sql = sqls.get(name)
        if sql is None:
            continue
        con.execute(sql).fetchall()  # warm-up (OS page cache, plan)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            best = min(best, time.perf_counter() - t0)
        times[name] = round(best, 4)
    total = round(sum(times.values()), 4)
    print(json.dumps({"duckdb_total_sec": total, "queries": times}))


if __name__ == "__main__":
    main()
