"""Local stand-in for the driver's correctness harness.

Runs every ``queries()`` entry on Spark and, where ``oracle_sql()``
declares SQL, the same query on DuckDB over the identical parquet
tables; compares row count, column-name set, and (strictly) the
sorted value matrix. Strict row equality is a superset of any
reasonable driver hash, so green here ⇒ green in CORRECTNESS_r{N}.

Usage:  python tools/check_oracle.py [--sf /root/testdata/sf0.01] [name ...]
"""

from __future__ import annotations

import argparse
import math
import sys
import time
import traceback

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(rows, cols):
    """Sort columns by name, normalize cell values, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def cell(v):
        if v is None:
            return "∅"
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            return f"{v:.9g}"
        if isinstance(v, bool):
            return str(int(v))
        return str(v)

    return sorted(tuple(cell(r[i]) for i in order) for r in rows)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from trendengine_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark()
    # JVM/codegen warm-up so the first query's reported time is the
    # query, not one-time JIT (~5-8 s otherwise attributed to whatever
    # happens to run first)
    spark.range(1000).selectExpr("sum(id)").collect()
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = args.names or sorted(qs)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'"
        )

    n_pass = n_fail = n_rows_only = 0
    for name in names:
        if name not in qs:
            print(f"?? {name}: not declared")
            continue
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception:
            print(f"FAIL {name}: spark error")
            traceback.print_exc()
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
            n_rows_only += 1
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception:
            print(f"FAIL {name}: duckdb error")
            traceback.print_exc()
            n_fail += 1
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duckdb={len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols spark={sorted(scols)} duckdb={sorted(dcols)}")
        if not problems:
            sc, dc = canon(srows, scols), canon(drows, dcols)
            if sc != dc:
                diffs = [i for i, (a, b) in enumerate(zip(sc, dc)) if a != b][:3]
                detail = "; ".join(
                    f"row{i}: spark={sc[i]} duckdb={dc[i]}" for i in diffs
                )
                problems.append(f"values differ ({detail})")
        if problems:
            print(f"FAIL {name}: {' | '.join(problems)}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
